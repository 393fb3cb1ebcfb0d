#!/usr/bin/env python
"""Haldane-model topological phase diagram in ONE device program.

Beyond-reference showcase: `flows.chern_fn` is a pure function of the
model's parameter arrays, so `jax.vmap` evaluates the Chern number for
a whole grid of (delta, phi) parameter points simultaneously -- every
point itself a full BZ solve + Berry flux.  The phase boundary
|delta| = 3*sqrt(3) |t2| sin(phi) (Haldane, PRL 61, 2015 (1988))
emerges from ~1.4k independent topological-invariant evaluations,
in seconds on one chip.  The serial reference would need ~20 minutes.
"""
import time

import matplotlib

matplotlib.use("Agg")
import jax
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models

NP_DELTA, NP_PHI = 37, 41
NK = 21
t2mag = 0.15

base = models.haldane()
fn, p0 = flows.chern_fn(base, [0], nk=(NK, NK))

# build the parameter sweep (hopping graph is fixed; amplitudes vary)
deltas = np.linspace(0.0, 1.2, NP_DELTA)
phis = np.linspace(-np.pi, np.pi, NP_PHI)
amps, diags = [], []
for d in deltas:
    for p in phis:
        m = models.haldane(delta=d, t2=t2mag * np.exp(1.0j * p))
        _, dat = m._get_finalized()
        amps.append(np.array(dat.amps))
        diags.append(np.array(dat.diag))
amps = np.stack(amps)
diags = np.stack(diags)

chern_vmapped = jax.jit(jax.vmap(lambda a, g: fn({"amps": a, "diag": g})))
t0 = time.perf_counter()
cherns = np.asarray(chern_vmapped(amps, diags)).reshape(NP_DELTA, NP_PHI)
dt = time.perf_counter() - t0
print("computed %d Chern numbers (each a %dx%d BZ integral) in %.2fs"
      % (cherns.size, NK, NK, dt))

fig, ax = plt.subplots(figsize=(5.2, 4.0))
im = ax.imshow(
    np.round(cherns), origin="lower", aspect="auto", cmap="RdBu_r",
    extent=(phis[0], phis[-1], deltas[0], deltas[-1]), vmin=-1, vmax=1,
)
# analytic phase boundary
pp = np.linspace(-np.pi, np.pi, 400)
ax.plot(pp, 3 * np.sqrt(3) * t2mag * np.abs(np.sin(pp)), "k--", lw=1)
ax.set(xlabel=r"$\varphi$ (phase of $t_2$)", ylabel=r"$\Delta$ (staggered mass)",
       title="Haldane phase diagram: Chern number of the lower band")
fig.colorbar(im, ax=ax, ticks=[-1, 0, 1])
fig.tight_layout()
fig.savefig("haldane_phase_diagram.png")
print("Done.")
