#!/usr/bin/env python
"""Kane-Mele Z2 phase diagram in one vmapped device program.

Beyond-reference showcase: `flows.z2_fn` evaluates the Z2 invariant
(gap-crossing Wilson-flow criterion) as a pure function of the model
parameter arrays, so `jax.vmap` maps the entire (staggered onsite e,
Rashba lambda_R) phase diagram at once -- every point a full Wilson-loop
computation over the BZ.  The QSH lobe shrinks with increasing Rashba
coupling and collapses at the known boundaries.  (The inversion-
symmetric line e = 0 is excluded: there the Kramers pair never splits
and the gap-crossing criterion is blind; see flows.z2_fn docs.)
"""
import time

import matplotlib

matplotlib.use("Agg")
import jax
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models

NE, NR = 24, 21
NK = 17  # deliberately coarse: the convergence mask below flags the
         # parameter points this grid under-resolves

base = models.kane_mele()
# check=True: each point evaluates BOTH the NK and (2*NK-1) grids in one
# program and returns (z2_refined, converged) -- the phase diagram
# carries its own convergence mask
fn, p0 = flows.z2_fn(base, (0, 1), nk=(NK, NK), check=True)

esites = np.linspace(0.25, 3.5, NE)
rashbas = np.linspace(0.0, 1.2, NR)
amps, diags = [], []
for e in esites:
    for r in rashbas:
        m = models.kane_mele(esite=e, rashba=r)
        _, d = m._get_finalized()
        amps.append(np.array(d.amps))
        diags.append(np.array(d.diag))

z2_vmapped = jax.jit(jax.vmap(lambda a, g: fn({"amps": a, "diag": g})))
t0 = time.perf_counter()
z2, conv = jax.device_get(z2_vmapped(np.stack(amps), np.stack(diags)))
z2 = np.asarray(z2).reshape(NE, NR)
conv = np.asarray(conv).reshape(NE, NR)
dt = time.perf_counter() - t0
n_flag = int((conv == 0).sum())
print("computed %d Z2 invariants (each TWO Wilson-flow analyses, %dx%d "
      "and %dx%d) in %.2fs" % (z2.size, NK, NK, 2 * NK - 1, 2 * NK - 1, dt))
print("convergence mask: %d/%d points under-resolved at nk=%d "
      "(flagged on the plot)" % (n_flag, conv.size, NK))

fig, ax = plt.subplots(figsize=(5.0, 4.0))
im = ax.imshow(z2, origin="lower", aspect="auto", cmap="PuOr", vmin=0, vmax=1,
               extent=(rashbas[0], rashbas[-1], esites[0], esites[-1]))
# hatch the unconverged points
bad = np.argwhere(conv == 0)
if bad.size:
    ax.plot(rashbas[bad[:, 1]], esites[bad[:, 0]], "x", ms=4, c="k",
            label="grid-unconverged")
    ax.legend(loc="upper right", fontsize=7)
ax.set(xlabel=r"Rashba $\lambda_R$", ylabel=r"staggered onsite $e$",
       title=r"Kane-Mele $\mathbb{Z}_2$ phase diagram (QSH = 1)")
fig.colorbar(im, ax=ax, ticks=[0, 1])
fig.tight_layout()
fig.savefig("kane_mele_z2_diagram.png")
print("Done.")
