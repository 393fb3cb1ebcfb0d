#!/usr/bin/env python
"""Peierls distortion of a half-filled chain (SSH model).

An upstream wish-list example (/root/reference/notes/TODO:72 "Use
Pierels distortion as one of the examples") the reference never shipped.

A uniform chain at half filling is unstable against dimerization: the
electronic energy gain from gap opening beats the elastic cost for
small distortion delta (Peierls theorem).  The whole E(delta) curve --
all distortions x all k-points -- evaluates as ONE vmapped device
program through flows.energy_fn's amplitude sweep.  The two dimerized
ground states delta > 0 / delta < 0 are the two topological classes of
the SSH chain: their Zak phases differ by pi (Wannier center on the
intracell vs intercell bond center, x = 1/4 vs 3/4).
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import jax
import jax.numpy as jnp

from pythtb_tpu import wf_array, flows
from pythtb_tpu.models import ssh


# ---- E(delta): one vmapped program over the distortion sweep -------------
m0 = ssh(0.0)
fn, p0 = flows.energy_fn(m0)
nk = 256
kpts = (np.arange(nk) / nk)[:, None]
deltas = np.linspace(-0.6, 0.6, 121)
# hop amplitudes as a function of delta (ri-packed like params["amps"])
amps = np.zeros((len(deltas), 2, 2))
amps[:, 0, 0] = 1.0 + deltas  # hop 0->1, real part
amps[:, 1, 0] = 1.0 - deltas  # hop 1->0 (next cell), real part
sweep = jax.jit(
    jax.vmap(lambda a: jnp.sum(jnp.minimum(fn({"amps": a, "diag": p0["diag"]}, kpts), 0.0)))
)
e_el = np.asarray(jax.device_get(sweep(jnp.asarray(amps)))) / nk  # filled band energy per cell

K = 1.8  # elastic spring constant
e_tot = e_el + 0.5 * K * deltas**2
i_min = np.argmin(e_tot)
print("Peierls instability: E(0) = %.6f, min E(%+.3f) = %.6f (dimerized wins)"
      % (e_tot[np.argmin(np.abs(deltas))], deltas[i_min], e_tot[i_min]))
assert abs(deltas[i_min]) > 1e-3

# ---- Berry phases of the two dimerized ground states ---------------------
phases = {}
for d in (deltas[i_min], -deltas[i_min]):
    wf = wf_array(ssh(d), [41])
    wf.solve_on_grid([0.0])
    phases[d] = float(wf.berry_phase([0], dir=0))
centers = {d: (p / (2.0 * np.pi)) % 1.0 for d, p in phases.items()}
print("Zak phase / Wannier center of the lower band: "
      + " ; ".join("delta=%+.3f -> %.4f (x = %.3f)" % (d, phases[d], centers[d])
                   for d in phases)
      + "  -- bond centers 1/4 vs 3/4, the two SSH classes (Zak phases differ by pi)")
assert abs(abs(phases[deltas[i_min]] - phases[-deltas[i_min]]) - np.pi) < 1e-6

fig, axs = plt.subplots(1, 2, figsize=(9.5, 3.8))
axs[0].plot(deltas, e_tot, "k-")
axs[0].plot(deltas[i_min], e_tot[i_min], "ro", ms=4)
axs[0].set_xlabel(r"$\delta$")
axs[0].set_ylabel("E per cell")
axs[0].set_title("Peierls instability (electronic + elastic)")
for d, style in ((deltas[i_min], "k-"), (0.0, "0.6")):
    ev = ssh(d).solve_all(np.linspace(0, 1, 101)[:, None])
    for band in ev:
        axs[1].plot(np.linspace(0, 1, 101), band, style, lw=0.9)
axs[1].set_xlabel("k")
axs[1].set_ylabel("E")
axs[1].set_title("bands: uniform (grey) vs dimerized (black)")
fig.tight_layout()
fig.savefig("peierls_ssh.pdf")
print("saved peierls_ssh.pdf")

print("Done.")
