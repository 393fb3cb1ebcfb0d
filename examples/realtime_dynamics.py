#!/usr/bin/env python
"""Real-time dynamics: chiral edge transport and a dynamical QPT.

Two faces of ``pythtb_tpu.dynamics``:

1. ``evolve``: Chebyshev propagation of a gap-filtered wavepacket on
   an open Haldane flake.  The packet lives on the chiral edge channel
   and circulates ONE way around the sample -- topological protection
   watched in real time (matrix-free: the same code propagates
   10^5-site flakes on a TPU chip).
2. ``quench_echo``: the Loschmidt rate function g(t) after a sudden
   SSH quench.  Crossing the topological transition produces
   nonanalytic cusps at t* = (2n+1) pi / (2 eps(k*)) (a dynamical
   quantum phase transition); a quench within the phase stays smooth.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import dynamics, models
from pythtb_tpu.ops.matvec import sparse_h, to_dense

# ---- chiral wavepacket on a Haldane flake ----------------------------
flake = models.haldane().cut_piece(10, 0).cut_piece(10, 1)
H = to_dense(sparse_h(flake))
w, v = np.linalg.eigh(H)
pos = np.asarray(flake._orb) @ np.asarray(flake._lat)
gap = np.abs(w) < 0.5
seed = np.zeros(len(w), complex)
seed[int(np.argmin(pos[:, 1]))] = 1.0  # bottom edge site
psi0 = v[:, gap] @ (v[:, gap].conj().T @ seed)
psi0 /= np.linalg.norm(psi0)

snap_times = [4.0, 12.0, 20.0, 28.0]
times = np.linspace(4.0, 28.0, 7)
psi_t = dynamics.evolve(flake, psi0, times)

fig, axs = plt.subplots(1, 5, figsize=(15, 3.1))
for ax, (lbl, dens) in zip(
    axs,
    [("t = 0", np.abs(psi0) ** 2)]
    + [("t = %.0f" % t, np.abs(psi_t[np.argmin(np.abs(times - t))]) ** 2)
       for t in snap_times],
):
    ax.scatter(pos[:, 0], pos[:, 1], s=300 * dens + 0.6, c="k")
    ax.set_title(lbl)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
fig.suptitle("chiral edge wavepacket (Haldane flake, one-way transport)")
fig.tight_layout()
fig.savefig("edge_wavepacket.png", dpi=150)
print("saved edge_wavepacket.png")

# ---- dynamical quantum phase transition ------------------------------
mi, mf = models.ssh(delta=0.6), models.ssh(delta=-0.6)
tgrid = np.linspace(0.02, 6.0, 500)
g_topo = dynamics.quench_echo(mi, mf, [0], (400,), tgrid)
g_triv = dynamics.quench_echo(models.ssh(delta=0.6), models.ssh(delta=0.3),
                              [0], (400,), tgrid)
print("max rate function: across transition %.3f, within phase %.4f"
      % (g_topo.max(), g_triv.max()))

fig2, ax2 = plt.subplots(figsize=(5.2, 3.4))
ax2.plot(tgrid, g_topo, "k-", label="quench across transition")
ax2.plot(tgrid, g_triv, "-", color="0.6", label="quench within phase")
ax2.set_xlabel("t")
ax2.set_ylabel("g(t)")
ax2.set_title("Loschmidt rate function (SSH quench)")
ax2.legend(frameon=False, fontsize=8)
fig2.tight_layout()
fig2.savefig("dqpt_rate.png", dpi=150)
print("saved dqpt_rate.png")

print("Done.")
