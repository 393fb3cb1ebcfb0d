#!/usr/bin/env python
"""Topological magnons: Chern bands and the thermal Hall effect.

``magnon.spin_model`` bosonizes a Heisenberg model about its classical
ground state (Holstein-Primakoff + batched Colpa diagonalization).
The honeycomb ferromagnet with Dzyaloshinskii-Moriya coupling on
second neighbors is the magnon analogue of the Haldane model
(Owerre, J. Phys. CM 28, 386001 (2016)): DM opens a gap at the magnon
Dirac point, the bands acquire Chern numbers -+1, and a transverse
heat current flows (Matsumoto-Murakami).

Panels: magnon bands along the BZ path with and without DM; Berry
curvature of the lower band; kappa_xy(T) for several DM strengths.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import magnon


def honeycomb_fm(D, field=0.05):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2]]
    sm = magnon.spin_model(lat, [[1 / 3, 1 / 3], [2 / 3, 2 / 3]], spin=0.5)
    sm.set_coupling(-1.0, 0, 1, [0, 0])
    sm.set_coupling(-1.0, 1, 0, [1, 0])
    sm.set_coupling(-1.0, 1, 0, [0, 1])
    for dR in ((1, 0), (-1, 1), (0, -1)):
        sm.set_coupling(np.zeros((3, 3)), 0, 0, dR, dm=[0, 0, D])
        sm.set_coupling(np.zeros((3, 3)), 1, 1, dR, dm=[0, 0, -D])
    sm.set_field([0.0, 0.0, field])
    return sm


fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- bands -------------------------------------------------------------
nodes = np.array([[0.0, 0.0], [1 / 3, 2 / 3], [0.5, 0.5], [0.0, 0.0]])
ks = np.concatenate([
    nodes[i] + (nodes[i + 1] - nodes[i])
    * np.linspace(0, 1, 40, False)[:, None]
    for i in range(3)
] + [nodes[-1:]], axis=0)
x = np.arange(len(ks))
for D, c in ((0.0, "0.7"), (0.2, "C0")):
    w = magnon.bands(honeycomb_fm(D), ks)
    axs[0].plot(x, w[:, 0], color=c, label="D=%g" % D)
    axs[0].plot(x, w[:, 1], color=c)
axs[0].set_xticks([0, 40, 80, 120])
axs[0].set_xticklabels([r"$\Gamma$", "K", "M", r"$\Gamma$"])
axs[0].set_ylabel(r"$\omega / JS$")
axs[0].legend(frameon=False, fontsize=8)
axs[0].set_title("DM gaps the magnon Dirac point")

# ---- Berry curvature ----------------------------------------------------
sm = honeycomb_fm(0.2)
F = magnon.berry_curvature(sm, 41, 0)
im = axs[1].imshow(F.T / (2 * np.pi / 41) ** 2, origin="lower",
                   extent=[0, 1, 0, 1], cmap="RdBu_r")
axs[1].set_xlabel(r"$k_1$")
axs[1].set_ylabel(r"$k_2$")
axs[1].set_title("lower-band curvature, C = %+.0f"
                 % magnon.chern(sm, 0, nk=41))
fig.colorbar(im, ax=axs[1], shrink=0.85)

# ---- thermal Hall -------------------------------------------------------
Ts = np.linspace(0.02, 1.5, 30)
for D, c in ((0.1, "0.6"), (0.2, "C0"), (0.3, "C3")):
    kxy = magnon.thermal_hall(honeycomb_fm(D), Ts, nk=41)
    axs[2].plot(Ts, kxy, color=c, label="D=%g" % D)
axs[2].axhline(0.0, color="0.9", lw=0.8)
axs[2].set_xlabel(r"$T / JS$")
axs[2].set_ylabel(r"$\kappa_{xy}\ [k_B^2/\hbar]$")
axs[2].legend(frameon=False, fontsize=8)
axs[2].set_title("magnon thermal Hall onset")

fig.tight_layout()
fig.savefig("magnon_topology.pdf")
print("saved magnon_topology.pdf")
print("Done.")
