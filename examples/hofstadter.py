#!/usr/bin/env python
"""Hofstadter butterflies as ONE compiled device program each.

Beyond-reference capability (the upstream wish list asks for "magnetic
field via Peierls substitution", /root/reference/notes/TODO:78, never
implemented there).  Because every Peierls phase is linear in the flux
index p, the full butterfly -- all rational fluxes p/q at fixed q, a
k-mesh of the magnetic BZ, all q*nsta magnetic subbands -- is a single
jitted program: a broadcast phase multiply feeding one batched eigh.

Also computes the TKNN Chern numbers of the flux-1/3 subbands and the
Landau-level edge spectrum of a ribbon at irrational flux.
"""
import time

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import magnetic, flows, surface
from pythtb_tpu.models import library as zoo


# ---- the classic square-lattice butterfly -------------------------------
sq = zoo.square()
q = 40
t0 = time.time()
phis, evals = magnetic.hofstadter_butterfly(sq, q, nk=4)
dt = time.time() - t0
print("square butterfly: q=%d -> %s evals in %.3f s (one program)" % (q, evals.shape, dt))

fig, axs = plt.subplots(1, 2, figsize=(11.0, 5.0))
for i, phi in enumerate(phis):
    e = evals[i].ravel()
    axs[0].plot(np.full(e.shape, phi), e, "k.", ms=0.6)
axs[0].set_xlabel(r"flux $\phi$ per plaquette (quanta)")
axs[0].set_ylabel("E")
axs[0].set_title("square lattice, q=%d" % q)

# ---- graphene butterfly (fractional orbital positions) ------------------
g = zoo.graphene()
phis_g, evals_g = magnetic.hofstadter_butterfly(g, q, nk=4)
for i, phi in enumerate(phis_g):
    e = evals_g[i].ravel()
    axs[1].plot(np.full(e.shape, phi), e, "k.", ms=0.6)
axs[1].set_xlabel(r"flux $\phi$ per hexagon (quanta)")
axs[1].set_ylabel("E")
axs[1].set_title("honeycomb, q=%d" % q)
fig.tight_layout()
fig.savefig("hofstadter_butterfly.pdf")
print("saved hofstadter_butterfly.pdf")

# ---- TKNN Chern numbers at flux 1/3 --------------------------------------
msc = magnetic.magnetic_supercell(sq, 1, 3)
cherns = []
for nocc in (1, 2, 3):
    c = flows.chern_number(msc, occ=list(range(nocc)), nk=(31, 31))
    cherns.append(c)
band_cherns = np.diff([0.0] + [c for c in cherns])
print("flux 1/3 subband Chern numbers:", np.round(band_cherns, 6), "(TKNN: 1, -2, 1)")

# ---- Landau edge spectrum of a finite ribbon at irrational flux ----------
ribbon = sq.cut_piece(30, 0)  # finite along x, periodic along y
pm = magnetic.peierls_model(ribbon, 1.0 / (2.0 * np.pi * 2.3), dirs=(0, 1))
kpts = np.linspace(0.0, 1.0, 101)[:, None]
ev = pm.solve_all(kpts)
fig2, ax2 = plt.subplots(figsize=(5.0, 4.0))
for band in ev:
    ax2.plot(kpts[:, 0], band, "k-", lw=0.4)
ax2.set_xlabel(r"$k_y$")
ax2.set_ylabel("E")
ax2.set_title("ribbon Landau levels + chiral edge modes")
fig2.tight_layout()
fig2.savefig("hofstadter_ribbon.pdf")
print("saved hofstadter_ribbon.pdf")

# ---- semi-infinite Hofstadter edge spectrum (no finite-size effects) -----
msc = magnetic.magnetic_supercell(sq, 1, 4)
kpar = np.linspace(0.0, 1.0, 121)[:, None]
energies = np.linspace(-3.2, 3.2, 161)
As = surface.spectral_function(msc, 1, k_par=kpar, energies=energies, eta=0.03)
fig3, ax3 = plt.subplots(figsize=(5.0, 4.0))
ax3.imshow(As, origin="lower", extent=[0, 1, energies[0], energies[-1]],
           aspect="auto", cmap="magma", vmax=np.percentile(As, 99))
ax3.set_xlabel(r"$k_\parallel$")
ax3.set_ylabel("E")
ax3.set_title("semi-infinite Hofstadter edge, flux 1/4 (decimation)")
fig3.tight_layout()
fig3.savefig("hofstadter_edge.pdf")
print("saved hofstadter_edge.pdf (chiral edges bridging every subband gap)")

print("Done.")
