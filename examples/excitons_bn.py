#!/usr/bin/env python
"""Excitons in a gapped honeycomb (hBN-like) model from the
Bethe-Salpeter equation.

``exciton.bse`` diagonalizes the Tamm-Dancoff BSE with a
user-specified density-density interaction in one device program per
momentum; ``exciton.absorption`` turns the eigenpairs into the optical
conductivity in the exact units/conventions of
``optical.optical_conductivity``.  Shown here:

1. absorption with and without electron-hole attraction: bound
   excitons pull discrete oscillator strength below the
   quasiparticle gap (the hallmark of 2-D excitonic physics);
2. the lowest exciton's electron-hole envelope |psi(R)|^2 tightening
   as the screening length shrinks (stronger attraction);
3. the exciton center-of-mass dispersion Omega_S(Q) along the BZ
   diagonal -- one compiled program reused for every Q.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import exciton, optical

# hBN-like: gapped graphene, nearest-neighbour hops
lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
bn = ptt.tb_model(2, 2, lat, orb)
delta, t = 0.9, -1.0
bn.set_onsite([-delta, delta])
bn.set_hop(t, 0, 1, [0, 0])
bn.set_hop(t, 1, 0, [1, 0])
bn.set_hop(t, 1, 0, [0, 1])

nk = (18, 18)
kpts = np.stack(np.meshgrid(np.arange(nk[0]) / nk[0],
                            np.arange(nk[1]) / nk[1],
                            indexing="ij"), axis=-1).reshape(-1, 2)
ev = bn.solve_all(kpts)
qp_gap = float(np.min(ev[1] - ev[0]))

# screened-Coulomb-like density-density repulsion (e-h attraction)
V = exciton.radial_interaction(bn, lambda r: 1.6 / (r + 0.5), 3.0)

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.8))

# ---- absorption: excitonic vs independent-particle --------------------
w = np.linspace(0.5, 5.0, 401)
sig_x = exciton.absorption(bn, V, w, occ=[0], nk=nk, eta=0.06, qp="none")
sig_ip = optical.optical_conductivity(bn, w, occ=[0], nk=nk, eta=0.06)
axs[0].plot(w, sig_ip[0, 0].real, "k--", lw=1.2, label="independent particle")
axs[0].plot(w, sig_x[0, 0].real, "C3", lw=1.6, label="BSE")
axs[0].axvline(qp_gap, color="0.6", lw=0.8)
axs[0].text(qp_gap + 0.05, axs[0].get_ylim()[1] * 0.82, "QP gap",
            color="0.4", fontsize=8)
axs[0].set_xlabel(r"$\omega$")
axs[0].set_ylabel(r"Re $\sigma_{xx}$  ($e^2/h$)")
axs[0].set_title("bound excitons below the gap")
axs[0].legend(fontsize=8)

res = exciton.bse(bn, V, occ=[0], nk=nk, qp="none")
print("QP gap %.4f  lowest exciton %.4f  binding %.4f"
      % (qp_gap, res.energies[0], qp_gap - res.energies[0]))

# ---- e-h envelope vs coupling strength --------------------------------
for scale, c in ((0.8, "C0"), (1.6, "C3")):
    Vs = exciton.radial_interaction(bn, lambda r: scale / (r + 0.5), 3.0)
    r = exciton.bse(bn, Vs, occ=[0], nk=nk, qp="none")
    _, wR = r.wavefunction(0)
    # radial profile vs cell separation along the first lattice axis
    prof = wR[:, 0]
    prof = np.roll(prof, nk[0] // 2)
    x = np.arange(nk[0]) - nk[0] // 2
    axs[1].semilogy(x, np.maximum(prof, 1e-12), "-o", ms=3, color=c,
                    label="V scale %.1f (E_b %.2f)"
                    % (scale, qp_gap - r.energies[0]))
axs[1].set_xlabel("electron-hole separation (cells)")
axs[1].set_ylabel(r"$|\psi(R)|^2$")
axs[1].set_title("envelope localizes with coupling")
axs[1].legend(fontsize=8)

# ---- exciton dispersion along the BZ diagonal -------------------------
Qfrac = np.linspace(0.0, 0.5, 9)
Qs = np.stack([Qfrac, Qfrac], axis=-1)
disp = exciton.dispersion(bn, V, [0], nk, Qs, qp="none")
for band in range(4):
    axs[2].plot(Qfrac, disp[:, band], "-o", ms=3, color="C0")
axs[2].axhline(qp_gap, color="0.6", lw=0.8, ls="--")
axs[2].set_xlabel(r"$Q$ along $(q, q)$")
axs[2].set_ylabel(r"$\Omega_S(Q)$")
axs[2].set_title("exciton center-of-mass dispersion")

fig.tight_layout()
fig.savefig("excitons_bn.pdf")
print("saved excitons_bn.pdf")
print("Done.")
