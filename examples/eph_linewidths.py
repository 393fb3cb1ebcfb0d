#!/usr/bin/env python
"""Electron-phonon coupling on a honeycomb lattice: linewidths,
Eliashberg function, and the Fermi-liquid sharpness of quasiparticles.

``eph.coupling`` builds the exact Peierls-bond vertex g_{mn nu}(k, q)
(the hop amplitude t(d) = t0 exp(-beta (d/d0 - 1)) differentiated along
each bond); ``eph.linewidths`` sums the Fermi-golden-rule decay rate
over a q-grid in one compiled device program per k, and
``eph.eliashberg`` accumulates alpha^2 F(omega) and the mass
enhancement lambda.  Three panels:

1. band-resolved linewidth Gamma_n(k) along the path Gamma-K-M-Gamma
   at a doped Fermi level: the width tracks the phase space for
   phonon emission/absorption around mu;
2. temperature dependence at a Fermi-surface k-point vs one far
   below mu: the on-shell state sharpens as T -> 0 (Pauli blocking +
   empty absorption targets -- the Fermi-liquid test committed in
   tests/test_eph.py), while the deep hole keeps a finite emission
   width;
3. alpha^2 F(omega) with the accumulated lambda.

No reference counterpart (PythTB has no phonons at all).
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import eph, phonon

# electrons: graphene-like honeycomb; phonons: springs on the same bonds
lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1 / 3.0, 1 / 3.0], [2 / 3.0, 2 / 3.0]]
m = ptt.tb_model(2, 2, lat, orb)
m.set_hop(-1.0, 0, 1, [0, 0])
m.set_hop(-1.0, 1, 0, [1, 0])
m.set_hop(-1.0, 1, 0, [0, 1])
fc = phonon.force_model(lat, orb, masses=[1.0, 1.0])
fc.set_spring(1.0, 0, 1, [0, 0], kt=0.25)
fc.set_spring(1.0, 1, 0, [1, 0], kt=0.25)
fc.set_spring(1.0, 1, 0, [0, 1], kt=0.25)

beta_eph = 2.0   # bond-stretch coupling strength t'(d0) = -beta t / d0
mu = -0.8        # hole-doped: a real Fermi surface in the lower band

# -- panel 1: linewidths along Gamma-K-M-Gamma ------------------------
kpath, kdist, knode = m.k_path(
    [[0, 0], [2 / 3, 1 / 3], [0.5, 0.0], [0, 0]], 49, report=False)
gam = eph.linewidths(m, fc, beta_eph, kpath, mu=mu, temperature=0.08,
                     nkq=(18, 18), sigma=0.08)
ev = np.asarray(m.solve_all(kpath))

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.8))
for n in range(ev.shape[0]):
    axs[0].plot(kdist, ev[n], "0.6", lw=0.8)
    sc = axs[0].scatter(kdist, ev[n], c=gam[:, n], s=14,
                        cmap="viridis", vmin=0.0)
axs[0].axhline(mu, color="C3", lw=0.8, ls="--", label="$\\mu$")
axs[0].set_xticks(knode, ["$\\Gamma$", "K", "M", "$\\Gamma$"])
axs[0].set_ylabel("$E$")
axs[0].set_title("bands colored by $\\Gamma_n(k)$")
fig.colorbar(sc, ax=axs[0], label="$\\Gamma$")
axs[0].legend(fontsize=8)

# -- panel 2: Fermi-liquid sharpness ----------------------------------
# a k-point whose lower band sits AT mu vs one far below
kline = np.stack([np.linspace(0.0, 2 / 3, 160),
                  np.linspace(0.0, 1 / 3, 160)], axis=-1)
e_lo = np.asarray(m.solve_all(kline))[0]
k_fs = kline[np.argmin(np.abs(e_lo - mu))]
k_deep = np.array([0.0, 0.0])  # Gamma: bottom of the lower band
Ts = np.array([0.02, 0.04, 0.08, 0.15, 0.3])
g_fs, g_deep = [], []
for T in Ts:
    g2 = eph.linewidths(m, fc, beta_eph, np.stack([k_fs, k_deep]),
                        mu=mu, temperature=float(T), nkq=(18, 18),
                        sigma=0.08)
    g_fs.append(g2[0, 0])
    g_deep.append(g2[1, 0])
axs[1].plot(Ts, g_fs, "o-", label="$e_k = \\mu$ (on shell)")
axs[1].plot(Ts, g_deep, "s-", label="band bottom (deep hole)")
axs[1].set_xlabel("$k_B T$")
axs[1].set_ylabel("$\\Gamma$")
axs[1].set_title("quasiparticles sharpen at the Fermi level")
axs[1].legend(fontsize=8)

# -- panel 3: Eliashberg function -------------------------------------
r = eph.eliashberg(m, fc, beta_eph, mu=mu, nk=(14, 14), nkq=(14, 14))
axs[2].plot(r["omega"], r["a2f"], "C0", lw=1.4)
axs[2].set_xlabel("$\\omega$")
axs[2].set_ylabel("$\\alpha^2 F(\\omega)$")
axs[2].set_title("$\\lambda$ = %.3f, $N(\\mu)$ = %.3f"
                 % (r["lambda"], r["dos_ef"]))

fig.tight_layout()
fig.savefig("eph_linewidths.pdf")
print("Gamma range on the path: [%.2e, %.2e]" % (gam.min(), gam.max()))
print("on-shell Gamma(T): " + ", ".join("%.4f" % g for g in g_fs))
print("lambda = %.4f" % r["lambda"])
print("Done.")
