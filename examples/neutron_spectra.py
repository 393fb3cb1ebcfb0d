"""Inelastic-neutron spectra from linear spin-wave theory.

``magnon.structure_factor`` computes the one-magnon dynamical spin
structure factor S(q, omega) -- the INS observable -- from the same
batched Colpa diagonalization that powers ``magnon.bands``, using the
bosonic particle-hole map so creation weights at +q come from the
positive-branch para-unitary eigenvectors (beyond-reference capability;
the reference at /root/reference/pythtb.py is electronic-only).

Panels:
1. Topological FM honeycomb (J + Haldane-pattern DM): intensity map
   along Gamma-K-M-K'-Gamma.  The DM gap at the Dirac-magnon point is
   visible, and the intensity varies between the two bands (coherence
   factors), unlike a bare band plot.
2. AFM chain: the zone-boundary-diverging tan(ka/2) Bogoliubov
   coherence factor -- the textbook signature that distinguishes AFM
   spin waves from FM ones.
3. Detailed balance at T > 0: anti-Stokes (energy-gain) peaks appear
   at -omega with weight suppressed by the Bose factor.
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import magnon

# -- 1. topological FM honeycomb -------------------------------------
lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2]]
sm = magnon.spin_model(lat, [[1 / 3, 1 / 3], [2 / 3, 2 / 3]], spin=0.5)
for (i, j, R) in [(0, 1, [0, 0]), (1, 0, [1, 0]), (1, 0, [0, 1])]:
    sm.set_coupling(-1.0, i, j, R)
for dR in ((1, 0), (-1, 1), (0, -1)):
    sm.set_coupling(np.zeros((3, 3)), 0, 0, dR, dm=[0, 0, 0.1])
    sm.set_coupling(np.zeros((3, 3)), 1, 1, dR, dm=[0, 0, -0.1])
sm.set_field([0, 0, 0.02])

nodes = [[0, 0], [1 / 3, 2 / 3], [0.5, 0.5], [2 / 3, 1 / 3], [0, 0]]
nq = 160
qpath, dists = [], [0.0]
for a, b in zip(nodes[:-1], nodes[1:]):
    seg = np.linspace(a, b, nq // 4, endpoint=False)
    qpath.extend(seg)
qpath.append(nodes[-1])
qpath = np.array(qpath)
om = np.linspace(0.0, 3.6, 300)
I = magnon.structure_factor(sm, qpath, omegas=om, eta=0.04)

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))
axs[0].imshow(I.T, origin="lower", aspect="auto",
              extent=[0, len(qpath), om[0], om[-1]], cmap="magma",
              vmax=np.percentile(I, 99.5))
w = magnon.bands(sm, qpath)
for b in range(2):
    axs[0].plot(np.arange(len(qpath)), w[:, b], "w--", lw=0.5, alpha=0.6)
axs[0].set_xticks([0, nq // 4, nq // 2, 3 * nq // 4, len(qpath) - 1])
axs[0].set_xticklabels(["$\\Gamma$", "K", "M", "K$'$", "$\\Gamma$"])
axs[0].set_ylabel(r"$\omega / |J|S$")
axs[0].set_title("FM honeycomb + DM: S(q,$\\omega$)")

# -- 2. AFM chain coherence factors ----------------------------------
afm = magnon.spin_model([[1.0]], [[0.0], [0.5]], spin=0.5)
afm.set_coupling(1.0, 0, 1, [0])
afm.set_coupling(1.0, 1, 0, [1])
afm.set_moments([[0, 0, 1], [0, 0, -1]])
qs1 = np.linspace(0.02, 0.98, 97)[:, None]
om1 = np.linspace(0.0, 1.4, 240)
I1 = magnon.structure_factor(afm, qs1, omegas=om1, eta=0.02,
                             polarization=False)
axs[1].imshow(I1.T, origin="lower", aspect="auto",
              extent=[qs1[0, 0], qs1[-1, 0], om1[0], om1[-1]],
              cmap="magma", vmax=np.percentile(I1, 99))
axs[1].plot(qs1[:, 0], np.abs(np.sin(np.pi * qs1[:, 0])), "w--",
            lw=0.5, alpha=0.6)
axs[1].set_xlabel("q (reduced, 2-site cell)")
axs[1].set_ylabel(r"$\omega / 2JS$")
axs[1].set_title("AFM chain: $\\tan(ka/2)$ intensity")

# -- 3. detailed balance ----------------------------------------------
fmc = magnon.spin_model([[1.0]], [[0.0]], spin=0.5)
fmc.set_coupling(-1.0, 0, 0, [1])
fmc.set_field([0, 0, 0.3])
om2 = np.linspace(-2.5, 2.5, 1200)
q2 = np.array([[0.2]])
for T, c in [(0.0, "C0"), (0.4, "C1"), (1.0, "C3")]:
    I2 = magnon.structure_factor(fmc, q2, omegas=om2, eta=0.05,
                                 temperature=T, polarization=False)
    axs[2].plot(om2, I2[0], color=c, lw=1.0, label="T=%g" % T)
axs[2].set_xlabel(r"$\omega$")
axs[2].set_ylabel(r"S(q=0.2, $\omega$)")
axs[2].set_title("Stokes / anti-Stokes detailed balance")
axs[2].legend(fontsize=8)

fig.tight_layout()
fig.savefig("neutron_spectra.pdf")
w0 = magnon.bands(fmc, q2)[0, 0]
g = 1.0 / np.expm1(w0 / 1.0)
print("FM chain w(0.2) = %.4f; Bose ratio at T=1: %.4f" % (w0, g / (1 + g)))
print("saved neutron_spectra.pdf")
print("Done.")
