"""Localization toolkit tour (beyond-reference capability).

Three panels:

* the Aubry-Andre transition read from the Lyapunov exponent: one
  transfer-matrix program sweeps the drive strength; gamma(lambda)
  sits at 0 in the extended phase and follows the EXACT Aubry value
  ln(lambda/2) above the self-dual point lambda = 2;
* Anderson localization lengths xi(E) of a disordered 8-leg strip --
  the smallest positive Lyapunov exponent of a 16-channel transfer
  matrix, all energies advanced in one batched QR-stabilized scan;
* participation ratios of Aubry-Andre eigenstates across the same
  transition (extended states occupy the whole chain, localized ones
  O(xi) sites), with the level-spacing r-ratio annotated on each side.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import localization as loc
from pythtb_tpu.models import aubry_andre

# --- panel 1: Aubry-Andre gamma(lambda), exact value overlaid -------
chain = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
chain.set_hop(-1.0, 0, 0, [1])
beta = (np.sqrt(5) - 1) / 2
L = 60000
lams = np.linspace(0.5, 4.0, 25)
gammas = []
for lam in lams:
    pot = lam * np.cos(2 * np.pi * beta * np.arange(L) + 0.3)
    # probe at the spectrum center of a rational approximant
    Lf = 233
    pf = lam * np.cos(2 * np.pi * (144 / 233) * np.arange(Lf) + 0.3)
    Hf = np.diag(pf) - np.eye(Lf, k=1) - np.eye(Lf, k=-1)
    Hf[0, -1] = Hf[-1, 0] = -1.0
    E0 = np.linalg.eigvalsh(Hf)[Lf // 2]
    ly = loc.lyapunov_spectrum(chain, [E0], L, potential=pot)
    gammas.append(float(ly[0, 0, 0]))
    print("lambda = %.2f  gamma = %.4f  (exact %.4f)"
          % (lam, gammas[-1], max(0.0, np.log(lam / 2))))

# --- panel 2: Anderson strip localization lengths -------------------
sq = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]])
sq.set_hop(-1.0, 0, 0, [1, 0])
sq.set_hop(-1.0, 0, 0, [0, 1])
strip = sq.cut_piece(8, 1)
Es = np.linspace(-3.8, 3.8, 61)
xis = {}
for W in (1.0, 2.0, 4.0):
    xis[W] = loc.localization_length(strip, Es, 40000, disorder=W,
                                     realizations=2, seed=1)
    print("W = %.1f  xi(E=0) = %.1f layers" % (W, xis[W][30]))

# --- panel 3: participation ratios across the AA transition ---------
prs, rstats = [], []
Lc = 377
for lam in lams:
    m = aubry_andre(Lc, lam, t=1.0)
    evals, evecs = m.solve_all(eig_vectors=True)
    prs.append(float(np.median(loc.participation_ratio(evecs))))
    rstats.append(loc.level_spacing_ratio(evals))

fig, axs = plt.subplots(1, 3, figsize=(13.5, 3.9))
axs[0].plot(lams, gammas, "o", ms=4, label=r"transfer matrix")
axs[0].plot(lams, np.maximum(0.0, np.log(lams / 2)), "-",
            label=r"exact $\ln(\lambda/2)$")
axs[0].axvline(2.0, color="0.7", lw=0.8)
axs[0].set(xlabel=r"$\lambda$", ylabel=r"$\gamma$",
           title="Aubry-Andre Lyapunov exponent")
axs[0].legend()
for W, xi in xis.items():
    axs[1].semilogy(Es, xi, label="W = %.0f" % W)
axs[1].set(xlabel="E", ylabel=r"$\xi$ (layers)",
           title="Anderson 8-leg strip")
axs[1].legend()
axs[2].plot(lams, prs, "o-", ms=4)
axs[2].axvline(2.0, color="0.7", lw=0.8)
axs[2].set(xlabel=r"$\lambda$", ylabel="median PR (sites)",
           title="AA eigenstates, L = %d" % Lc)
axs[2].annotate("r = %.2f" % rstats[2], (lams[2], prs[2]),
                textcoords="offset points", xytext=(6, -12))
axs[2].annotate("r = %.2f" % rstats[-2], (lams[-2], prs[-2]),
                textcoords="offset points", xytext=(6, 10))
fig.tight_layout()
fig.savefig("localization.pdf")
print("saved localization.pdf")
print("Done.")
