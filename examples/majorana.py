#!/usr/bin/env python
"""Topological superconductivity: Majorana modes and chiral BdG edges.

``bdg.bdg_model`` doubles any model into its Nambu form as a plain
tb_model, so the whole framework composes with superconductivity:

1. Kitaev chain phase diagram: the Majorana number (Pfaffian
   invariant) flips at |mu| = 2t, and open chains bind zero modes
   whose splitting decays exponentially with length;
2. end-mode wavefunctions localized on opposite ends;
3. chiral Majorana edge dispersion of the p+ip superconductor,
   resolved with the (unmodified) semi-infinite surface machinery.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import bdg, surface

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- phase diagram + end-mode splitting --------------------------------
mus = np.linspace(-3.0, 3.0, 25)
M = [bdg.majorana_number(bdg.kitaev_chain(1.0, 0.4, mu))
     if abs(abs(mu) - 2.0) > 1e-6 else np.nan for mu in mus]
axs[0].step(mus, M, where="mid", color="k")
for L, c in ((12, "0.7"), (24, "C0"), (36, "C3")):
    e0 = [np.min(np.abs(np.asarray(
        bdg.kitaev_chain(1.0, 0.4, mu).cut_piece(L, 0).solve_all())))
        for mu in mus]
    ax0b = axs[0].twinx() if L == 12 else ax0b
    ax0b.semilogy(mus, e0, color=c, lw=0.9, label="L=%d" % L)
ax0b.set_ylabel(r"open-chain min $|E|$")
ax0b.legend(frameon=False, fontsize=8, loc="upper center")
axs[0].set_xlabel(r"$\mu / t$")
axs[0].set_ylabel("Majorana number")
axs[0].set_title("Kitaev chain: Pfaffian invariant")

# ---- end-mode wavefunctions --------------------------------------------
fin = bdg.kitaev_chain(1.0, 0.4, 0.5).cut_piece(40, 0)
ev, vec = fin.solve_all(eig_vectors=True)
ev = np.asarray(ev)
i0 = np.argsort(np.abs(ev))[:2]
for i, c in zip(i0, ("C0", "C3")):
    w = np.abs(np.asarray(vec)[i]) ** 2
    dens = w[:40] + w[40:]  # particle + hole weight per site
    axs[1].plot(dens, color=c, label="E=%+.1e" % ev[i])
axs[1].set_xlabel("site")
axs[1].set_ylabel(r"$|\psi|^2$")
axs[1].set_title("Majorana end modes (L=40)")
axs[1].legend(frameon=False, fontsize=8)

# ---- chiral Majorana edge ----------------------------------------------
pip = bdg.bdg_model(ptt.models.square(t=-1.0), mu=-2.0,
                    delta=[(0.4, 0, 0, [1, 0]), (0.4j, 0, 0, [0, 1])])
ks = np.linspace(0.0, 1.0, 81)
Es = np.linspace(-1.2, 1.2, 121)
A = surface.spectral_function(pip, 1, k_par=ks[:, None], energies=Es,
                              eta=0.02)
im = axs[2].imshow(np.log10(np.asarray(A).T + 1e-3), origin="lower",
                   aspect="auto", extent=[0, 1, Es[0], Es[-1]],
                   cmap="magma")
axs[2].set_xlabel(r"$k_\parallel$")
axs[2].set_ylabel("E")
axs[2].set_title("p+ip chiral Majorana edge (surface DOS)")
fig.colorbar(im, ax=axs[2], shrink=0.85)

fig.tight_layout()
fig.savefig("majorana.pdf")
print("saved majorana.pdf")
print("Done.")
