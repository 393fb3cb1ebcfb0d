#!/usr/bin/env python
"""Lindhard susceptibility and the RPA Stoner instability.

``response.lindhard`` computes the orbital-resolved particle-hole
bubble chi0(q, omega) for whole q-batches in one device program;
``response.stoner_analysis`` locates the RPA phase boundary.  Shown
on the honeycomb Hubbard model:

1. chi0(q, 0) along a BZ path -- the staggered (AFM) eigenvalue
   dominates, peaking at q = 0 (the two-site cell makes the Neel
   pattern a q = 0 instability);
2. RPA spin-channel enhancement 1 / (1 - U lambda(q)) as U approaches
   U_c ~ 2.28 -- compare the self-consistent Hartree-Fock onset;
3. Im chi_RPA(q, omega): paramagnon softening near the transition.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import response

g = ptt.models.graphene()
fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- static chi0 along a path -----------------------------------------
path = np.array([[0.0, 0.0], [0.5, 0.0], [1 / 3, 2 / 3], [0.0, 0.0]])
nseg = 12
qs = np.concatenate([
    path[i] + (path[i + 1] - path[i]) * np.linspace(0, 1, nseg, False)[:, None]
    for i in range(len(path) - 1)
] + [path[-1:]], axis=0)
st = response.stoner_analysis(g, qs, nk=25, mu=0.0, temperature=2e-3)
x = np.arange(len(qs))
axs[0].plot(x, st["lambda"], "k-")
axs[0].set_xticks([0, nseg, 2 * nseg, 3 * nseg])
axs[0].set_xticklabels([r"$\Gamma$", "M", "K", r"$\Gamma$"])
axs[0].set_ylabel(r"$\lambda(q)$  (instability at $U\lambda=1$)")
axs[0].set_title(r"staggered AFM channel leads, $U_c$=%.2f" % st["U_c_min"])

# ---- RPA enhancement vs U ---------------------------------------------
lam0 = st["lambda"][0]
Us = np.linspace(0.2, 2.2, 21)
axs[1].plot(Us, 1.0 / (1.0 - Us * lam0), "C0-")
axs[1].axvline(1.0 / lam0, color="C3", ls="--",
               label=r"RPA $U_c$ = HF onset")
axs[1].set_xlabel("U/t")
axs[1].set_ylabel("spin-channel enhancement")
axs[1].legend(frameon=False, fontsize=8)
axs[1].set_title("Stoner divergence")

# ---- paramagnon spectrum ----------------------------------------------
om = np.linspace(0.02, 3.0, 120)
qline = np.stack([np.linspace(0.0, 0.5, 24), np.zeros(24)], axis=-1)
chi_s, chi0 = response.rpa_susceptibility(
    g, qline, om, nk=24, U=2.0, channel="spin", mu=0.0,
    temperature=2e-3, eta=0.06)
im = axs[2].imshow(np.imag(np.trace(chi_s, axis1=-2, axis2=-1)).T,
                   origin="lower", aspect="auto",
                   extent=[0, 0.5, om[0], om[-1]], cmap="magma")
axs[2].set_xlabel(r"$q_1$ (reduced, $\Gamma \to$ M)")
axs[2].set_ylabel(r"$\omega$")
axs[2].set_title(r"Im tr $\chi_{RPA}(q,\omega)$ at U=2")
fig.colorbar(im, ax=axs[2], shrink=0.85)

fig.tight_layout()
fig.savefig("rpa_stoner.pdf")
print("saved rpa_stoner.pdf  (U_c=%.3f)" % st["U_c_min"])
print("Done.")
