#!/usr/bin/env python
"""Impurity states in a gapped host by exact T-matrix embedding.

A substitutional impurity in hexagonal BN: the T-matrix embeds the
local perturbation in the INFINITE crystal (no finite flake, no edge
artifacts).  Shown here:

1. the in-gap bound-state energy pulled out of the valence band as the
   impurity strength U grows (with the U -> infinity vacancy limit);
2. the LDOS at the impurity site across the gap: the host continuum,
   the gap, and the sharp bound-state resonance;
3. the spatial decay of the bound state read from the embedded G on a
   cluster of neighboring cells.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import impurity, models

bn = models.bn(delta=1.0)  # gap (-1.008, +1.008)

# ---- bound-state energy vs impurity strength -------------------------
Us = [1.5, 2.0, 2.5, 3.5, 5.0, 8.0, 15.0, 40.0]
ebound = []
for U in Us:
    r = impurity.bound_states(bn, np.array([[U]]), [0], (-0.99, 0.99),
                              nk=(64, 64))
    ebound.append(r[0] if len(r) else np.nan)
    print("U = %5.1f -> E_b = %+.4f" % (U, ebound[-1]))

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.5))
axs[0].semilogx(Us, ebound, "ko-", ms=4)
axs[0].axhline(+1.008, color="0.8", lw=0.8)
axs[0].axhline(-1.008, color="0.8", lw=0.8)
axs[0].set_xlabel("impurity strength U")
axs[0].set_ylabel(r"$E_b$")
axs[0].set_title("bound level vs U (vacancy limit)")

# ---- LDOS at the impurity site ---------------------------------------
U = 4.0
energies = np.linspace(-3.6, 3.6, 481)
G, _T = impurity.t_matrix(bn, np.array([[U]]), energies, [0],
                          nk=(96, 96), eta=0.04)
ldos = -np.imag(G[:, 0, 0]) / np.pi
axs[1].plot(energies, ldos, "k-", lw=0.9)
axs[1].set_xlabel("E")
axs[1].set_ylabel(r"LDOS$_0$(E)")
axs[1].set_title("impurity-site LDOS (U = %.1f)" % U)

# ---- spatial decay of the bound state --------------------------------
rvec = impurity.bound_states(bn, np.array([[U]]), [0], (-0.99, 0.99),
                             nk=(64, 64))
Eb = rvec[0]
cluster = [([r, 0], 0) for r in range(0, 7)]
V = np.zeros((7, 7))
V[0, 0] = U
Gb, _ = impurity.t_matrix(bn, V, np.array([Eb]), cluster, nk=(96, 96),
                          eta=5e-3)
amp = -np.imag(np.diagonal(Gb[0])) / np.pi
axs[2].semilogy(range(7), amp / amp[0], "ko-", ms=4)
axs[2].set_xlabel("cells from impurity")
axs[2].set_ylabel("bound-state weight (norm.)")
axs[2].set_title("exponential localization")
fig.tight_layout()
fig.savefig("impurity_states.png", dpi=150)
print("saved impurity_states.png")

print("Done.")
