#!/usr/bin/env python
"""Exact diagonalization of Hubbard clusters.

``ed`` turns any finite model into a many-body Fock-space problem.
Shown here on Hubbard rings:

1. crossover of the half-filled ground state from metal-like to
   Mott-like: double occupancy vs U, against the Hartree-Fock
   variational bound (``meanfield`` energies must lie above ED);
2. the one-particle spectral function A(omega) of an 6-site ring
   opening a Mott gap as U grows (Lehmann sum over N +- 1 sectors);
3. spin correlations <S^z_0 S^z_r>: U amplifies antiferromagnetic
   ordering tendencies.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import ed, meanfield

L = 6
chain = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
chain.set_hop(-1.0, 0, 0, [1])
ring = chain.cut_piece(L, 0, glue_edgs=True)

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- double occupancy + variational bound -----------------------------
Us = np.linspace(0.0, 10.0, 11)
docc, e_ed, e_hf = [], [], []
for U in Us:
    r = ed.hubbard(ring, U, L // 2, L // 2)
    docc.append(r.double_occupancy().mean())
    e_ed.append(r.energy)
    rh = meanfield.hartree_fock(ring, U, float(L), temperature=2e-3,
                                stagger=0.4, seed=1, max_iters=4000)
    e_hf.append(rh["energy"])
axs[0].plot(Us, docc, "o-", color="k", label=r"$\langle n_\uparrow n_\downarrow\rangle$")
axs[0].set_xlabel("U/t")
axs[0].set_ylabel("double occupancy")
ax0b = axs[0].twinx()
ax0b.plot(Us, e_ed, "-", color="C0", label="ED")
ax0b.plot(Us, e_hf, "--", color="C3", label="HF (variational)")
ax0b.set_ylabel("ground energy")
ax0b.legend(frameon=False, fontsize=8)
axs[0].set_title("Mott crossover, HF bound")
assert all(h >= e - 1e-8 for h, e in zip(e_hf, e_ed))

# ---- spectral function: Mott gap opening ------------------------------
om = np.linspace(-6.0, 10.0, 601)
for U, c in ((0.0, "0.7"), (4.0, "C0"), (8.0, "C3")):
    A, _ = ed.spectral_function(ring, L, om, U=U, eta=0.15, modes=[0, 1])
    axs[1].plot(om, A.sum(axis=0), color=c, label="U=%g" % U)
axs[1].set_xlabel(r"$\omega$")
axs[1].set_ylabel(r"$A(\omega)$")
axs[1].set_title("local spectral function")
axs[1].legend(frameon=False, fontsize=8)

# ---- spin correlations ------------------------------------------------
rs = np.arange(L)
for U, c in ((0.0, "0.7"), (4.0, "C0"), (10.0, "C3")):
    r = ed.hubbard(ring, U, L // 2, L // 2)
    axs[2].plot(rs, r.szsz()[0], "o-", color=c, label="U=%g" % U)
axs[2].axhline(0.0, color="0.85", lw=0.8)
axs[2].set_xlabel("site r")
axs[2].set_ylabel(r"$\langle S^z_0 S^z_r\rangle$")
axs[2].set_title("AFM correlations grow with U")
axs[2].legend(frameon=False, fontsize=8)

fig.tight_layout()
fig.savefig("hubbard_ed.pdf")
print("saved hubbard_ed.pdf")
print("Done.")
