#!/usr/bin/env python
"""Two-terminal quantum transport: conductance staircases and
topologically protected channels.

``negf.landauer_transmission`` builds lead self-energies from the
package's Sancho-Rubio decimation and returns T(E) for a whole energy
batch in one device program.  Shown here:

1. the integer conductance staircase of a pristine graphene nanoribbon
   (T(E) = number of propagating modes, overlaid);
2. a Kane-Mele quantum-spin-Hall ribbon: T = 2 across the bulk gap --
   one helical Kramers pair per edge -- UNCHANGED by strong
   TRS-preserving disorder in the scattering region, while the same
   disorder visibly degrades a trivial metallic wire.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import negf

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- staircase --------------------------------------------------------
rib = ptt.models.graphene(t=-1.0).cut_piece(5, 1, glue_edgs=False)
Es = np.linspace(-3.0, 3.0, 301)
T = negf.landauer_transmission(rib, Es, eta=1e-6)
M = negf.mode_count(rib, Es)
axs[0].plot(Es, T, "k-", lw=1.0, label="NEGF T(E)")
axs[0].plot(Es, M, "-", color="0.7", lw=0.8, label="mode count")
axs[0].set_xlabel("E")
axs[0].set_ylabel(r"T  [$2e^2/h$]")
axs[0].set_title("pristine ribbon: integer staircase")
axs[0].legend(frameon=False, fontsize=8)

# ---- protected helical channels --------------------------------------
km = ptt.models.kane_mele(esite=1.0, rashba=0.0)
ribk = km.cut_piece(6, 1, glue_edgs=False)
H00, _ = negf.lead_blocks(ribk)
rng = np.random.default_rng(1)
dis = np.repeat(rng.uniform(-0.5, 0.5, len(H00) // 2), 2)
Ek = np.linspace(-0.6, 0.6, 121)
Tc = negf.landauer_transmission(ribk, Ek, eta=1e-6)
Td = negf.landauer_transmission(ribk, Ek, device=H00 + np.diag(dis),
                                eta=1e-6)
axs[1].plot(Ek, Tc, "k-", lw=1.0, label="clean")
axs[1].plot(Ek, Td, "--", color="0.5", lw=1.0, label="disordered device")
axs[1].axhline(2.0, color="0.85", lw=0.8, zorder=0)
axs[1].set_xlabel("E")
axs[1].set_title("QSH ribbon: protected T = 2 plateau")
axs[1].legend(frameon=False, fontsize=8)
ig = np.abs(Ek) > 0.15
print("in-gap plateau: clean %.4f, disordered %.4f (protected)"
      % (Tc[ig].mean(), Td[ig].mean()))

# ---- Anderson localization --------------------------------------------
H00g, _ = negf.lead_blocks(rib)
Sg = len(H00g)
E1 = np.array([1.25])
Ls = [4, 8, 16, 32]
means, sems = [], []
for L in Ls:
    lnT = []
    for s_ in range(8):
        rr = np.random.default_rng(100 * s_ + L)
        layers = [H00g + np.diag(rr.uniform(-1.5, 1.5, Sg))
                  for _ in range(L)]
        Tl = negf.landauer_transmission(rib, E1, device=layers,
                                        eta=1e-7)
        # floor at the numerical noise level of the NEGF trace: a draw
        # that rounds to <= 0 would map to ln(1e-300) = -691 and wreck
        # the <ln T> average at large L
        lnT.append(np.log(max(Tl[0], 1e-16)))
    means.append(np.mean(lnT))
    sems.append(np.std(lnT) / np.sqrt(len(lnT)))
axs[2].errorbar(Ls, means, yerr=sems, fmt="ko-", ms=4, capsize=3)
axs[2].set_xlabel("device length L (layers)")
axs[2].set_ylabel(r"$\langle \ln T \rangle$")
axs[2].set_title("Anderson localization: self-averaging decay")
print("Anderson <ln T> vs L:", [round(m, 2) for m in means])

fig.tight_layout()
fig.savefig("quantum_transport.png", dpi=150)
print("saved quantum_transport.png")

print("Done.")
