#!/usr/bin/env python
"""Pseudo-magnetic fields from strain: Landau levels without a magnet.

Triaxially straining a graphene flake (``models.triaxial_graphene_flake``,
Guinea-Katsnelson-Geim) produces a uniform valley-odd pseudo-field:
the local DOS at the flake center develops relativistic Landau levels
E_n ~ sqrt(n B_s) with a sublattice-polarized zero mode -- while time
reversal stays exactly unbroken (every strained hop is real).  The
levels are read out with the deterministic KPM LDOS.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import realspace
from pythtb_tpu.models import triaxial_graphene_flake

fig, axs = plt.subplots(1, 2, figsize=(9.2, 3.6))

for c, colour in [(0.002, "0.6"), (0.004, "k")]:
    fl = triaxial_graphene_flake(36, c)
    pos = np.asarray(fl._orb) @ np.asarray(fl._lat)
    xy = pos - pos.mean(axis=0)
    r2 = np.sum(xy**2, axis=1)
    iA = int(min(np.where(np.arange(len(r2)) % 2 == 0)[0],
                 key=lambda i: r2[i]))
    iB = int(min(np.where(np.arange(len(r2)) % 2 == 1)[0],
                 key=lambda i: r2[i]))
    e, ld = realspace.kpm_ldos(fl, [iA, iB], num_moments=2048,
                               n_energies=2001)
    axs[0].plot(e, ld[0] + ld[1], "-", color=colour, lw=0.9,
                label="strain %.3f" % c)
    if c == 0.004:
        axs[1].plot(e, ld[0], "k-", lw=0.9, label="sublattice A")
        axs[1].plot(e, ld[1], "-", color="0.6", lw=0.9,
                    label="sublattice B")
        i0 = int(np.argmin(np.abs(e)))
        print("zero-mode LDOS: A = %.4f  B = %.4f (polarized)"
              % (ld[0][i0], ld[1][i0]))

axs[0].set_xlim(-2.5, 2.5)
axs[0].set_xlabel("E")
axs[0].set_ylabel("LDOS (flake center)")
axs[0].set_title(r"pseudo-Landau levels, $E_n \propto \sqrt{n\,B_s}$")
axs[0].legend(frameon=False, fontsize=8)
axs[1].set_xlim(-1.0, 1.0)
axs[1].set_xlabel("E")
axs[1].set_title("sublattice-polarized zero mode")
axs[1].legend(frameon=False, fontsize=8)
fig.tight_layout()
fig.savefig("pseudo_field.png", dpi=150)
print("saved pseudo_field.png")

print("Done.")
