"""Fermi surfaces, tetrahedron DOS, dHvA orbits, and the Edelstein
effect.

``fermisurface`` extracts iso-energy contours by marching squares on
one batched device solve, evaluates the analytic linear-interpolation
(triangle/tetrahedron) DOS with NO smearing parameter, and measures
closed-orbit areas (Onsager dHvA frequencies) and cyclotron masses.
``boltzmann.edelstein`` gives the RTA spin accumulation per electric
field of a Rashba model -- all beyond-reference capabilities.

Panels:
1. Square-lattice Fermi surfaces across the van Hove filling:
   electron pocket -> open square at E = 0 -> hole pocket.
2. Triangle-method DOS of graphene: sharp van Hove spikes and the
   linear Dirac crossing, no Gaussian broadening anywhere.
3. dHvA orbit area and cyclotron mass vs E_F (parabolic limits shown).
4. Edelstein tensor of the Rashba square lattice vs chemical
   potential: alpha_yx = -alpha_xy, all other components zero.
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import boltzmann, fermisurface as fs

fig, axs = plt.subplots(1, 4, figsize=(15, 3.4))

# -- 1. square-lattice FS family --------------------------------------
sq = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]])
sq.set_hop(-1.0, 0, 0, [1, 0])
sq.set_hop(-1.0, 0, 0, [0, 1])
for ef, c in [(-3.0, "C0"), (-1.5, "C1"), (0.0, "0.4"), (1.5, "C3"),
              (3.0, "C2")]:
    for pts, closed in fs.fermi_surface(sq, ef, nk=301)[0]:
        axs[0].plot(pts[:, 0] % 1.0, pts[:, 1] % 1.0, ".", ms=0.8,
                    color=c)
axs[0].set_xlabel("$k_1$")
axs[0].set_ylabel("$k_2$")
axs[0].set_title("square lattice: $E_F$ = -3..3")
axs[0].set_aspect("equal")

# -- 2. graphene triangle DOS ------------------------------------------
g = ptt.models.graphene(t=-1.0)
Es = np.linspace(-3.3, 3.3, 1200)
d = fs.dos_linear(g, Es, nk=256)
axs[1].plot(Es, d, lw=0.8)
axs[1].set_xlabel("E / |t|")
axs[1].set_ylabel("DOS (states / cell / energy)")
axs[1].set_title("graphene, triangle method (no smearing)")

# -- 3. dHvA areas + cyclotron mass ------------------------------------
efs = np.linspace(-3.9, -2.6, 14)
areas = [fs.orbit_areas(sq, e, 0, nk=301)[0] for e in efs]
axs[2].plot(efs + 4.0, areas, "o-", ms=3, label="orbit area $A(E_F)$")
axs[2].plot(efs + 4.0, np.pi * (efs + 4.0), "--", color="0.6",
            label=r"parabolic $\pi k_F^2$")
m_star = fs.cyclotron_mass(sq, -3.8, 0, nk=301)
axs[2].set_xlabel("$E_F$ above band bottom")
axs[2].set_ylabel("Cartesian k-area")
axs[2].legend(fontsize=8)
axs[2].set_title("dHvA orbit area ($m^*$(-3.8) = %.3f)" % m_star)

# -- 4. Edelstein vs mu -------------------------------------------------
_SX = np.array([[0, 1], [1, 0]], dtype=complex) / 2
_SY = np.array([[0, -1j], [1j, 0]], dtype=complex) / 2
ra = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]], nspin=2)
ra.set_hop(-1.0 * np.eye(2) - 1j * 0.3 * 2 * _SY, 0, 0, [1, 0])
ra.set_hop(-1.0 * np.eye(2) + 1j * 0.3 * 2 * _SX, 0, 0, [0, 1])
mus = np.linspace(-4.2, 4.2, 60)
al = boltzmann.edelstein(ra, mus, 0.05, 128)
axs[3].plot(mus, al[:, 1, 0], lw=1.0, label=r"$\alpha_{yx}$")
axs[3].plot(mus, al[:, 0, 1], lw=1.0, ls="--", label=r"$\alpha_{xy}$")
axs[3].plot(mus, al[:, 0, 0], lw=0.8, color="0.6",
            label=r"$\alpha_{xx}$ (0)")
axs[3].axhline(0.0, color="0.85", lw=0.6, zorder=0)
axs[3].set_xlabel(r"$\mu$")
axs[3].set_ylabel(r"$\alpha$ [$s$ per $E$, $q\tau$=-1]")
axs[3].legend(fontsize=8)
axs[3].set_title("Rashba Edelstein effect")

fig.tight_layout()
fig.savefig("fermi_surface_tools.pdf")
print("m* at E_F=-3.8:", m_star)
print("alpha_yx at mu=-2.5:",
      float(np.interp(-2.5, mus, al[:, 1, 0])))
print("saved fermi_surface_tools.pdf")
print("Done.")
