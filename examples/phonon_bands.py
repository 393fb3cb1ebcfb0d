#!/usr/bin/env python
"""Lattice dynamics of a honeycomb spring network.

``phonon.force_model`` carries Born longitudinal/transverse springs
with the acoustic sum rule enforced by construction; the dynamical
matrix solves for whole k-batches in one device program.  Four panels:

1. phonon dispersion along Gamma-M-K-Gamma (two acoustic branches
   gapless at Gamma, linear sound cones, optical branches above);
2. phonon DOS with the van Hove steps of the 2-D network;
3. heat capacity: Debye T^2 at low T through the Dulong-Petit plateau
   (4 modes per cell);
4. an isotope defect: a light substitution in a glued supercell binds
   a localized mode split off above the optical band
   (``dynamical_cluster`` mass override).
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import kspace, phonon

lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2]]
fm = phonon.force_model(lat, [[1 / 3, 1 / 3], [2 / 3, 2 / 3]])
fm.set_spring(1.0, 0, 1, [0, 0], kt=0.25)
fm.set_spring(1.0, 1, 0, [1, 0], kt=0.25)
fm.set_spring(1.0, 1, 0, [0, 1], kt=0.25)

fig, axs = plt.subplots(1, 4, figsize=(16.4, 3.4))

# ---- dispersion --------------------------------------------------------
nodes = [[0, 0], [0.5, 0.0], [1 / 3, 2 / 3], [0, 0]]
nseg = 60
kpts = []
for a in range(3):
    for s in range(nseg):
        t = s / nseg
        kpts.append((1 - t) * np.asarray(nodes[a]) + t * np.asarray(nodes[a + 1]))
kpts.append(nodes[-1])
w = phonon.bands(fm, np.asarray(kpts))
for b in range(w.shape[1]):
    axs[0].plot(np.arange(len(kpts)), w[:, b], "C0", lw=1.2)
axs[0].set_xticks([0, nseg, 2 * nseg, 3 * nseg])
axs[0].set_xticklabels(["$\\Gamma$", "M", "K", "$\\Gamma$"])
axs[0].set_ylabel("$\\omega$")
axs[0].set_title("honeycomb phonons")

# ---- DOS ---------------------------------------------------------------
es = np.linspace(0.0, 2.1, 301)
d = phonon.dos(fm, es, 96, smearing=0.02)
axs[1].plot(es, d, "C1", lw=1.2)
axs[1].set_xlabel("$\\omega$")
axs[1].set_title("phonon DOS")

# ---- heat capacity -----------------------------------------------------
Ts = np.logspace(-1.6, 0.8, 40)
C = phonon.heat_capacity(fm, Ts, 64)
axs[2].loglog(Ts, C, "C2", lw=1.4)
axs[2].loglog(Ts[:12], C[6] * (Ts[:12] / Ts[6]) ** 2, "k--", lw=0.8,
              label="$T^2$ (Debye)")
axs[2].axhline(4.0, color="0.6", lw=0.8, label="Dulong-Petit")
axs[2].set_xlabel("$T$")
axs[2].set_ylabel("$C_v$ per cell")
axs[2].legend(fontsize=8)
axs[2].set_title("heat capacity")

# ---- isotope defect ----------------------------------------------------
masses = np.tile([1.0, 1.0], 36)
masses[20] = 0.45  # one light atom in a 6x6 torus
_, wc = phonon.dynamical_cluster(fm, (6, 6), masses=masses)
band_top = w.max()
axs[3].hist(wc, bins=60, color="C3", alpha=0.75)
axs[3].axvline(band_top, color="k", lw=0.8, label="clean band top")
axs[3].set_xlabel("$\\omega$")
axs[3].set_title("light isotope: split-off local mode")
axs[3].legend(fontsize=8)
print("clean band top %.4f; defect mode at %.4f" % (band_top, wc.max()))

fig.tight_layout()
fig.savefig("phonon_bands.pdf")
print("Done.\n")
