#!/usr/bin/env python
"""Chiral edge spectrum of the semi-infinite Hofstadter system.

Surface x magnetic composition showcase: the magnetic supercell at
rational flux (pythtb_tpu.magnetic, an upstream wish-list feature the
reference never implemented) feeds the Sancho-Rubio decimation
(pythtb_tpu.surface) directly, since both sides are plain hop tables.
The spectral map A(E, k) of the GENUINELY semi-infinite system shows
the magnetic subbands bridged by one chiral edge mode per gap, with no
finite-size splitting -- the spectra of the two inequivalent surfaces
disperse oppositely (chirality), and each matches a deep-slab direct
inversion to machine precision (tests/test_surface.py).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import magnetic, models, surface

q = 5
msc = magnetic.magnetic_supercell(models.square(), 1, q)

kpar = np.linspace(0.0, 1.0, 161)[:, None]
energies = np.linspace(-4.0, 4.0, 221)

fig, axs = plt.subplots(1, 2, figsize=(9.0, 3.6), sharey=True)
for ax, side in zip(axs, ("bottom", "top")):
    A = surface.spectral_function(
        msc, 1, k_par=kpar, energies=energies, eta=0.04, side=side
    )
    ax.imshow(
        np.log10(A + 1e-3), origin="lower", aspect="auto",
        extent=(0.0, 1.0, energies[0], energies[-1]), cmap="inferno",
    )
    ax.set(xlabel=r"$k_\parallel$", title="%s surface" % side)
axs[0].set_ylabel("E")
fig.suptitle(r"Semi-infinite Hofstadter ($\phi = 1/%d$): chiral edge modes" % q)
fig.tight_layout()
fig.savefig("hofstadter_edge.png", dpi=150)
print("Done.")
