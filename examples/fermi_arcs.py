#!/usr/bin/env python
"""Surface physics of a semi-infinite crystal: Fermi arcs and edge modes.

Beyond-reference capability: the reference studies surfaces only via
finite cuts (cut_piece), which mixes both surfaces and quantizes the
bulk.  pythtb_tpu.surface treats the genuinely SEMI-INFINITE crystal by
Sancho-Rubio decimation -- ~35 iterations resolve 2^35 layers -- with
the whole (energy x k) image computed as one batched device program.

Three classics:
1. the Weyl-semimetal Fermi arc connecting the projected nodes;
2. graphene's zigzag edge flat band between the Dirac projections;
3. the Chern-insulator chiral edge mode crossing the bulk gap.
"""
import time

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import surface
from pythtb_tpu.models import graphene, haldane, weyl

fig, axs = plt.subplots(1, 3, figsize=(13.0, 4.0))

# ---- 1. Weyl Fermi arc: A(E=0) over the surface BZ ----------------------
m = weyl()
nk = 101
ky = np.linspace(-0.5, 0.5, nk)
kz = np.linspace(0.0, 1.0, nk)
kpar = np.stack(np.meshgrid(ky, kz, indexing="ij"), -1).reshape(-1, 2)
t0 = time.time()
A = surface.spectral_function(m, 0, k_par=kpar, energies=np.array([0.0]), eta=0.02)
dt = time.time() - t0
A = A.reshape(nk, nk)
print("Weyl arc map: %d (ky,kz) pixels in %.2f s (one program)" % (nk * nk, dt))
axs[0].imshow(A.T, origin="lower", extent=[ky[0], ky[-1], kz[0], kz[-1]],
              aspect="auto", cmap="magma")
axs[0].plot([0, 0], [0.25, 0.75], "c+", ms=8)  # projected Weyl nodes
axs[0].set_xlabel(r"$k_y$")
axs[0].set_ylabel(r"$k_z$")
axs[0].set_title("Weyl: Fermi arc between node projections")

# ---- 2. graphene zigzag edge band ---------------------------------------
g = graphene()
kpar = np.linspace(0.0, 1.0, 161)[:, None]
energies = np.linspace(-1.5, 1.5, 161)
As = surface.spectral_function(g, 1, k_par=kpar, energies=energies, eta=0.02)
axs[1].imshow(As, origin="lower", extent=[0, 1, energies[0], energies[-1]],
              aspect="auto", cmap="magma", vmax=np.percentile(As, 99))
axs[1].set_xlabel(r"$k_\parallel$")
axs[1].set_ylabel("E")
axs[1].set_title("graphene zigzag: edge flat band")

# ---- 3. Haldane chiral edge mode ----------------------------------------
h = haldane()
energies = np.linspace(-1.5, 1.5, 161)
Ah = surface.spectral_function(h, 1, k_par=kpar, energies=energies, eta=0.02)
axs[2].imshow(Ah, origin="lower", extent=[0, 1, energies[0], energies[-1]],
              aspect="auto", cmap="magma", vmax=np.percentile(Ah, 99))
axs[2].set_xlabel(r"$k_\parallel$")
axs[2].set_ylabel("E")
axs[2].set_title("Haldane: chiral edge mode in the gap")

fig.tight_layout()
fig.savefig("fermi_arcs.pdf")
print("saved fermi_arcs.pdf")

print("Done.")
