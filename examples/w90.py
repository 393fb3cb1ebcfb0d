#!/usr/bin/env python
"""Wannier90 silicon import with diagnostics and filtered interpolation.

TPU-native port of the reference workload examples/w90.py.  Expects the
Wannier90 output fileset (silicon.win, silicon_hr.dat,
silicon_centres.xyz, silicon_band.kpt/dat) in ./silicon_w90 or at the
path given by the W90_SILICON environment variable.
"""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import w90

data_dir = os.environ.get("W90_SILICON", "silicon_w90")
silicon = w90(data_dir, "silicon")

print("Distance shells (Angstrom):", silicon.shells()[:10], "...")

# hopping decay diagnostic
dist, ham = silicon.dist_hop()
fig, ax = plt.subplots()
ax.scatter(dist, np.log(np.abs(ham)), s=4)
ax.set(xlabel="Distance (A)", ylabel="log |t|", title="Hopping decay")
fig.tight_layout()
fig.savefig("silicon_localization.png")

fermi_ev = 0.62285135e1
my_model = silicon.model(
    zero_energy=fermi_ev, min_hopping_norm=0.01, ignorable_imaginary_part=0.01
)

# compare with Wannier90's own interpolation
w90_kpt, w90_evals = silicon.w90_bands_consistency()
int_evals = my_model.solve_all(w90_kpt)

fig, ax = plt.subplots()
for band in w90_evals:
    ax.plot(range(w90_evals.shape[1]), band - fermi_ev, "k-", zorder=-100)
for band in int_evals:
    ax.plot(range(int_evals.shape[1]), band, "r-", zorder=-50)
ax.set(xlim=(0, int_evals.shape[1] - 1), xlabel="K-path from Wannier90",
       ylabel="Band energy (eV)")
fig.tight_layout()
fig.savefig("silicon.png")
print("Max deviation from Wannier90 interpolation: %.4f eV"
      % np.abs(int_evals - (w90_evals - fermi_ev)).max())
print("Done.")
