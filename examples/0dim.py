#!/usr/bin/env python
"""Zero-dimensional model (NH3-like molecule): discrete levels only.

TPU-native port of the reference workload examples/0dim.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model

sq32 = np.sqrt(3.0) / 2.0
orb = [
    [(2.0 / 3.0) * sq32, 0.0, 0.0],
    [(-1.0 / 3.0) * sq32, 0.5, 0.0],
    [(-1.0 / 3.0) * sq32, -0.5, 0.0],
    [0.0, 0.0, 1.0],
]
mol = tb_model(0, 3, lat=np.eye(3).tolist(), orb=orb)
delta, t = 0.5, 1.0
mol.set_onsite([-delta, -delta, -delta, delta])
for i in range(4):
    for j in range(i + 1, 4):
        mol.set_hop(t, i, j)
mol.display()

evals = mol.solve_all()
print("Molecular levels:", evals)

fig, ax = plt.subplots()
ax.plot(evals, "bo")
ax.set(title="Molecule levels", xlabel="Orbital", ylabel="Energy")
ax.set_xlim(-0.3, 3.3)
ax.set_ylim(evals.min() - 0.5, evals.max() + 0.5)
fig.tight_layout()
fig.savefig("0dim_spectrum.png")
print("Done.")
