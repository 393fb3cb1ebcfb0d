#!/usr/bin/env python
"""Minimal Wannier90 import: silicon bands along L-Gamma-X-K-Gamma.

TPU-native port of the reference workload examples/w90_quick.py.
"""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import w90

data_dir = os.environ.get("W90_SILICON", "silicon_w90")
silicon = w90(data_dir, "silicon")
my_model = silicon.model(min_hopping_norm=0.01)

path = [
    [0.5, 0.5, 0.5],
    [0.0, 0.0, 0.0],
    [0.5, -0.5, 0.0],
    [0.375, -0.375, 0.0],
    [0.0, 0.0, 0.0],
]
k_label = (r"$L$", r"$\Gamma$", r"$X$", r"$K$", r"$\Gamma$")
k_vec, k_dist, k_node = my_model.k_path(path, 101)
evals = my_model.solve_all(k_vec)

fig, ax = plt.subplots()
for band in evals:
    ax.plot(k_dist, band, "k-")
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
ax.set(xlabel="Path in k-space", ylabel="Band energy (eV)", xlim=(k_dist[0], k_dist[-1]))
ax.set_xticks(k_node)
ax.set_xticklabels(k_label)
fig.tight_layout()
fig.savefig("silicon_quick.png")
print("Done.")
