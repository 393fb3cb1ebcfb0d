#!/usr/bin/env python
"""Buckled square layer: 2-D k-space for a model living in 3-D space.

TPU-native port of the reference workload examples/buckled_layer.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model

lat = np.eye(3).tolist()
orb = [[0.0, 0.0, -0.15], [0.5, 0.5, 0.15]]
m = tb_model(2, 3, lat, orb)  # per defaults to [0, 1]
delta, t = 1.1, 0.6
m.set_onsite([-delta, delta])
for lv in ([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]):
    m.set_hop(t, 1, 0, lv)
m.display()

path = [[0.0, 0.0], [0.0, 0.5], [0.5, 0.5], [0.0, 0.0]]
labels = (r"$\Gamma$", r"$X$", r"$M$", r"$\Gamma$")
k_vec, k_dist, k_node = m.k_path(path, 301)
evals = m.solve_all(k_vec)

fig, ax = plt.subplots()
for band in evals:
    ax.plot(k_dist, band)
ax.set(title="Buckled layer band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels(labels)
ax.set_xlim(k_node[0], k_node[-1])
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("buckled_layer_band.png")
print("Done.")
