#!/usr/bin/env python
"""Two-band checkerboard lattice along Gamma-X-M-Gamma.

TPU-native port of the reference workload examples/checkerboard.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import tb_model

m = tb_model(2, 2, lat=[[1.0, 0.0], [0.0, 1.0]], orb=[[0.0, 0.0], [0.5, 0.5]])
delta, t = 1.1, 0.6
m.set_onsite([-delta, delta])
for lv in ([0, 0], [1, 0], [0, 1], [1, 1]):
    m.set_hop(t, 1, 0, lv)
m.display()

path = [[0.0, 0.0], [0.0, 0.5], [0.5, 0.5], [0.0, 0.0]]
labels = (r"$\Gamma$", r"$X$", r"$M$", r"$\Gamma$")
k_vec, k_dist, k_node = m.k_path(path, 301)
evals = m.solve_all(k_vec)

fig, ax = plt.subplots()
for band in evals:
    ax.plot(k_dist, band)
ax.set(title="Checkerboard band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels(labels)
ax.set_xlim(k_node[0], k_node[-1])
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("checkerboard_band.png")
print("Done.")
