#!/usr/bin/env python
"""Graphene band structure along Gamma-K-M-Gamma.

TPU-native port of the reference workload examples/graphene.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
m = tb_model(2, 2, lat, orb)
delta, t = 0.0, -1.0
m.set_onsite([-delta, delta])
m.set_hop(t, 0, 1, [0, 0])
m.set_hop(t, 1, 0, [1, 0])
m.set_hop(t, 1, 0, [0, 1])
m.display()

path = [[0.0, 0.0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [0.0, 0.0]]
labels = (r"$\Gamma$", r"$K$", r"$M$", r"$\Gamma$")
k_vec, k_dist, k_node = m.k_path(path, 121)
evals = m.solve_all(k_vec)

fig, ax = plt.subplots()
ax.plot(k_dist, evals[0])
ax.plot(k_dist, evals[1])
ax.set(title="Graphene band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels(labels)
ax.set_xlim(k_node[0], k_node[-1])
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("graphene.png")
print("Done.")
