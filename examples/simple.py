#!/usr/bin/env python
"""1-D monatomic chain: the smallest possible band structure.

TPU-native port of the reference workload examples/simple.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import tb_model

chain = tb_model(1, 1, lat=[[1.0]], orb=[[0.0]])
chain.set_hop(-1.0, 0, 0, [1])

k_vec, k_dist, k_node = chain.k_path("full", 100)
evals = chain.solve_all(k_vec)

fig, ax = plt.subplots()
ax.plot(k_dist, evals[0])
ax.set(title="1D chain band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels([r"$0$", r"$\pi$", r"$2\pi$"])
ax.set_xlim(k_node[0], k_node[-1])
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("simple_band.png")
print("Done.")
