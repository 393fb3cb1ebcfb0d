#!/usr/bin/env python
"""Trestle ladder: 1-D periodicity embedded in 2-D space, complex hops.

TPU-native port of the reference workload examples/trestle.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import tb_model

m = tb_model(1, 2, lat=[[2.0, 0.0], [0.0, 1.0]], orb=[[0.0, 0.0], [0.5, 1.0]], per=[0])
t1, t2 = 0.8 + 0.6j, 2.0
m.set_hop(t2, 0, 0, [1, 0])
m.set_hop(t2, 1, 1, [1, 0])
m.set_hop(t1, 0, 1, [0, 0])
m.set_hop(t1, 1, 0, [1, 0])
m.display()

k_vec, k_dist, k_node = m.k_path("fullc", 100)
evals = m.solve_all(k_vec)

fig, ax = plt.subplots()
for band in evals:
    ax.plot(k_dist, band)
ax.set(title="Trestle band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels([r"$-\pi$", r"$0$", r"$\pi$"])
ax.set_xlim(k_node[0], k_node[-1])
ax.axvline(x=k_node[1], linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("trestle_band.png")
print("Done.")
