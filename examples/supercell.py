#!/usr/bin/env python
"""sqrt(5) x sqrt(5) graphene supercell and an arbitrary-surface slab.

TPU-native port of the reference workload examples/supercell.py.
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

sc = m.make_supercell([[2, 1], [-1, 2]], to_home=True)
slab = sc.cut_piece(6, 1, glue_edgs=False)

fig, ax = slab.visualize(0, 1)
ax.set(title="Graphene, arbitrary surface", xlabel="x", ylabel="y")
fig.tight_layout()
fig.savefig("supercell_vis.png")

k_vec, k_dist, k_node = slab.k_path("full", 100)
evals = slab.solve_all(k_vec)
fig, ax = plt.subplots()
for band in evals:
    ax.plot(k_dist, band, "k-")
ax.set_xlim(k_dist[0], k_dist[-1])
ax.set_ylim(-1.0, 1.0)
ax.set(title="Arbitrary-surface slab bands", xlabel="k parallel to edge", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels((r"$0$", r"$\pi$", r"$2\pi$"))
fig.tight_layout()
fig.savefig("supercell_band.png")
print("Done.")
