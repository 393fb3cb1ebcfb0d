#!/usr/bin/env python
"""Haldane Chern-insulator model: band structure and density of states.

TPU-native port of the reference workload examples/haldane.py.  The DOS
mesh solve runs as one batched device call.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model


def haldane_model(delta=0.2, t=-1.0, t2mag=0.15, phi=np.pi / 2.0):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = tb_model(2, 2, lat, orb)
    t2 = t2mag * np.exp(1.0j * phi)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2, 0, 0, lv)
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2.conjugate(), 1, 1, lv)
    return m


m = haldane_model()
m.display()

# band structure along Gamma-K-M-K'-Gamma
path = [[0.0, 0.0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [1.0 / 3.0, 2.0 / 3.0], [0.0, 0.0]]
labels = (r"$\Gamma$", r"$K$", r"$M$", r"$K^\prime$", r"$\Gamma$")
k_vec, k_dist, k_node = m.k_path(path, 101)
evals = m.solve_all(k_vec)

fig, ax = plt.subplots()
ax.plot(k_dist, evals[0])
ax.plot(k_dist, evals[1])
ax.set(title="Haldane model band structure", xlabel="Path in k-space", ylabel="Band energy")
ax.set_xticks(k_node)
ax.set_xticklabels(labels)
ax.set_xlim(k_node[0], k_node[-1])
for x in k_node:
    ax.axvline(x=x, linewidth=0.5, color="k")
fig.tight_layout()
fig.savefig("haldane_band.png")

# density of states from a uniform mesh (one batched solve)
evals_mesh = m.solve_all(m.k_uniform_mesh([20, 20])).flatten()
fig, ax = plt.subplots()
ax.hist(evals_mesh, 50, range=(-4.0, 4.0))
ax.set_ylim(0.0, 80.0)
ax.set(title="Haldane model density of states", xlabel="Band energy", ylabel="Number of states")
fig.tight_layout()
fig.savefig("haldane_dos.png")
print("Done.")
