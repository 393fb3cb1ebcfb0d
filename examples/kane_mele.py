#!/usr/bin/env python
"""Kane-Mele model: band structures and Z2 invariant from Wannier flow.

TPU-native port of the reference workload examples/kane_mele.py.  The
Wilson-loop eigenvalue flow (berry_evals) distinguishes the trivial
("even") and topological ("odd") phases.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array


def kane_mele(topological):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = tb_model(2, 2, lat, orb, nspin=2)
    esite = 2.5 if topological == "even" else 1.0
    thop, rashba = 1.0, 0.25
    spin_orb = 0.3
    sx = np.array([0.0, 1.0, 0.0, 0.0])
    sy = np.array([0.0, 0.0, 1.0, 0.0])
    sz = np.array([0.0, 0.0, 0.0, 1.0])
    m.set_onsite([esite, -esite])
    for lv in ([0, 0], [0, -1], [-1, 0]):
        m.set_hop(thop, 0, 1, lv)
    m.set_hop(-1.0j * spin_orb * sz, 0, 0, [0, 1])
    m.set_hop(1.0j * spin_orb * sz, 0, 0, [1, 0])
    m.set_hop(-1.0j * spin_orb * sz, 0, 0, [1, -1])
    m.set_hop(1.0j * spin_orb * sz, 1, 1, [0, 1])
    m.set_hop(-1.0j * spin_orb * sz, 1, 1, [1, 0])
    m.set_hop(1.0j * spin_orb * sz, 1, 1, [1, -1])
    r3h = np.sqrt(3.0) / 2.0
    m.set_hop(1.0j * rashba * (0.5 * sx - r3h * sy), 0, 1, [0, 0], mode="add")
    m.set_hop(1.0j * rashba * (-1.0 * sx), 0, 1, [0, -1], mode="add")
    m.set_hop(1.0j * rashba * (0.5 * sx + r3h * sy), 0, 1, [-1, 0], mode="add")
    return m


for topo in ["even", "odd"]:
    m = kane_mele(topo)
    path = [[0.0, 0.0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [1.0 / 3.0, 2.0 / 3.0], [0.0, 0.0]]
    labels = (r"$\Gamma$", r"$K$", r"$M$", r"$K^\prime$", r"$\Gamma$")
    k_vec, k_dist, k_node = m.k_path(path, 101, report=False)
    evals = m.solve_all(k_vec)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(7.0, 3.0))
    for band in evals:
        ax1.plot(k_dist, band)
    ax1.set(title="Kane-Mele: %s phase" % topo, xlabel="k-space", ylabel="Energy")
    ax1.set_xticks(k_node)
    ax1.set_xticklabels(labels)
    ax1.set_xlim(k_node[0], k_node[-1])
    for x in k_node:
        ax1.axvline(x=x, linewidth=0.5, color="k")

    # Wannier flow: Wilson-loop eigenphases vs k_y, Soluyanov-Vanderbilt style
    wf = wf_array(m, [41, 41])
    wf.solve_on_grid([-0.5, -0.5])
    wan_cent = wf.berry_phase([0, 1], dir=1, contin=False, berry_evals=True) / (2.0 * np.pi)
    nky = wan_cent.shape[0]
    ky = np.linspace(0.0, 1.0, nky)
    for shift in (-1.0, 0.0, 1.0):
        ax2.plot(ky, wan_cent[:, 0] + shift, "k.")
        ax2.plot(ky, wan_cent[:, 1] + shift, "k.")
    ax2.set(title="Wannier flow (%s)" % topo, xlabel=r"$k_y$",
            ylabel="Wannier center along x", ylim=(-1.0, 1.0), xlim=(0.0, 1.0))
    fig.tight_layout()
    fig.savefig("kane_mele_%s.png" % topo)
    print("%s phase done" % topo)
print("Done.")
