#!/usr/bin/env python
"""Geometry visualization: bulk, ribbon, and finite graphene.

TPU-native port of the reference workload examples/visualize.py.
"""
import matplotlib

matplotlib.use("Agg")
import numpy as np

from pythtb_tpu import tb_model

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
m = tb_model(2, 2, lat, orb)
m.set_onsite([0.0, 0.0])
t = -1.0
m.set_hop(t, 0, 1, [0, 0])
m.set_hop(t, 1, 0, [1, 0])
m.set_hop(t, 1, 0, [0, 1])

for tag, model in [
    ("bulk", m),
    ("ribbon", m.cut_piece(8, 0, glue_edgs=False)),
    ("finite", m.cut_piece(8, 0, glue_edgs=False).cut_piece(8, 1, glue_edgs=False)),
]:
    fig, ax = model.visualize(0, 1)
    ax.set(title="Graphene, " + tag, xlabel="x", ylabel="y")
    fig.tight_layout()
    fig.savefig("visualize_%s.png" % tag)
print("Done.")
