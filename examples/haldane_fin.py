#!/usr/bin/env python
"""Finite Haldane samples: open vs glued edges, density of states.

TPU-native port of the reference workload examples/haldane_fin.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
m = tb_model(2, 2, lat, orb)
delta, t, t2 = 0.2, -1.0, 0.15 * np.exp(1.0j * np.pi / 2.0)
m.set_onsite([-delta, delta])
m.set_hop(t, 0, 1, [0, 0])
m.set_hop(t, 1, 0, [1, 0])
m.set_hop(t, 1, 0, [0, 1])
for lv in ([1, 0], [-1, 1], [0, -1]):
    m.set_hop(t2, 0, 0, lv)
for lv in ([1, 0], [-1, 1], [0, -1]):
    m.set_hop(t2.conjugate(), 1, 1, lv)

nsize = 20
fig, axs = plt.subplots(1, 2, figsize=(8, 3.5))
for panel, glue in enumerate([False, True]):
    fin = m.cut_piece(nsize, 0, glue_edgs=glue).cut_piece(nsize, 1, glue_edgs=glue)
    evals = fin.solve_all()
    print("glue_edgs=%s: %d states, E in [%.4f, %.4f]" % (glue, evals.size, evals.min(), evals.max()))
    axs[panel].hist(evals, 50, range=(-4.0, 4.0))
    axs[panel].set(title="Glued edges" if glue else "Open edges", xlabel="Energy", ylabel="States")
fig.tight_layout()
fig.savefig("haldane_fin_dos.png")
print("Done.")
