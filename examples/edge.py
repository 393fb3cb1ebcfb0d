#!/usr/bin/env python
"""Edge state of a finite Haldane sample, drawn with visualize().

TPU-native port of the reference workload examples/edge.py.
"""
import matplotlib

matplotlib.use("Agg")
import numpy as np

from pythtb_tpu import tb_model

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
m = tb_model(2, 2, lat, orb)
delta, t, t2 = 0.0, -1.0, 0.15 * np.exp(1.0j * np.pi / 2.0)
m.set_onsite([-delta, delta])
m.set_hop(t, 0, 1, [0, 0])
m.set_hop(t, 1, 0, [1, 0])
m.set_hop(t, 1, 0, [0, 1])
for lv in ([1, 0], [-1, 1], [0, -1]):
    m.set_hop(t2, 0, 0, lv)
for lv in ([1, 0], [-1, 1], [0, -1]):
    m.set_hop(t2.conjugate(), 1, 1, lv)

# fully open sample, and one periodic along direction 0
fin_open = m.cut_piece(10, 0, glue_edgs=False).cut_piece(10, 1, glue_edgs=False)
fin_half = m.cut_piece(10, 0, glue_edgs=True).cut_piece(10, 1, glue_edgs=False)

for tag, fin in [("open", fin_open), ("half", fin_half)]:
    evals, evecs = fin.solve_all(eig_vectors=True)
    ed = fin.get_num_orbitals() // 2  # mid-gap state
    print("%s sample: mid-gap state energy %.5f" % (tag, evals[ed]))
    fig, ax = fin.visualize(0, 1, eig_dr=evecs[ed, :], draw_hoppings=False)
    ax.set(title="Edge state (%s boundaries)" % tag, xlabel="x", ylabel="y")
    fig.tight_layout()
    fig.savefig("edge_state_%s.png" % tag)
print("Done.")
