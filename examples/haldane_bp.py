#!/usr/bin/env python
"""Berry phases and Chern number of the Haldane model.

TPU-native port of the reference workload examples/haldane_bp.py:
fills a wf_array two ways (solve_on_grid, and manual fill + impose_pbc)
and computes Berry phases / fluxes for each.
"""
import numpy as np

from pythtb_tpu import tb_model, wf_array


def haldane_model(delta=0.2, t=-1.0, t2=0.15 * np.exp(1.0j * np.pi / 2.0)):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = tb_model(2, 2, lat, orb)
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
nk = 31

# method 1: automatic grid solve (batched on device) + automatic pbc
wf = wf_array(m, [nk, nk])
wf.solve_on_grid([-0.5, -0.5])

# method 2: manual fill from one batched solve_all, then impose_pbc
wf2 = wf_array(m, [nk, nk])
kx = -0.5 + np.arange(nk - 1) / float(nk - 1)
ky = -0.5 + np.arange(nk - 1) / float(nk - 1)
for i, x in enumerate(kx):
    for j, y in enumerate(ky):
        _, evec = m.solve_one([x, y], eig_vectors=True)
        wf2[i, j] = evec
wf2.impose_pbc(0, 0)
wf2.impose_pbc(1, 1)

for name, w in [("auto", wf), ("manual", wf2)]:
    print("[%s] Berry phases along k_x for lower band:" % name)
    print("   ", np.round(w.berry_phase([0], 0, contin=True)[:5], 6), "...")
    print("[%s] Chern number of lower band: %.6f" % (name, w.berry_flux([0]) / (2.0 * np.pi)))
    print("[%s] Chern number of both bands: %.6f" % (name, w.berry_flux([0, 1]) / (2.0 * np.pi)))
print("Done.")
