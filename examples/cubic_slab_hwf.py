#!/usr/bin/env python
"""Hybrid Wannier functions of a CsCl-structure slab: layer-resolved
centers and their Berry phases (surface polarizations).

TPU-native port of the reference workload examples/cubic_slab_hwf.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array


def set_model(delta, ta, tb):
    lat = np.eye(3).tolist()
    orb = [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]
    m = tb_model(3, 3, lat, orb)
    m.set_onsite([-delta, delta])
    for lvec in ([-1, 0, 0], [0, 0, -1], [-1, -1, 0], [0, -1, -1]):
        m.set_hop(ta, 0, 1, lvec)
    for lvec in ([0, 0, 0], [0, -1, 0], [-1, -1, -1], [-1, 0, -1]):
        m.set_hop(tb, 0, 1, lvec)
    return m


bulk = set_model(delta=1.0, ta=0.4, tb=0.7)
nl = 9
slab = bulk.cut_piece(nl, 2, glue_edgs=False).remove_orb(2 * nl - 1)
print("Constructed %d-layer slab model" % nl)

# verify insulating gap on a coarse mesh (one batched solve)
evals = slab.solve_all(slab.k_uniform_mesh([10, 10]))
print("VB max %.3f < CB min %.3f" % (evals[:nl].max(), evals[nl + 1 :].min()))

nk = 9
bloch = wf_array(slab, [nk, nk])
bloch.solve_on_grid([0.0, 0.0])
# hybrid Wannier functions for the whole grid in ONE batched device call
# (the per-point equivalent is bloch.position_hwf([ix, iy], ...) per point)
hwfc, hwf_grid = bloch.position_hwf_all(
    occ=list(range(nl)), dir=2, hwf_evec=True, basis="orbital"
)
hwf_arr = bloch.empty_like(nsta_arr=nl)
hwf_arr._wfs = hwf_grid.astype(complex)
hwf_arr.impose_pbc(0, 0)
hwf_arr.impose_pbc(1, 1)

print("HWF center means by layer:", np.round(np.mean(hwfc, axis=(0, 1)), 4))

px = np.stack([hwf_arr.berry_phase(dir=0, occ=[n]) / (2.0 * np.pi) for n in range(nl)])
px_mean = np.mean(px[:, :-1], axis=1)
print("Layer polarizations along x:", np.round(px_mean, 4))
nlh = nl // 2
print("Surface sums: top %.4f, bottom %.4f" % (px_mean[:nlh].sum(), px_mean[-nlh:].sum()))

fig = plt.figure()
plt.bar(range(nl), px_mean)
plt.axhline(0.0, lw=0.8, color="k")
plt.xlabel("Layer index of hybrid Wannier band")
plt.ylabel(r"Contribution to $P_x$")
fig.tight_layout()
fig.savefig("cubic_slab_hwf.png")
print("Done.")
