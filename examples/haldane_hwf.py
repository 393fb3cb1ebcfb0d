#!/usr/bin/env python
"""Haldane ribbon: edge states colored by position, and hybrid Wannier
center flow (finite-ribbon centers vs bulk Berry-phase centers).

TPU-native port of the reference workload examples/haldane_hwf.py;
compare Fig. 3 of Phys. Rev. Lett. 102, 107603 (2009).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array

delta, t, t2 = -0.2, -1.0, 0.05 - 0.15j
efermi = 0.25
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

len_0, len_1 = 100, 10

# bulk hybrid Wannier centers along direction 1
bulk = wf_array(m, [len_0, len_1])
bulk.solve_on_grid([0.0, 0.0])
phi_1 = bulk.berry_phase(occ=[0], dir=1, contin=True)

# ribbon finite along direction 1
ribbon = m.cut_piece(len_1, 1, glue_edgs=False)
k_vec, k_dist, k_node = ribbon.k_path([0.0, 0.5, 1.0], len_0, report=False)
k_flat = k_vec[:, 0]
rib_eval, rib_evec = ribbon.solve_all(k_vec, eig_vectors=True)
rib_eval = rib_eval - efermi

fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(4.0, 5.0))
for n in range(rib_eval.shape[0]):
    ax1.plot(k_dist, rib_eval[n, :], c="k", lw=0.3, zorder=-50)
for i in range(rib_evec.shape[1]):
    pos_exp = ribbon.position_expectation(rib_evec[:, i], dir=1)
    ax1.scatter(
        [k_flat[i]] * rib_eval.shape[0], rib_eval[:, i], c=pos_exp, s=7,
        cmap="coolwarm", edgecolors="none", vmin=0.0, vmax=float(len_1), zorder=-100,
    )
ax1.axhline(0.0, c="m", zorder=-200)
ax1.set(ylabel="Ribbon band energy", ylim=(-2.3, 2.3))

# bulk centers and their periodic images
for j in range(-1, len_1 + 1):
    ax2.plot(k_flat, float(j) + phi_1 / (2.0 * np.pi), "k-", zorder=-50)
# finite-ribbon hybrid Wannier centers of occupied states
for i in range(rib_evec.shape[1]):
    occ_evec = rib_evec[rib_eval[:, i] < 0.0, i]
    hwfc = ribbon.position_hwf(occ_evec, 1)
    ax2.scatter(
        [k_flat[i]] * hwfc.shape[0], hwfc, c=hwfc, s=7,
        cmap="coolwarm", edgecolors="none", vmin=0.0, vmax=float(len_1), zorder=-100,
    )
ax2.set(xlabel="k along direction 0", ylabel="HWF center along direction 1",
        ylim=(-0.5, len_1 + 0.5))
for ax in (ax1, ax2):
    ax.set_xlim(k_node[0], k_node[-1])
    ax.set_xticks(k_node)
    ax.set_xticklabels([r"$0$", r"$\pi$", r"$2\pi$"])
fig.tight_layout()
fig.savefig("haldane_hwf.png")
print("Done.")
