#!/usr/bin/env python
"""End states of a finite three-site pump chain across the cycle,
with bulk Chern numbers annotated.

TPU-native port of the reference workload examples/3site_cycle_fin.py.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array


def set_model(t, delta, lmbd):
    m = tb_model(1, 1, [[1.0]], [[0.0], [1.0 / 3.0], [2.0 / 3.0]])
    m.set_hop(t, 0, 1, [0])
    m.set_hop(t, 1, 2, [0])
    m.set_hop(t, 2, 0, [1])
    m.set_onsite(
        [delta * (-1.0) * np.cos(2.0 * np.pi * (lmbd - i / 3.0)) for i in range(3)]
    )
    return m


t, delta = -1.3, 2.0

# bulk Chern numbers over the (lambda, k) torus
path_steps, num_kpt = 21, 31
m0 = set_model(t, delta, 0.0)
k_vec = m0.k_path([[-0.5], [0.5]], num_kpt, report=False)[0]
wf = wf_array(m0, [path_steps, num_kpt])
for il, lmbd in enumerate(np.linspace(0.0, 1.0, path_steps)):
    m = set_model(t, delta, lmbd)
    _, evecs = m.solve_all(k_vec, eig_vectors=True)
    for ik in range(num_kpt):
        wf[il, ik] = evecs[:, ik]
wf.impose_pbc(1, 0)
print("Chern numbers: band 0 = %.2f, bands 0,1 = %.2f, all = %.2f"
      % tuple(wf.berry_flux(o) / (2.0 * np.pi) for o in ([0], [0, 1], [0, 1, 2])))

# finite chain across the cycle: eigenvalues + position expectations
path_steps = 241
all_lambda = np.linspace(0.0, 1.0, path_steps)
num_cells = 10
num_orb = 3 * num_cells
ch_eval = np.zeros([num_orb, path_steps])
ch_xexp = np.zeros([num_orb, path_steps])
for il, lmbd in enumerate(all_lambda):
    ch = set_model(t, delta, lmbd).cut_piece(num_cells, 0)
    evals, evecs = ch.solve_all(eig_vectors=True)
    ch_eval[:, il] = evals
    ch_xexp[:, il] = ch.position_expectation(evecs, 0)

fig, ax = plt.subplots()
for n in range(num_orb):
    size = np.clip((ch_xexp[n, :] - 2.0) / 2.0, 0.1, 1.0)  # shrink left-end states
    ax.scatter(all_lambda, ch_eval[n, :], edgecolors="none", s=size * 6.0, c="k")
ax.set(title="Eigenenergies of finite 3-site chain", xlabel=r"$\lambda$",
       ylabel="Energy", xlim=(0.0, 1.0))
fig.tight_layout()
fig.savefig("3site_endstates.png")
print("Done.")
