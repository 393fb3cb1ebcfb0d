#!/usr/bin/env python
"""Three-site chain charge pump: Berry phase vs pumping parameter and
the Chern number in (k, lambda) space.

TPU-native port of the reference workload examples/3site_cycle.py.
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
    ons = [delta * (-1.0) * np.cos(2.0 * np.pi * (lmbd - i / 3.0)) for i in range(3)]
    m.set_onsite(ons)
    return m


t, delta = -1.3, 2.0
path_steps, num_kpt = 21, 31
all_lambda = np.linspace(0.0, 1.0, path_steps)
m0 = set_model(t, delta, 0.0)
k_vec, k_dist, k_node = m0.k_path([[-0.5], [0.5]], num_kpt, report=False)

wf = wf_array(m0, [num_kpt, path_steps])
fig_band, ax_band = plt.subplots()
for il, lmbd in enumerate(all_lambda):
    m = set_model(t, delta, lmbd)
    evals, evecs = m.solve_all(k_vec, eig_vectors=True)
    for ik in range(num_kpt):
        wf[ik, il] = evecs[:, ik]
    for band in evals:
        ax_band.plot(k_dist, band, "k-", lw=0.5)
wf.impose_pbc(0, 0)

phase = wf.berry_phase([0], 0)
print("Berry flux in (k, lambda) space:", wf.berry_flux([0]))

fig_wann, ax_wann = plt.subplots()
ax_wann.plot(all_lambda, phase / (2.0 * np.pi), "ko-")
ax_wann.set(title="Center of Wannier function", xlabel=r"$\lambda$",
            ylabel="Center (reduced coordinate)", xlim=(0.0, 1.0))
fig_wann.tight_layout()
fig_wann.savefig("3site_wann.png")

ax_band.set(title="Band structures along the pump cycle", xlabel="k", ylabel="Energy")
fig_band.tight_layout()
fig_band.savefig("3site_band.png")
print("Done.")
