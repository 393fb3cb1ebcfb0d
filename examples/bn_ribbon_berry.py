#!/usr/bin/env python
"""Boron-nitride ribbon Berry phase, before and after re-choosing the
nonperiodic lattice vector to be perpendicular to the ribbon.

TPU-native port of the reference workload examples/bn_ribbon_berry.py.
With an M_x mirror the Berry phase should be 0 or pi -- but only once
change_nonperiodic_vector() makes the nonperiodic vector normal to the
extended direction.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
bn = tb_model(2, 2, lat, orb)
delta, t = 0.4, -1.0
bn.set_onsite([-delta, delta])
bn.set_hop(t, 0, 1, [0, 0])
bn.set_hop(t, 1, 0, [1, 0])
bn.set_hop(t, 1, 0, [0, 1])

ribbon = bn.cut_piece(3, 1, glue_edgs=False)
ribbon_perp = ribbon.change_nonperiodic_vector(1)

fig, axs = plt.subplots(1, 2, figsize=(7.0, 3.0))
for panel, (tag, model) in enumerate([("original", ribbon), ("modified", ribbon_perp)]):
    numk = 41
    k_vec, k_dist, k_node = model.k_path([[-0.5], [0.5]], numk, report=False)
    k_flat = k_vec[:, 0]
    evals = model.solve_all(k_vec)
    for band in evals:
        axs[panel].plot(k_flat, band, "k-", lw=0.5)
    axs[panel].set(title="Bands - " + tag, xlabel="Reduced wavevector",
                   ylabel="Band energy", xlim=(-0.5, 0.5))
    wf = wf_array(model, [numk])
    wf.solve_on_grid([0.0])
    n_occ = evals.shape[0] // 2
    phase = wf.berry_phase(list(range(n_occ)), dir=0)
    print("%s model: Berry phase at half filling = %10.7f" % (tag, phase))
fig.tight_layout()
fig.savefig("bn_ribbon_berry.png")
print("Done.")
