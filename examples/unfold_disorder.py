#!/usr/bin/env python
"""Band unfolding: reading a disordered supercell in the primitive BZ.

A 5x5 graphene supercell with Anderson onsite disorder folds its 50
bands into an unreadable tangle; unfolding (pythtb_tpu.unfold) assigns
every supercell eigenstate its spectral weight at primitive k -- the
effective band structure with disorder-induced broadening, the quantity
ARPES measures on dirty samples.  The reference framework has no
unfolding.

Convention-I twist (module docstring of pythtb_tpu/unfold.py): solving
the supercell at the UNREDUCED K = k M^T makes the projection a plain
per-orbital sum over cells -- no phase bookkeeping at all.

Panels: pristine supercell (weights exactly 0/1 -> the primitive bands
re-emerge), then W = 0.5 and W = 1.5 disorder (increasingly lifetime-
broadened bands; the Dirac crossing survives weak disorder).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import models, unfold

m = models.graphene()
M = np.diag([5, 5])
nodes = [[0.0, 0.0], [1.0 / 3.0, 2.0 / 3.0], [0.5, 0.5], [0.0, 0.0]]
(k_vec, k_dist, k_node) = m.k_path(nodes, 121, report=False)

rng = np.random.default_rng(7)
fig, axs = plt.subplots(1, 3, figsize=(12.0, 3.6), sharey=True)
for ax, W in zip(axs, (0.0, 0.5, 1.5)):
    sc = m.make_supercell(M)
    if W > 0:
        sc.set_onsite(W * (rng.random(sc._norb) - 0.5), mode="add")
    evals, wgt = unfold.unfold_bands(sc, M, k_vec)
    sel = wgt > 1e-3
    xs = np.repeat(k_dist[:, None], evals.shape[1], axis=1)
    sc_pts = ax.scatter(xs[sel], evals[sel], c=wgt[sel], s=4.0,
                        cmap="inferno_r", vmin=0.0, vmax=1.0)
    ax.set_title("W = %.1f" % W)
    ax.set_xticks(k_node)
    ax.set_xticklabels([r"$\Gamma$", "K", "M", r"$\Gamma$"])
axs[0].set_ylabel("E")
fig.colorbar(sc_pts, ax=axs[-1], label="unfolded weight")
fig.tight_layout()
fig.savefig("unfold_disorder.png", dpi=150)
print("saved unfold_disorder.png")

# pristine sanity: the unfolded weights are exactly 0 or 1
sc0 = m.make_supercell(M)
evals0, w0 = unfold.unfold_bands(sc0, M, k_vec[:5])
print("pristine: max |w - round(w)| = %.2e, sum rule %.6f (expect 2)"
      % (np.abs(w0 - np.round(w0)).max(), w0.sum(axis=1).mean()))
print("Done.")
