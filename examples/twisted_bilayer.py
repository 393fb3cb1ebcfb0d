#!/usr/bin/env python
"""Twisted bilayer graphene: moire bands and velocity renormalization.

``models.tbg(m)`` generates the commensurate twisted bilayer as an
ordinary tb_model (dim_k=2, dim_r=3) with distance-scaled Slater-Koster
hops, so the whole package applies unchanged.  This example shows the
two fingerprints of the moire flat-band story:

1. moire minibands along Gamma -> K_m -> M -> Gamma narrowing as the
   twist angle shrinks (the monolayer valley K = (2/3, 1/3) folds onto
   the moire point K_m = (1/3, 2/3) -- where the Dirac cones live);
2. the Dirac velocity collapsing with angle (Lopes dos Santos et al.,
   PRL 99, 256802 (2007)) -- the precursor of the magic angle at
   1.08 deg (m = 30: 11,164 orbitals, buildable with the same call).
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu.models import moire

E_REF = None

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.8))

# ---- moire minibands at two twist angles -----------------------------
g = moire.sk_graphene()
E_D = float(g.solve_all(np.array([[2.0 / 3.0, 1.0 / 3.0]]))[:, 0].mean())
nodes = [[0.0, 0.0], [1.0 / 3.0, 2.0 / 3.0], [0.5, 0.5], [0.0, 0.0]]
for ax, m in zip(axs[:2], (2, 4)):
    t = moire.tbg(m)
    kpts, dist, node = t.k_path(nodes, 41, report=False)
    ev = t.solve_all(kpts) - E_D
    for band in ev:
        ax.plot(dist, band, "k-", lw=0.6)
    ax.set_ylim(-1.6, 1.6)
    ax.set_xticks(node)
    ax.set_xticklabels([r"$\Gamma$", r"$K_m$", r"$M$", r"$\Gamma$"])
    ax.set_ylabel(r"$E - E_D$  [eV]")
    ax.set_title(r"$\theta = %.2f^\circ$ (%d orbitals)"
                 % (moire.tbg_angle(m), t._norb))

# ---- velocity renormalization vs angle -------------------------------
def vel(model, Kfrac):
    lat2d = np.asarray(model._lat)[:2, :2]
    df = lat2d @ np.array([2e-3, 0.0]) / (2.0 * np.pi)

    def upper(kf):
        e = np.sort(model.solve_all(np.array([kf]))[:, 0])
        return e[np.argsort(np.abs(e - E_D))[:2]].max()

    return (upper(np.asarray(Kfrac) + 2 * df)
            - upper(np.asarray(Kfrac) + df)) / 2e-3

v0 = vel(g, [2.0 / 3.0, 1.0 / 3.0])
ms = [1, 2, 3, 4, 6, 8]
angles = [moire.tbg_angle(m) for m in ms]
ratios = [vel(moire.tbg(m), [1.0 / 3.0, 2.0 / 3.0]) / v0 for m in ms]
print("twist angle -> v/v0:")
for a, r in zip(angles, ratios):
    print("  %6.2f deg : %.3f" % (a, r))

axs[2].plot(angles, ratios, "ko-", ms=4)
axs[2].set_xlabel(r"twist angle  [deg]")
axs[2].set_ylabel(r"$v / v_0$")
axs[2].set_title("Dirac velocity renormalization")
axs[2].set_xlim(0, 23)
axs[2].set_ylim(0, 1.05)
fig.tight_layout()
fig.savefig("twisted_bilayer.png", dpi=150)
print("saved twisted_bilayer.png")

print("Done.")
