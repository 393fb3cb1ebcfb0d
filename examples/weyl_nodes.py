"""Automatic band-node search and topological charges.

``flows.find_nodes`` sweeps the whole BZ for band touchings (dense gap
scan + Hellmann-Feynman descent -- conical minima are non-smooth, so
the refiner uses a normalized gradient step with geometric decay), and
``flows.node_chirality`` measures each 3-D node's monopole charge by
closed-cube Berry flux, oriented so the charge equals the slice-Chern
jump across the node.

Workloads: graphene's two Dirac points located to ~1e-7 reduced
coordinates from an 18x18 scan; the zoo Weyl pair at (0, 0, +-1/4)
with charges -1 and +1; and a kz-resolved slice-Chern staircase
confirming the Gauss-law bookkeeping.  No reference counterpart (the
reference reads crossings off band plots by eye).
"""

import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models

# --- graphene: Dirac points from a coarse scan -------------------------
gr = models.graphene()
kpts, gaps = flows.find_nodes(gr, band=0, nk=18, gap_tol=1e-4)
print("graphene nodes (reduced):")
for k, g in zip(kpts, gaps):
    print("  k = (%.6f, %.6f)   gap = %.2e" % (k[0], k[1], g))

# --- Weyl semimetal: locate the pair, then charge each node ------------
wy = models.weyl()
kw, gw = flows.find_nodes(wy, band=0, nk=14, gap_tol=1e-4)
chis = [flows.node_chirality(wy, k, band=0) for k in kw]
print("\nWeyl nodes and charges:")
for k, chi in zip(kw, chis):
    print("  k = (%.4f, %.4f, %.4f)   chi = %+d" % (k[0], k[1], k[2], chi))
assert sorted(chis) == [-1, 1]

# --- Gauss's law: slice Chern number jumps by chi across each node -----
kzs = np.linspace(0.05, 0.95, 19)
cs = [flows.chern_number(wy.reduce_dim(2, kz), occ=[0], nk=(25, 25))
      for kz in kzs]

fig, ax = plt.subplots(figsize=(6, 4))
ax.step(kzs, np.round(cs).astype(int), where="mid", lw=2)
for k, chi in zip(kw, chis):
    ax.axvline(k[2], color="crimson", ls="--", lw=1)
    ax.annotate(r"$\chi = %+d$" % chi, (k[2], 0.15),
                ha="center", color="crimson")
ax.set_xlabel(r"$k_z$ (reduced)")
ax.set_ylabel(r"slice Chern $C(k_z)$")
ax.set_title("Weyl pair: slice-Chern staircase vs node charges")
fig.tight_layout()
fig.savefig("weyl_nodes.pdf")
print("\nslice Chern staircase:", np.round(cs).astype(int).tolist())
print("Done.")
