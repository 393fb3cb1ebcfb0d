#!/usr/bin/env python
"""Structural parameter sweeps in ONE device program (pythtb_tpu.family).

Beyond-reference capability: the reference can only scan ribbon widths
or supercell sizes by rebuilding the model and re-running the whole
pipeline per point (reference pythtb.py:1105 / :1440 in user loops).
Here a padded model family runs every member through one compiled
program:

1. Haldane ribbons of width 2..16 -- all band structures in one call;
2. a Haldane supercell series (norb 2/4/6, different hopping graphs,
   different occupied-band counts) -- the Chern number of each member's
   occupied manifold in one call (all -1: folding preserves topology).
"""
import time

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import models
from pythtb_tpu.family import family

hal = models.haldane()

# -- 1. ribbon width sweep -------------------------------------------------
widths = list(range(2, 17))
ribbons = [hal.cut_piece(w, 1, glue_edgs=False) for w in widths]
fam = family(ribbons)
nk = 81
ks = np.linspace(0.0, 1.0, nk)[:, None]

t0 = time.perf_counter()
ev = fam.energies(ks)  # (P, nk, nsta_max): ONE compiled program
print("%d ribbon band structures in %.3f s (one device program)"
      % (len(widths), time.perf_counter() - t0))

fig, ax = plt.subplots(figsize=(7, 5))
for p, w in enumerate(widths):
    nsta = 2 * w
    gap = ev[p][:, nsta // 2].min() - ev[p][:, nsta // 2 - 1].max()
    ax.plot(w, gap, "ko")
ax.set_xlabel("ribbon width (cells)")
ax.set_ylabel("direct gap between bulk-band manifolds")
ax.set_title("Haldane ribbon: edge states close the gap as width grows")
fig.tight_layout()
fig.savefig("family_ribbon_gaps.pdf")
print("saved family_ribbon_gaps.pdf")

# -- 2. supercell Chern series ----------------------------------------------
m2 = hal.make_supercell([[2, 0], [0, 1]], to_home=False)
m3 = hal.make_supercell([[2, 1], [-1, 1]], to_home=False)
fam2 = family([hal, m2, m3])
t0 = time.perf_counter()
cherns = fam2.chern(nocc=[1, 2, 3], nk=(41, 41))
print("supercell Chern series (norb 2/4/6): %s  in %.3f s"
      % (np.round(cherns, 6).tolist(), time.perf_counter() - t0))
assert np.allclose(cherns, -1.0, atol=1e-4)
print("Done.")
