#!/usr/bin/env python
"""Substitutional alloys in the coherent-potential approximation.

``disorder.cpa`` solves the single-site CPA fixed point for every
frequency in one device program.  Three panels on the square lattice:

1. Lloyd-model oracle: for Cauchy (Lorentzian) on-site disorder the
   exact disorder-averaged Green's function is the clean one evaluated
   at ``w + i gamma`` (Sigma = -i gamma exactly); CPA reproduces it to
   machine precision, so the CPA DOS lies on top of the broadened
   clean DOS.
2. Binary alloy A_x B_{1-x}: the DOS evolves from a virtual-crystal
   band at weak splitting to split impurity bands at strong splitting
   (the classic CPA split-band regime).
3. Concentration sweep at fixed splitting: spectral weight transfers
   between the A and B subbands with x, with the total weight pinned
   at one state per orbital.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import disorder

sq = ptt.models.square(t=-1.0)
om = np.linspace(-6.0, 6.0, 241)
fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- Lloyd model: CPA == exact broadened clean DOS --------------------
gamma = 0.5
r = disorder.cpa(sq, om, 64, ("lorentzian", gamma), eta=1e-6)
clean = disorder.cpa(sq, om, 64, ("binary", [1.0], [0.0]), eta=gamma)
axs[0].plot(om, clean["dos"], "k-", lw=2.5, alpha=0.4,
            label="clean DOS at $\\omega + i\\gamma$")
axs[0].plot(om, r["dos"], "C1--", lw=1.2, label="CPA (Lorentzian)")
axs[0].set_title("Lloyd model: CPA is exact")
axs[0].set_xlabel("$\\omega$")
axs[0].set_ylabel("DOS")
axs[0].legend(fontsize=8)
print("Lloyd |Sigma + i gamma| max: %.2e"
      % np.abs(r["sigma"] + 1j * gamma).max())

# ---- binary alloy: virtual crystal -> split band -----------------------
for delta, color in ((0.5, "C0"), (1.5, "C2"), (3.0, "C3")):
    rb = disorder.cpa(sq, om, 64, ("binary", [0.5, 0.5], [delta, -delta]),
                      eta=0.08, max_iters=500)
    axs[1].plot(om, rb["dos"], color=color, lw=1.3,
                label="$\\pm\\delta=%.1f$" % delta)
axs[1].set_title("binary alloy $x=1/2$: band splitting")
axs[1].set_xlabel("$\\omega$")
axs[1].legend(fontsize=8)

# ---- concentration sweep ----------------------------------------------
delta = 2.5
for x, color in ((0.1, "C0"), (0.3, "C1"), (0.5, "C2"), (0.7, "C3"),
                 (0.9, "C4")):
    rc = disorder.cpa(sq, om, 64, ("binary", [x, 1 - x], [delta, -delta]),
                      eta=0.08, max_iters=500)
    w = np.trapezoid(rc["dos"], om)
    axs[2].plot(om, rc["dos"], color=color, lw=1.1,
                label="$x=%.1f$ (w=%.2f)" % (x, w))
axs[2].set_title("weight transfer with concentration")
axs[2].set_xlabel("$\\omega$")
axs[2].legend(fontsize=7)

fig.tight_layout()
fig.savefig("cpa_alloy.pdf")
print("Done.\n")
