#!/usr/bin/env python
"""The invariants toolbox: three ways beyond plain Chern numbers.

1. ``flows.thermal_hall``: the quantized thermal Hall plateau
   kappa_xy = (pi^2/3) C k_B^2 T/h of the Haldane model, swept across
   chemical potential in one device program (Wiedemann-Franz in a
   topological gap).
2. ``flows.sector_chern``: a layer-graded Haldane bilayer with total
   Chern 0 but opposite layer Cherns +-1 -- invisible to sigma_xy,
   detected by the Prodan projected-operator construction, and robust
   when interlayer coupling breaks the grading.
3. ``flows.parity_z2``: Fu-Kane parity products at the TRIMs -- the
   BHZ phase diagram in 2^d diagonalizations per point instead of
   Wilson flows, with the inversion operator derived from geometry and
   verified numerically.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import flows

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))

# ---- thermal Hall staircase ------------------------------------------
m = ptt.models.haldane()
mus = np.linspace(-3.5, 3.5, 141)
kap = flows.thermal_hall(m, mus, 0.08, nk=(101, 101))
axs[0].plot(mus, kap / (np.pi**2 / 3.0), "k-")
axs[0].axhline(-1.0, color="0.85", lw=0.8, zorder=0)
axs[0].set_xlabel(r"$\mu$")
axs[0].set_ylabel(r"$\kappa_{xy} / (\pi^2 k_B^2 T / 3 h)$")
axs[0].set_title("thermal Hall plateau (Haldane)")
print("in-gap kappa_xy / (pi^2/3 kB^2 T/h) = %.4f (Chern -1)"
      % (kap[np.argmin(np.abs(mus))] / (np.pi**2 / 3.0)))

# ---- layer sector Chern ----------------------------------------------
lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1 / 3, 1 / 3], [2 / 3, 2 / 3]] * 2
tps = np.linspace(0.0, 0.8, 17)
cs = []
for tp in tps:
    b = ptt.tb_model(2, 2, lat, orb)
    b.set_onsite([-0.2, 0.2, -0.2, 0.2])
    for off, sgn in ((0, 1.0), (2, -1.0)):
        t2 = 0.15 * np.exp(1.0j * np.pi / 2.0 * sgn)
        b.set_hop(-1.0, 0 + off, 1 + off, [0, 0])
        b.set_hop(-1.0, 1 + off, 0 + off, [1, 0])
        b.set_hop(-1.0, 1 + off, 0 + off, [0, 1])
        for lv in ([1, 0], [-1, 1], [0, -1]):
            b.set_hop(t2, 0 + off, 0 + off, lv)
            b.set_hop(np.conj(t2), 1 + off, 1 + off, lv)
    if tp > 0:
        b.set_hop(tp, 0, 2, [0, 0])
        b.set_hop(tp, 1, 3, [0, 0])
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = flows.sector_chern(b, (0, 1), np.array([1.0, 1.0, -1.0, -1.0]),
                               nk=(25, 25))
    cs.append((r["sector_chern"], r["gap"]))
cs = np.array(cs)
ax2 = axs[1]
ax2.plot(tps, np.abs(cs[:, 0]), "ko-", ms=3, label=r"$|C_s|$")
ax2.plot(tps, cs[:, 1], "o-", color="0.6", ms=3, label="P O P gap")
ax2.set_xlabel(r"interlayer $t_\perp$")
ax2.set_title("layer sector Chern (total C = 0)")
ax2.legend(frameon=False, fontsize=8)
print("sector Chern stays +-1 while the projected gap is open "
      "(last gap %.2f)" % cs[-1, 1])

# ---- BHZ parity phase diagram ----------------------------------------
from pythtb_tpu import PythtbError

ms_ = np.linspace(-9.3, 1.3, 23)
nus = []
for mval in ms_:
    try:
        nus.append(flows.parity_z2(ptt.models.bhz(m=mval), (0, 1),
                                   parity=[1, -1])["nu0"])
    except PythtbError:  # gap closes at a TRIM exactly at M = -8, 0
        nus.append(np.nan)
axs[2].step(ms_, nus, "k-", where="mid")
axs[2].set_xlabel("BHZ mass M")
axs[2].set_ylabel(r"$\nu_0$")
axs[2].set_title("Fu-Kane parity Z2 (BHZ)")
axs[2].set_ylim(-0.1, 1.2)
print("BHZ nu(M): nontrivial window -8 < M < 0 ->",
      [n for n in nus[::4]])

fig.tight_layout()
fig.savefig("invariants_toolbox.png", dpi=150)
print("saved invariants_toolbox.png")

print("Done.")
