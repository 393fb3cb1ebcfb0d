#!/usr/bin/env python
"""Topological response functions beyond Chern numbers.

Two round-2 flows, each a single compiled device program:

1. ``flows.anomalous_hall``: intrinsic sigma_xy(E_F) in e^2/h across a
   whole Fermi-level sweep -- quantized plateaus inside gaps (TKNN),
   non-quantized inside bands, zero under time reversal.
2. ``flows.quadrupole``: higher-order topology via nested Wilson loops
   -- the BBH quadrupole insulator reads q_xy = 1/2, matched by four
   corner-localized zero modes on a finite flake.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import flows
from pythtb_tpu.models import bbh, haldane

# ---- sigma_xy(E_F) for the Haldane model ---------------------------------
m = haldane()
efs = np.linspace(-3.6, 3.6, 181)
sig = flows.anomalous_hall(m, efs, nk=(101, 101))
print("sigma_xy plateau in the gap: %.6f e^2/h (Chern -1)" % sig[90])

fig, axs = plt.subplots(1, 2, figsize=(9.5, 3.8))
axs[0].plot(efs, sig, "k-")
axs[0].axhline(-1.0, color="0.8", lw=0.6, zorder=0)
axs[0].set_xlabel(r"$E_F$")
axs[0].set_ylabel(r"$\sigma_{xy}$  [$e^2/h$]")
axs[0].set_title("Haldane: anomalous Hall staircase")

# ---- quadrupole invariant across the BBH transition ----------------------
gammas = np.linspace(0.2, 1.8, 17)
qs = [flows.quadrupole(bbh(g, 1.0), nk=(21, 21))["qxy"] for g in gammas]
print("q_xy: gamma=0.2 -> %.3f ; gamma=1.8 -> %.3f (transition at 1)" % (qs[0], qs[-1]))
axs[1].plot(gammas, qs, "ko-", ms=3)
axs[1].axvline(1.0, color="0.8", lw=0.6, zorder=0)
axs[1].set_xlabel(r"$\gamma/\lambda$")
axs[1].set_ylabel(r"$q_{xy}$")
axs[1].set_title("BBH: quadrupole invariant")
fig.tight_layout()
fig.savefig("topology_tools.pdf")
print("saved topology_tools.pdf")

# corner modes corroborate the bulk invariant
flake = bbh(0.5, 1.0).cut_piece(8, 0).cut_piece(8, 1)
ev = np.sort(flake.solve_all())
print("BBH flake: %d near-zero corner modes (bulk q_xy = 1/2)"
      % int(np.sum(np.abs(ev) < 0.05)))

assert abs(sig[90] + 1.0) < 1e-3 and abs(qs[0] - 0.5) < 1e-6

print("Done.")
