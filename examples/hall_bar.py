#!/usr/bin/env python
"""Four-terminal Hall bar: quantized R_xy without a magnetic gauge.

``negf.hall_bar`` builds a Hall-cross geometry (finite device, four
semi-infinite leads of the SAME model), ``negf.multi_terminal`` returns
the full T_pq(E) matrix in one device program, and ``negf.buttiker``
inverts the Landauer-Buttiker current relations with the side contacts
floating as voltage probes.

For a Chern insulator the leads carry only chiral edge channels inside
the bulk gap, so the Hall resistance reads EXACTLY R_xy = h/(C e^2)
with zero longitudinal drop -- no Peierls substitution, no flux
bookkeeping, just topology.  Shown here on the QWZ model:

1. T_pq(E) across the gap (the chiral cycle N->E->S->W->N saturates at
   1 inside the gap, mirroring the Chern number);
2. R_xy and R_xx vs energy: a quantized h/e^2 plateau spanning the gap;
3. the plateau is immune to device-region Anderson disorder until the
   disorder strength closes the gap.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import negf

# QWZ Chern insulator, C = +1 at m = -1
lat = [[1.0, 0.0], [0.0, 1.0]]
mod = ptt.tb_model(2, 2, lat, [[0.0, 0.0], [0.0, 0.0]])
mod.set_onsite([-1.0, 1.0])
mod.set_hop(0.5, 0, 0, [1, 0])
mod.set_hop(-0.5, 1, 1, [1, 0])
mod.set_hop(0.5, 0, 0, [0, 1])
mod.set_hop(-0.5, 1, 1, [0, 1])
mod.set_hop(0.5j, 0, 1, [1, 0])
mod.set_hop(0.5j, 1, 0, [1, 0])
mod.set_hop(0.5, 0, 1, [0, 1])
mod.set_hop(-0.5, 1, 0, [0, 1])

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

# ---- transmission matrix across the gap -------------------------------
Hd, leads, info = negf.hall_bar(mod, (8, 8))
Es = np.linspace(-0.8, 0.8, 41)
T = negf.multi_terminal(Hd, leads, Es, eta=1e-6)
names = info["order"]
# chiral cycle for C = +1: S -> W -> N -> E -> S
for p, q in [(0, 2), (3, 0), (1, 3), (2, 1)]:
    axs[0].plot(Es, T[:, p, q], lw=1.0,
                label=r"$T_{%s\leftarrow %s}$" % (names[p], names[q]))
axs[0].plot(Es, T[:, 2, 0], "k--", lw=0.8,
            label=r"$T_{S\leftarrow W}$ (anti-chiral)")
axs[0].set_xlabel("E")
axs[0].set_ylabel(r"$T_{pq}$")
axs[0].set_title("chiral transmission cycle")
axs[0].legend(frameon=False, fontsize=7)

# ---- Buttiker inversion: quantized plateau ----------------------------
rxy = np.full(len(Es), np.nan)
rxx = np.full(len(Es), np.nan)
for i in range(len(Es)):
    if T[i].max() < 1e-3:  # deep finite-size gap: no channels at all
        continue
    # band-edge energies can survive eta escalation with garbage T;
    # the unitarity sum rule is the cheap detector
    if np.abs(T[i].sum(0) - T[i].sum(1)).max() > 1e-2 * T[i].max():
        continue
    V = negf.buttiker(T[i], source=0, drain=1)
    rxy[i] = V[3] - V[2]
    rxx[i] = V[0] - V[1] - abs(rxy[i])
axs[1].plot(Es, rxy, "o-", ms=2.5, lw=0.9, label=r"$R_{xy}$")
axs[1].plot(Es, rxx, "s-", ms=2.5, lw=0.9, label=r"$R_{xx}$")
axs[1].axhline(1.0, color="0.8", lw=0.8, zorder=0)
axs[1].set_xlabel("E")
axs[1].set_ylabel(r"R  [$h/e^2$]")
axs[1].set_ylim(-0.5, 2.0)
axs[1].set_title(r"$R_{xy} = +h/e^2$ plateau (C = +1)")
axs[1].legend(frameon=False, fontsize=8)

# ---- disorder immunity -------------------------------------------------
Ws = np.linspace(0.0, 3.0, 13)
rxy_w = []
for wdis in Ws:
    Hd_w, leads_w, _ = negf.hall_bar(mod, (8, 8), disorder=wdis, seed=5)
    Tw = negf.multi_terminal(Hd_w, leads_w, np.array([0.0]), eta=1e-6)
    V = negf.buttiker(Tw[0], source=0, drain=1)
    rxy_w.append(V[3] - V[2])
axs[2].plot(Ws, rxy_w, "o-", ms=3, lw=1.0)
axs[2].axhline(1.0, color="0.8", lw=0.8, zorder=0)
axs[2].set_xlabel("disorder strength W")
axs[2].set_ylabel(r"$R_{xy}$  [$h/e^2$]")
axs[2].set_title("plateau vs device disorder")

fig.tight_layout()
fig.savefig("hall_bar.pdf")
print("R_xy at E=0, clean:", rxy[len(Es) // 2])
print("R_xy at W=1.0:", rxy_w[4])
print("Done.")
