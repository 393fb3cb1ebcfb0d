#!/usr/bin/env python
"""The round-2 wf_array toolkit on one problem: a charge pump.

Three upstream wish-list features working together on the 3-site pump
(/root/reference/notes/TODO:25-37, :17-20, :46-48 -- none exist in the
reference):

1. ``solve_on_grid_models`` fills the whole (lambda x k) grid from the
   model family in ONE vmapped device program (the reference's pump
   examples hand-loop every point);
2. ``adiabatic_evolve`` follows the lowest band around the closed pump
   cycle by wavefunction continuity and reports the per-step fidelity;
3. ``smooth_gauge`` imposes the optimally smooth (MV1997) gauge along
   k, after which the hybrid Wannier center flow reads off directly.

The pump's Chern number (+1) appears three independent ways: the Berry
flux through the (k, lambda) torus, the winding of the Berry-phase
flow, and the net displacement of the smoothed Wannier center.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import wf_array
from pythtb_tpu.models import three_site_chain

nl, nk = 41, 31
lams = np.linspace(0.0, 1.0, nl)

wf = wf_array(three_site_chain(0.0), [nl, nk])
gaps = wf.solve_on_grid_models([three_site_chain(l) for l in lams], param_dir=0)
wf.impose_loop(0)
print("family fill: %d x %d grid, min gaps %s" % (nl, nk, np.round(gaps, 3)))

# 1. Chern number of the pump torus
chern = wf.berry_flux([0], dirs=[0, 1]) / (2.0 * np.pi)
print("pump Chern number (Berry flux): %.6f" % chern)

# 2. adiabatic following around the cycle
idx, fid = wf.adiabatic_evolve([0], dir=0)
print("adiabatic following: band %d -> band %d, min fidelity %.4f"
      % (idx[0, 0, 0], idx[-1, 0, 0], fid.min()))

# 3. Berry-phase flow = Wannier-center flow; winding = Chern number
flow = wf.berry_phase([0], dir=1, contin=True)
winding = (flow[-1] - flow[0]) / (2.0 * np.pi)
print("Wannier-center winding over one cycle: %.6f" % winding)

# smooth periodic gauge along k at fixed lambda: the single-band link
# phases all equal phi/N afterwards
wf.smooth_gauge([0], dir=1, closed=True)
w = np.asarray(wf._wfs)[0, :, 0, :]
ovr = np.einsum("kf,kf->k", w[:-1].conj(), w[1:])
spread = np.angle(ovr).max() - np.angle(ovr).min()
print("smoothed gauge at lambda=0: link-phase spread %.2e (uniform twist)" % spread)

assert abs(abs(chern) - 1.0) < 1e-3 and abs(abs(winding) - 1.0) < 1e-2
assert fid.min() > 0.97 and spread < 1e-8

fig, ax = plt.subplots(figsize=(5.0, 4.0))
ax.plot(lams, flow / (2.0 * np.pi), "k.-", ms=3)
ax.set_xlabel(r"$\lambda$")
ax.set_ylabel(r"Wannier center $\bar{x}(\lambda)$")
ax.set_title("charge pump: center flows by one cell per cycle")
fig.tight_layout()
fig.savefig("pump_tools.pdf")
print("saved pump_tools.pdf")

print("Done.")
