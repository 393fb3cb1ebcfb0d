#!/usr/bin/env python
"""Wannier interpolation without Wannier90.

The reference can only IMPORT Wannier90 output; this example produces
Wannier-interpolated bands natively: solve a coarse BZ grid once,
project the band group (automatic SCDM-like trials), and interpolate
anywhere -- band structures on dense paths and meshes with no further
diagonalization of the full model.

Runs on h-BN (lower band) and, when the Wannier90 silicon dataset is
available, on silicon: all 8 bands recovered exactly from an 8x8x8 grid, plus
the valence-only group solved by MV maximal localization + multigrid
refinement (the classic one-shot-projection hard case).
"""
import pathlib
import os
import time

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import wannier, w90
from pythtb_tpu.models import bn

# ---- h-BN lower band from a 20x20 grid -----------------------------------
m = bn()
itp = wannier.interpolator(m, [0], nk=20)
kpts, kdist, knode = m.k_path([[0, 0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [0, 0]],
                              201, report=False)
t0 = time.time()
ei = itp.bands(kpts)
dt = time.time() - t0
direct = m.solve_all(kpts)
err = np.abs(ei[0] - direct[0]).max()
print("h-BN lower band (20x20 coarse grid): 201 path points in %.3f s, max err %.2e "
      "(projection sv %.3f)" % (dt, err, itp.min_projection_sv))
assert err < 5e-3

fig, ax = plt.subplots(figsize=(5.5, 4.0))
ax.plot(kdist, direct.T, "0.7", lw=2.5, label="direct")
ax.plot(kdist, ei[0], "k--", lw=1.0, label="Wannier-interpolated")
for x in knode:
    ax.axvline(x, color="0.9", lw=0.5, zorder=0)
ax.set_ylabel("E")
ax.set_title("h-BN: interpolated lower band vs direct")
ax.legend()
fig.tight_layout()
fig.savefig("wannier_interp.pdf")
print("saved wannier_interp.pdf")

# ---- silicon valence bands (real Wannier90 data, if present) -------------
W90_DIR = os.environ.get(
    "W90_SILICON", str(pathlib.Path(__file__).resolve().parents[1] / "tests" / "data" / "w90_silicon")
)
if os.path.isdir(W90_DIR):
    si = w90(W90_DIR, "silicon")
    model = si.model()
    kp, ene = si.w90_bands_consistency()
    direct = model.solve_all(kp)
    # full 8-WF space from an 8x8x8 grid: the model's finite-range
    # hoppings are recovered exactly, so interpolation is exact
    itp8 = wannier.interpolator(model, list(range(8)), nk=8, trial=np.eye(8))
    err8 = np.abs(itp8.bands(kp) - direct).max()
    print("silicon, all 8 bands from an 8^3 grid: max err %.1e eV (exact "
          "finite-range recovery; sv %.3f)" % (err8, itp8.min_projection_sv))
    assert err8 < 1e-9
    # valence-only is the classic HARD case for one-shot projection
    # (X-point character inversion; fixed atom-centered trials give
    # sv ~ 0.38).  MV maximal localization + multigrid refinement
    # solves it: the coarse 8^3 gauge is localized, its Wannier
    # vectors project the fine grid near-unitarily, and the
    # interpolation error falls exponentially with the fine grid
    # (sub-meV at 28^3 -- see tests/test_wannier.py).
    itp4 = wannier.interpolator(model, [0, 1, 2, 3], nk=16,
                                trial=np.eye(8)[:4], localize=400,
                                coarse_nk=8, polish=0)
    err4 = np.abs(itp4.bands(kp) - direct[:4]).max()
    print("silicon, valence-only (MLWF multigrid 8^3 -> 16^3, fine sv "
          "%.2f): max err %.1e eV" % (itp4.min_projection_sv, err4))
    assert err4 < 2e-2
    # ... and the localized group downfolds to an ordinary tb_model
    eff = itp4.model(min_hopping_norm=1e-4)
    errm = np.abs(eff.solve_all(kp) - itp4.bands(kp)).max()
    print("downfolded 4-band tb_model reproduces the interpolation to "
          "%.1e eV with %d hoppings" % (errm, len(eff._hoppings)))
else:
    print("silicon Wannier90 data not found; skipping that part")

print("Done.")
