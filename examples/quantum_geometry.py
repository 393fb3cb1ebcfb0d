#!/usr/bin/env python
"""Quantum geometry of the Haldane model.

The quantum geometric tensor Q_ab(k) bundles the two geometric
quantities of a band: the Fubini-Study metric g = Re Q (how fast the
state moves in Hilbert space) and the Berry curvature Omega = -2 Im Q.
This example maps both across the BZ of the Haldane model and shows the
two exact sum rules the package tests enforce:

* the BZ-averaged curvature times 2 pi / A_c is the Chern number;
* the BZ-averaged metric trace is the Marzari-Vanderbilt
  gauge-invariant Wannier spread Omega_I -- the floor on how localized
  ANY Wannier representation of the band can be.  (A nonzero Chern
  number forces Omega_I to stay finite while the localized-gauge
  obstruction makes the FULL spread diverge -- topology seen in real
  space.)

The pointwise Cauchy-Schwarz bound tr g >= |Omega| is also plotted:
bands that saturate it ("ideal" bands, like Landau levels) are the
arena of fractional Chern insulators.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import geometry
from pythtb_tpu.models import haldane

m = haldane()

# QGT of the lower band on a BZ grid (one device program)
n = 72
k1, k2 = np.meshgrid(np.arange(n) / n, np.arange(n) / n, indexing="ij")
ks = np.stack([k1.ravel(), k2.ravel()], axis=-1)
Q = geometry.quantum_geometric_tensor(m, ks, occ=[0])
g = Q.real.reshape(n, n, 2, 2)
om = (-2.0 * Q.imag).reshape(n, n, 2, 2)[:, :, 0, 1]
trg = g[..., 0, 0] + g[..., 1, 1]

res = geometry.integrated_metric(m, occ=[0], nk=(72, 72))
print("Chern from integrated curvature : %+.6f" % res["chern"])
print("gauge-invariant spread Omega_I  : %.6f A^2" % res["omega_i"])
print("pointwise min(tr g - |Omega|)   : %.6f (>= 0)"
      % (trg - np.abs(om)).min())

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))
for ax, fld, title in [
    (axs[0], om, r"Berry curvature $\Omega(k)$"),
    (axs[1], trg, r"metric trace  $\mathrm{tr}\,g(k)$"),
    (axs[2], trg - np.abs(om), r"$\mathrm{tr}\,g - |\Omega|$ (bound)"),
]:
    im = ax.imshow(fld.T, origin="lower", extent=(0, 1, 0, 1),
                   cmap="magma")
    fig.colorbar(im, ax=ax, shrink=0.85)
    ax.set_title(title)
    ax.set_xlabel(r"$k_1$")
    ax.set_ylabel(r"$k_2$")
fig.tight_layout()
fig.savefig("quantum_geometry.png", dpi=150)
print("saved quantum_geometry.png")

# ---- superfluid weight of a flat band ------------------------------------
# The Lieb lattice's exactly flat band has ZERO group velocity, so the
# conventional superfluid weight vanishes -- yet the BdG phase-twist
# response is finite, carried entirely by the quantum metric
# (Peotta & Torma).  One device program per point.
from pythtb_tpu.models import lieb

lb = lieb()
deltas = [0.05, 0.1, 0.2, 0.3, 0.45]
ds = [geometry.superfluid_weight(lb, 0.0, d, nk=(24, 24))[0, 0]
      for d in deltas]
print("Lieb flat band at mu = 0 (conventional part = 0):")
for d, w in zip(deltas, ds):
    print("  Delta = %.2f -> D_s = %.4f" % (d, w))

fig2, ax2 = plt.subplots(figsize=(4.4, 3.4))
ax2.plot(deltas, ds, "ko-", ms=4)
ax2.set_xlabel(r"pairing $\Delta$")
ax2.set_ylabel(r"$D_s$")
ax2.set_title("flat-band superfluid weight\n(purely quantum-geometric)")
fig2.tight_layout()
fig2.savefig("superfluid_weight.png", dpi=150)
print("saved superfluid_weight.png")

print("Done.")
