"""Quasicrystals and quasiperiodic chains.

``models.quasicrystal`` builds aperiodic tight-binding models the
reference cannot (it is periodic-crystal-only): Penrose and
Ammann-Beenker vertex models from ONE exact-integer de Bruijn
multigrid engine, the Aubry-Andre chain with its self-dual
localization transition, and the Fibonacci hopping chain with its
Cantor-set spectrum.  Everything returns a plain finite
:class:`tb_model`, so the whole engine stack (dense solve, KPM,
LOBPCG, LDOS, dynamics) applies unchanged.

Panels:
1. A Penrose P3 patch (fat/thin rhombi) with the strictly-localized
   E = 0 confined-state weight overlaid on the vertices.
2. Penrose vertex-model DOS: exactly particle-hole symmetric with the
   macroscopically degenerate zero-energy spike.
3. Aubry-Andre IPR across the self-dual point lam = 2t: every state
   delocalized below, localized above.
4. Fibonacci chain spectrum vs generation: the trifurcating Cantor
   gaps at the golden-mean filling fractions.
5. Quasicrystalline Chern insulator: a uniform field
   (``magnetic.peierls_model``) opens Landau gaps on the Penrose
   patch; the Bianco-Resta local Chern marker
   (``realspace.chern_marker``) plateaus at +1 in the bulk -- a
   real-space invariant where no Brillouin zone exists.
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu.models import quasicrystal as qc

from pythtb_tpu import magnetic, realspace

fig, axs = plt.subplots(1, 5, figsize=(18, 3.6))

# -- 1. Penrose patch + E=0 confined states -----------------------------
m, til = qc.penrose(8.0, return_tiling=True)
pos, edges = til["verts"], til["edges"]
for i, j in edges:
    axs[0].plot(pos[[i, j], 0], pos[[i, j], 1], color="0.75", lw=0.5)
ev, vec = m.solve_all(eig_vectors=True)
# dtype-robust zero detection: f32 eigh on the TPU backend carries
# ~1e-5-level roundoff; the first nonzero |E| on Penrose is O(0.1)
zero = np.abs(ev) < 1e-3
w0 = (np.abs(vec[zero]) ** 2).sum(axis=0)
axs[0].scatter(pos[:, 0], pos[:, 1], s=3 + 300 * w0, c="C3", zorder=3)
axs[0].set_aspect("equal")
axs[0].set_axis_off()
axs[0].set_title("Penrose patch, %d sites; E=0 weight" % len(pos))

# -- 2. Penrose DOS ------------------------------------------------------
axs[1].hist(ev, bins=80, color="C0")
axs[1].set_xlabel("E / |t|")
axs[1].set_ylabel("states / bin")
axs[1].set_title("%d E=0 confined states (%.1f%%)"
                 % (zero.sum(), 100.0 * zero.mean()))

# -- 3. Aubry-Andre localization transition -----------------------------
lams = np.linspace(0.2, 4.0, 25)
ipr = []
for lam in lams:
    _, v = qc.aubry_andre(144, lam, t=1.0).solve_all(eig_vectors=True)
    ipr.append((np.abs(v) ** 4).sum(axis=-1).mean())
axs[2].semilogy(lams, ipr, "o-", ms=3)
axs[2].axvline(2.0, color="0.6", ls="--", label="self-dual $\\lambda=2t$")
axs[2].set_xlabel(r"$\lambda / t$")
axs[2].set_ylabel("mean IPR")
axs[2].legend(fontsize=8)
axs[2].set_title("Aubry-Andre transition (L=144)")

# -- 4. Fibonacci Cantor spectrum ---------------------------------------
for n in range(4, 11):
    e = np.sort(qc.fibonacci_chain(n, ta=-1.0, tb=-0.5).solve_all())
    axs[3].plot(e, np.full_like(e, n), ".", ms=1.2, color="C0")
axs[3].set_xlabel("E")
axs[3].set_ylabel("generation n")
axs[3].set_title("Fibonacci chain: Cantor-set gaps")

# -- 5. quasicrystalline Chern insulator --------------------------------
phi = 0.2
mb = magnetic.peierls_model(m, phi, dirs=(0, 1))
evb = np.sort(mb.solve_all())
gaps = np.diff(evb)
target = int(round(phi * len(pos) * 0.8123))
i0 = target - 5 + int(np.argmax(gaps[target - 5: target + 5]))
cm = realspace.chern_marker(mb, nocc=i0 + 1)
owned = qc.vertex_areas(til)
rr = np.linalg.norm(pos, axis=1)
bulk = rr < 5.0
c_bulk = cm[bulk].sum() / owned[bulk].sum()
sc = axs[4].scatter(pos[:, 0], pos[:, 1], c=cm / owned, s=8,
                    cmap="RdBu_r", vmin=-2, vmax=2)
fig.colorbar(sc, ax=axs[4], shrink=0.8)
axs[4].set_aspect("equal")
axs[4].set_axis_off()
axs[4].set_title("local Chern marker, $\\phi$=%.1f: bulk C=%.3f"
                 % (phi, c_bulk))

fig.tight_layout()
fig.savefig("quasicrystal.pdf")
print("Penrose sites:", len(pos), " E=0 states:", int(zero.sum()))
print("bulk Chern marker at phi=0.2: %.4f" % c_bulk)
print("IPR(lam=0.2) = %.4f  IPR(lam=4.0) = %.4f" % (ipr[0], ipr[-1]))
print("saved quasicrystal.pdf")
print("Done.")
