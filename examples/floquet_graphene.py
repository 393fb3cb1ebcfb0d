#!/usr/bin/env python
"""Floquet engineering of graphene: light-induced topology.

Circularly polarized light turns graphene into a Chern insulator (the
light-induced anomalous Hall effect): the drive's van Vleck commutator
``[H^{(1)}, H^{(-1)}]/Omega`` generates Haldane-like imaginary
second-neighbor hops.  The reference framework has no time-dependent
machinery at all; pythtb_tpu.floquet provides the quasienergy spectrum
(extended-zone Floquet matrix, one batched device eigh), the exact
one-period propagator, Floquet-band Chern numbers, and a high-frequency
effective tb_model that composes with the rest of the package.

Panels:
1. quasienergy band structure along the high-symmetry path, colored by
   the m=0 (undriven-sector) weight, showing the gap opening at K;
2. a driven zigzag ribbon's quasienergy spectrum: one chiral edge mode
   per edge crosses the light-induced gap (bulk-boundary
   correspondence of the Floquet Chern number);
3. the light-induced gap at K vs drive amplitude, full Floquet vs the
   van Vleck effective model.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import floquet, flows, models

m = models.graphene()
omega = 10.0


def circ(A):
    return {"A": [A, A], "phase": [0.0, np.pi / 2]}


# -- 1: quasienergy bands with m=0 weights ---------------------------------
(k_vec, k_dist, k_node) = m.k_path(
    [[0.0, 0.0], [1.0 / 3.0, 2.0 / 3.0], [0.5, 0.5], [0.0, 0.0]], 121,
    report=False,
)
quasi, wgt = floquet.quasienergies(m, omega, circ(1.2), k_vec, nharm=5)

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))
sc = axs[0].scatter(
    np.repeat(k_dist, quasi.shape[1]), quasi.ravel(),
    c=wgt.ravel(), s=2.0, cmap="viridis", vmin=0.0, vmax=1.0,
)
axs[0].set_ylim(-0.6 * omega, 0.6 * omega)
axs[0].set_xticks(k_node)
axs[0].set_xticklabels([r"$\Gamma$", "K", "M", r"$\Gamma$"])
axs[0].set_ylabel("quasienergy")
axs[0].set_title("driven graphene, $m=0$ weight")
fig.colorbar(sc, ax=axs[0])

# -- 2: driven ribbon edge states ------------------------------------------
rib = m.cut_piece(12, 1, glue_edgs=False)
kr = np.linspace(0.0, 1.0, 81)[:, None]
eps_r = floquet.quasienergies_exact(rib, omega, circ(1.2), kr, nt=96)
axs[1].plot(kr[:, 0], eps_r, "k-", lw=0.4)
axs[1].set_ylim(-1.2, 1.2)
axs[1].set_xlabel(r"$k_x$")
axs[1].set_title("driven zigzag ribbon: chiral edge modes")

# -- 3: light-induced gap at K, exact vs van Vleck -------------------------
kK = np.array([[1.0 / 3.0, 2.0 / 3.0]])
amps = np.linspace(0.0, 1.6, 9)
gap_exact, gap_eff = [], []
for A in amps:
    eps = floquet.quasienergies_exact(m, omega, circ(A), kK, nt=128)
    gap_exact.append(eps[0, 1] - eps[0, 0])
    ek = floquet.effective_model(m, omega, circ(A)).solve_all(kK)
    gap_eff.append(ek[1, 0] - ek[0, 0])
axs[2].plot(amps, gap_exact, "o-", label="exact Floquet")
axs[2].plot(amps, gap_eff, "s--", label=r"van Vleck $O(1/\Omega)$")
axs[2].set_xlabel("drive amplitude $A$")
axs[2].set_ylabel("gap at K")
axs[2].legend()
axs[2].set_title("light-induced gap")

fig.tight_layout()
fig.savefig("floquet_graphene.png", dpi=150)
print("saved floquet_graphene.png")

c = floquet.chern(m, omega, circ(1.2), band=0, nk=(19, 19), nt=96)
eff = floquet.effective_model(m, omega, circ(1.2))
c_eff = flows.chern_number(eff, [0], nk=(31, 31))
print("Floquet Chern number of the lower band: %+.4f" % c)
print("Effective-model Chern number:           %+.4f" % c_eff)
print("Done.")
