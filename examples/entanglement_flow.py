#!/usr/bin/env python
"""Entanglement spectra: topology without edges.

The entanglement spectrum of a VIRTUAL cut (Peschel correlation-matrix
eigenvalues xi of half a cylinder) mimics a physical edge spectrum
(Fidkowski): a Chern insulator shows gapless spectral flow through
xi = 1/2 as the transverse momentum winds, a trivial insulator keeps an
entanglement gap, and a quantum spin Hall insulator flows in Kramers
pairs.  No boundary is ever created -- the cylinder is a glued ring and
the topology is read from the ground-state wavefunction alone.

Panels: Haldane (C = -1), trivial gapped graphene, Kane-Mele (QSH),
each one batched device program over the flow momenta.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import entanglement, models

cases = [
    (models.haldane(), [0], "Haldane  ($C=-1$)"),
    (models.graphene(delta=1.5), [0], "trivial insulator"),
    (models.kane_mele(), [0, 1], "Kane-Mele (QSH)"),
]

fig, axs = plt.subplots(1, 3, figsize=(11.5, 3.4), sharey=True)
for ax, (m, occ, title) in zip(axs, cases):
    kpar, xi = entanglement.entanglement_flow(m, occ, 0, L=14, nk=61)
    ax.plot(kpar, xi, "k.", ms=2.0)
    ax.axhline(0.5, color="crimson", lw=0.6, ls="--")
    ax.set_title(title)
    ax.set_xlabel(r"$k_\parallel$")
    ax.set_ylim(-0.03, 1.03)
axs[0].set_ylabel(r"entanglement eigenvalue $\xi$")
fig.tight_layout()
fig.savefig("entanglement_flow.png", dpi=150)
print("saved entanglement_flow.png")

kpar, xi = entanglement.entanglement_flow(models.haldane(), [0], 0, L=14,
                                          nk=61)
S = entanglement.entanglement_entropy(xi)
print("Haldane: min |xi - 1/2| = %.4f (gapless flow), max S(k) = %.3f"
      % (np.abs(xi - 0.5).min(), S.max()))
print("Done.")
