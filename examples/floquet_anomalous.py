#!/usr/bin/env python
"""Anomalous Floquet topology: edge states with zero Chern numbers.

The Rudner-Lindner-Berg-Levin model (PRX 3, 031005 (2013)): a bipartite
square lattice whose four bond types are switched on one at a time
(five-step drive, sublattice potential during the idle step).  Near the
"perfect coupling" point the quasienergy bands are nearly flat and
carry ZERO Chern number -- yet chiral edge modes cross BOTH quasienergy
gaps (at 0 and at pi/T).  The invariant that sees them is the winding
number of the periodized evolution map, W(egap), implemented as a
device-side degree integral (pythtb_tpu.floquet.winding_number).  No
static-framework quantity can detect this phase.

Panels:
1. driven-ribbon quasienergy spectrum: edge modes bridge both gaps;
2. the same drive's bulk band structure (nearly flat bands);
3. numbers: W(0), W(pi), band Chern -- the bulk-boundary dictionary.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import floquet, tb_model

omega = 1.0
T = 2.0 * np.pi / omega
J = 0.85 * (np.pi / 2.0) / (T / 5.0)
DELTA = 0.5


def rudner():
    m = tb_model(2, 2, lat=[[1.0, 0.0], [0.0, 1.0]],
                 orb=[[0.0, 0.0], [0.5, 0.5]])
    for R in ([0, 0], [-1, 0], [-1, -1], [0, -1]):
        m.set_hop(J, 0, 1, R)
    return m


def drive_for(model):
    """Five-step RLBL drive for `model` (bulk or ribbon): each stored
    hop inherits the step index of the bulk bond type it came from."""
    nhop = len(model._hoppings)
    step_of = np.arange(nhop) % 4 if nhop == 4 else None
    if step_of is None:
        # ribbon: identify the bond type by its displacement direction
        from pythtb_tpu.floquet import _hop_displacements

        d = _hop_displacements(model)
        ang = np.arctan2(d[:, 1], d[:, 0])
        step_of = ((np.round((ang - np.pi / 4.0) / (np.pi / 2.0)))
                   .astype(int)) % 4

    def hop_factors(t):
        step = int(t / (T / 5.0))
        return (step_of == step).astype(float)

    norb = model._norb

    def onsite(t):
        step = int(t / (T / 5.0))
        if step != 4:
            return np.zeros(norb)
        sgn = 1.0 - 2.0 * (np.arange(norb) % 2)
        return DELTA * sgn

    return {"hop_factors": hop_factors, "onsite": onsite}


bulk = rudner()
fig, axs = plt.subplots(1, 2, figsize=(9.0, 3.6), sharey=True)

rib = bulk.cut_piece(16, 1, glue_edgs=False)
kr = np.linspace(0.0, 1.0, 81)[:, None]
eps_r = floquet.quasienergies_exact(rib, omega, drive_for(rib), kr, nt=300)
axs[0].plot(kr[:, 0], eps_r, "k.", ms=1.2)
axs[0].axhline(0.0, color="crimson", lw=0.5, ls=":")
axs[0].axhline(omega / 2, color="crimson", lw=0.5, ls=":")
axs[0].axhline(-omega / 2, color="crimson", lw=0.5, ls=":")
axs[0].set_ylabel("quasienergy")
axs[0].set_xlabel(r"$k_x$")
axs[0].set_title("driven ribbon: edge modes in BOTH gaps")

kb = np.linspace(0.0, 1.0, 81)
kpts = np.stack([kb, 0.0 * kb], -1)
eps_b = floquet.quasienergies_exact(bulk, omega, drive_for(bulk), kpts,
                                    nt=300)
axs[1].plot(kb, eps_b, "k-", lw=1.0)
axs[1].set_xlabel(r"$k_x$ ($k_y = 0$)")
axs[1].set_title("bulk: nearly flat bands")

fig.tight_layout()
fig.savefig("floquet_anomalous.png", dpi=150)
print("saved floquet_anomalous.png")

drv = drive_for(bulk)
w0, wp = floquet.winding_number(bulk, omega, drv, egap=[0.0, omega / 2],
                                nk=(17, 17), nt=200)
c0 = floquet.chern(bulk, omega, drv, band=0, nk=(17, 17), nt=200)
print("W(0-gap)  = %+.3f" % w0)
print("W(pi-gap) = %+.3f" % wp)
print("band Chern = %+.4f  (anomalous: edge modes with C = 0)" % c0)
print("Done.")
