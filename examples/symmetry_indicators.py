#!/usr/bin/env python
"""Symmetry detection and rotation-eigenvalue Chern indicators.

Three things the symmetry module does that the reference cannot:

1. Detect the space group of a model numerically (find_symmetries /
   point_group) -- every returned operation is construction-verified
   against the Bloch Hamiltonian.
2. Band representations: little-group eigenvalues of the occupied
   bands at high-symmetry momenta.
3. Chern numbers mod n from a handful of high-symmetry
   diagonalizations (Fang-Gilbert-Bernevig indicators) -- pinned here
   against the full BZ integration across the Haldane phase diagram.
"""

import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import flows, symmetry

# --- 1. point groups of a few models ---------------------------------
for name, model in [
    ("graphene", ptt.models.graphene()),
    ("haldane (delta=0.2)", ptt.models.haldane()),
    ("haldane (delta=0)", ptt.models.haldane(delta=0.0)),
    ("kane-mele", ptt.models.kane_mele(esite=0.0, rashba=0.0)),
]:
    pg, ops = symmetry.point_group(model)
    print("%-22s point group %-4s (%d ops)" % (name, pg, len(ops)))

# --- 2. band representation of Haldane at K --------------------------
h = ptt.models.haldane()
c3 = [o for o in symmetry.find_symmetries(h) if o.order == 3][0]
for kpt in ([0, 0], [1 / 3.0, 2 / 3.0], [2 / 3.0, 1 / 3.0]):
    ev, det = symmetry.symmetry_eigenvalues(h, c3, kpt, occ=[0])
    print("C3 eigenvalue at %-20s %.4f%+.4fj"
          % (np.round(kpt, 3).tolist(), ev[0].real, ev[0].imag))

# --- 3. indicator vs integrated Chern across the phase diagram -------
print("\nHaldane phase diagram: indicator (mod 3) vs chern_number")
print("%8s %8s | %6s %12s %6s" % ("delta", "phi/pi", "C", "C mod 3", "ok"))
for delta, phi in [(0.2, 0.5), (0.2, -0.5), (1.5, 0.5), (0.5, 0.25),
                   (0.9, -0.75)]:
    m = ptt.models.haldane(delta=delta, t2=0.15 * np.exp(1j * np.pi * phi))
    res = symmetry.chern_indicator(m, occ=[0])
    C = int(round(flows.chern_number(m, [0], nk=(41, 41))))
    ok = res["c_mod_n"] == C % res["n"]
    print("%8.2f %8.2f | %6d %12d %6s"
          % (delta, phi, C, res["c_mod_n"], "yes" if ok else "NO"))

# QWZ needs orbital characters: the (s, p_x + i p_y) doublet
print("\nQWZ (C4, l=[0,1]):")
for u in (-1.0, 1.0, 2.5):
    res = symmetry.chern_indicator(ptt.models.qwz(u), occ=[0], l=[0, 1])
    C = int(round(flows.chern_number(ptt.models.qwz(u), [0],
                                     nk=(41, 41))))
    print("  u=%+.1f  C=%+d  indicator C mod 4 = %d" % (u, C,
                                                        res["c_mod_n"]))

print("Done.")
