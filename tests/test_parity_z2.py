"""Fu-Kane parity Z2 oracles (flows.parity_z2).

Differential: the parity shortcut against the Wilson-flow Z2 engine
(completely independent algorithm -- 2^d eigensolves + parity products
vs hybrid-Wannier flows) on Kane-Mele, BHZ (both phases, coincident
orbital positions with s/p parities) and plane-resolved Fu-Kane-Mele
3-D (strong + weak indices).  Guards: non-inversion-symmetric models
raise from the numeric P H(-k) P^+ == H(k) verification.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows


def test_kane_mele_matches_wilson():
    km = ptt.models.kane_mele(esite=0.0, rashba=0.0)
    r = flows.parity_z2(km, (0, 1), center=[0.5, 0.5])
    assert r["nu0"] == 1
    assert r["nu0"] == int(flows.z2_invariant(km, (0, 1), nk=(25, 25)))
    # rashba preserves inversion? NO -- the Rashba term on the
    # honeycomb breaks z -> -z but not in-plane inversion; the
    # construction must still verify (it does for the KM form used
    # here) or raise -- accept either, but never a silent wrong value
    try:
        r2 = flows.parity_z2(ptt.models.kane_mele(esite=0.0, rashba=0.25),
                             (0, 1), center=[0.5, 0.5])
        assert r2["nu0"] == 1
    except PythtbError:
        pass


@pytest.mark.parametrize("m,expect", [(-1.0, 1), (1.0, 0), (-7.0, 1),
                                      (-9.0, 0)])
def test_bhz_phases(m, expect):
    b = ptt.models.bhz(m=m)
    r = flows.parity_z2(b, (0, 1), parity=[1, -1])
    assert r["nu0"] == expect
    assert r["nu0"] == int(flows.z2_invariant(b, (0, 1), nk=(25, 25)))


def test_fkm_strong_and_weak_vs_plane_wilson():
    fkm = ptt.models.fu_kane_mele()
    c = np.asarray(fkm._orb).sum(axis=0) / 2.0
    r = flows.parity_z2(fkm, (0, 1), center=c)
    assert r["nu0"] == 1
    assert r["weak"] == (1, 1, 1)  # FKM [111]-bond strong TI: (1;111)
    # independent route: nu0 = z2(k3=0) XOR z2(k3=1/2) from Wilson flows
    z0 = int(flows.z2_invariant(fkm.reduce_dim(2, 0.0), (0, 1),
                                nk=(21, 21)))
    z5 = int(flows.z2_invariant(fkm.reduce_dim(2, 0.5), (0, 1),
                                nk=(21, 21)))
    assert r["nu0"] == (z0 + z5) % 2
    # the weak index nu3 is the k3 = 1/2 plane invariant itself
    assert r["weak"][2] == z5


def test_guards():
    # inversion broken by a sublattice potential
    with pytest.raises(PythtbError, match="not inversion symmetric"):
        flows.parity_z2(ptt.models.kane_mele(esite=1.0, rashba=0.0),
                        (0, 1), center=[0.5, 0.5])
    # wrong center: no geometric partner
    with pytest.raises(PythtbError, match="partner"):
        flows.parity_z2(ptt.models.kane_mele(esite=0.0, rashba=0.0),
                        (0, 1), center=[0.25, 0.0])
    # wrong orbital parities on BHZ: numeric check must catch it
    with pytest.raises(PythtbError, match="not inversion symmetric"):
        flows.parity_z2(ptt.models.bhz(), (0, 1), parity=[1, 1])
    # spinless model rejected
    with pytest.raises(PythtbError, match="spinful"):
        flows.parity_z2(ptt.models.haldane(), (0,))
    with pytest.raises(PythtbError, match="even"):
        flows.parity_z2(ptt.models.bhz(), (0,), parity=[1, -1])


def test_coincident_offcenter_pairs_and_occ_range():
    """Regression (review): coincident orbitals AWAY from an
    inversion-fixed point must pair off consistently (the greedy map
    once sent two orbitals to the same partner, leaving P singular);
    and occ is range-checked (negative indices used to wrap silently
    to the conduction bands)."""
    m = ptt.tb_model(1, 1, lat=[[1.0]],
                     orb=[[0.25], [0.25], [0.75], [0.75]], nspin=2)
    m.set_onsite([0.3, -0.3, 0.3, -0.3])
    m.set_hop(1.0, 0, 2, [0])
    m.set_hop(1.0, 1, 3, [0])
    m.set_hop(0.7, 2, 0, [1])
    m.set_hop(0.7, 3, 1, [1])
    r = flows.parity_z2(m, (0, 1, 2, 3), center=[0.5])
    assert r["nu0"] in (0, 1)  # computes instead of false-raising
    with pytest.raises(PythtbError, match="range"):
        flows.parity_z2(ptt.models.bhz(), (-2, -1), parity=[1, -1])
