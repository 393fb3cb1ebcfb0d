"""Point-group detection, band representations, and the rotation-
eigenvalue Chern indicator (symmetry.py).

Oracle strategy: every returned op is numerically construction-verified
inside the module (U H U^+ == H at random k); these tests go further and
pin the *indicator* against the independently computed BZ-integrated
Chern number (flows.chern_number) across known phase diagrams and
randomly generated symmetrized models -- a full differential tier, since
the two routes share no code (host HSP diagonalizations vs device
plaquette fluxes).
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows, symmetry


def _indicator_matches(model, occ, nk=(41, 41), l=None, **kw):
    res = symmetry.chern_indicator(model, occ=occ, l=l, **kw)
    C = flows.chern_number(model, occ, nk=nk)
    assert abs(C - round(C)) < 1e-6
    assert res["c_mod_n"] == int(round(C)) % res["n"], (res, C)
    return res, int(round(C))


# ---------------------------------------------------------------------------
# find_symmetries


def test_haldane_point_group():
    """Haldane: C3 about a site survives at delta != 0; delta = 0
    restores C6 (about the plaquette center, a nonzero tau)."""
    ops = symmetry.find_symmetries(ptt.models.haldane())
    orders = sorted(o.order for o in ops)
    assert orders == [3, 3]
    assert all(o.det == 1 for o in ops)
    ops0 = symmetry.find_symmetries(ptt.models.haldane(delta=0.0))
    assert max(o.order for o in ops0) == 6
    c6 = [o for o in ops0 if o.order == 6][0]
    # with orbitals at (1/3,1/3)/(2/3,2/3) the origin IS the hexagon
    # center, so the C6 is symmorphic here and swaps the sublattices
    assert not np.array_equal(c6.perm, np.arange(2))


def test_graphene_has_mirrors():
    """Graphene (TRS, no Haldane term): improper operations appear."""
    ops = symmetry.find_symmetries(ptt.models.graphene())
    assert any(o.det == -1 for o in ops)
    assert max(o.order for o in ops if o.det == 1) == 6
    name, _ = symmetry.point_group(ptt.models.graphene())
    assert name == "C6v"
    name_h, _ = symmetry.point_group(ptt.models.haldane())
    assert name_h == "C3"  # TRS breaking kills the mirrors


def test_qwz_needs_characters():
    """QWZ: with l=[0,1] the full C4 is found; with default s-like
    characters the rotations fail verification and are dropped."""
    m = ptt.models.qwz(1.0)
    ops = symmetry.find_symmetries(m, l=[0, 1])
    assert max(o.order for o in ops if o.det > 0) == 4
    ops_bad = symmetry.find_symmetries(m)
    assert all(o.order < 4 for o in ops_bad if o.det > 0)


def test_op_power_closes():
    """gen^order == identity (perm, W, tau mod 1)."""
    ops = symmetry.find_symmetries(ptt.models.haldane(delta=0.0))
    gen = [o for o in ops if o.order == 6][0]
    lat = np.asarray(ptt.models.haldane()._lat)
    e = symmetry._op_power(gen, 6, lat)
    assert np.array_equal(e.W, np.eye(2, dtype=np.int64))
    assert np.abs(e.tau - np.round(e.tau)).max() < 1e-9
    assert np.array_equal(e.perm, np.arange(2))


def test_finite_model_rejected():
    fl = ptt.models.haldane().cut_piece(3, 0, glue_edgs=False)
    with pytest.raises(PythtbError):
        symmetry.find_symmetries(fl)


# ---------------------------------------------------------------------------
# symmetry_eigenvalues


def test_eigenvalues_are_roots_of_unity():
    h = ptt.models.haldane()
    op = [o for o in symmetry.find_symmetries(h) if o.order == 3][0]
    for kpt in ([0, 0], [1 / 3.0, 2 / 3.0]):
        ev, det = symmetry_eigs = symmetry.symmetry_eigenvalues(
            h, op, kpt, occ=[0])
        assert np.abs(np.abs(ev) - 1.0).max() < 1e-9
        assert abs(ev.prod() - det) < 1e-9
        assert abs(ev[0] ** 3 - 1.0) < 1e-8  # C3: cube roots of unity


def test_eigenvalues_reject_noninvariant_k():
    h = ptt.models.haldane()
    op = [o for o in symmetry.find_symmetries(h) if o.order == 3][0]
    with pytest.raises(PythtbError):
        symmetry.symmetry_eigenvalues(h, op, [0.1, 0.2], occ=[0])


def test_spinful_kane_mele_eigenvalues():
    """Kane-Mele (no Rashba): C3 ops verified with the SU(2) factor;
    little-group eigenvalues at Gamma are e^{+-i pi/3}-type (half-
    integer character: 6th roots of -1 for C3 on spin-1/2)."""
    km = ptt.models.kane_mele(esite=0.0, rashba=0.0)
    ops = symmetry.find_symmetries(km)
    rots = [o for o in ops if o.det > 0 and o.order == 3]
    assert rots, "no C3 found on Kane-Mele"
    assert any(o.det > 0 and o.order == 6 for o in ops)  # full C6v
    ev, _ = symmetry.symmetry_eigenvalues(km, rots[0], [0, 0],
                                          occ=[0, 1])
    # (C3 x spin)^3 = -1 on spin-1/2: eigenvalues are 6th roots of -1
    assert np.abs(ev ** 3 + 1.0).max() < 1e-8


# ---------------------------------------------------------------------------
# chern_indicator vs chern_number (the differential tier)


@pytest.mark.parametrize("delta,phi,cexp", [
    (0.2, 0.5 * np.pi, -1),
    (0.2, -0.5 * np.pi, 1),
    (1.5, 0.5 * np.pi, 0),
    (0.0, 0.3 * np.pi, -1),
])
def test_indicator_haldane_phase_diagram(delta, phi, cexp):
    h = ptt.models.haldane(delta=delta, t2=0.15 * np.exp(1j * phi))
    res, C = _indicator_matches(h, [0])
    assert C == cexp
    assert res["n"] == (6 if delta == 0.0 else 3)


@pytest.mark.parametrize("u,cexp", [(1.0, -1), (-1.0, 1), (2.5, 0)])
def test_indicator_qwz(u, cexp):
    m = ptt.models.qwz(u)
    res, C = _indicator_matches(m, [0], l=[0, 1])
    assert res["n"] == 4 and C == cexp
    # forced-C2 subgroup consistency
    res2 = symmetry.chern_indicator(m, occ=[0], l=[0, 1], n=2)
    assert res2["n"] == 2 and res2["c_mod_n"] == cexp % 2


def test_indicator_bn_trivial():
    res, C = _indicator_matches(ptt.models.bn(delta=0.6), [0])
    assert C == 0 and res["c_mod_n"] == 0


def test_indicator_rejects_spinful():
    with pytest.raises(PythtbError):
        symmetry.chern_indicator(ptt.models.kane_mele(), occ=[0, 1])


def test_indicator_rejects_asymmetric():
    m = ptt.tb_model(2, 2, [[1, 0], [0, 1]], [[0, 0], [0.3, 0.1]])
    m.set_onsite([0.4, -0.4])
    m.set_hop(0.7 + 0.2j, 0, 1, [0, 0])
    m.set_hop(0.3, 0, 1, [1, 0])
    with pytest.raises(PythtbError):
        symmetry.chern_indicator(m, occ=[0])


# ---------------------------------------------------------------------------
# symmetrize + fuzz


def _random_model(rng, lat, orb, nhop=6):
    m = ptt.tb_model(2, 2, lat, orb)
    norb = len(orb)
    m.set_onsite(list(rng.normal(size=norb)))
    placed = set()
    for _ in range(nhop):
        i, j = rng.integers(norb), rng.integers(norb)
        R = tuple(int(x) for x in rng.integers(-1, 2, size=2))
        if i == j and R == (0, 0):
            continue
        if i == j and (R[0] < 0 or (R[0] == 0 and R[1] < 0)):
            R = (-R[0], -R[1])  # canonical sign for diagonal bonds
        key = (min(i, j), max(i, j), R if i <= j else tuple(-x for x in R))
        if key in placed:
            continue
        placed.add(key)
        m.set_hop(rng.normal() + 1j * rng.normal(), int(i), int(j),
                  list(R))
    return m


def _square_rot(order):
    W4 = np.array([[0, 1], [-1, 0]])
    return {4: W4, 2: W4 @ W4}[order]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_symmetrize_square(seed):
    """Random square-lattice model group-averaged over C4 (or C2):
    find_symmetries recovers the rotation and the indicator matches
    the integrated Chern number mod n."""
    rng = np.random.default_rng(100 + seed)
    order = 4 if seed % 2 == 0 else 2
    orb = [[0.0, 0.0], [0.5, 0.5]]
    m = _random_model(rng, [[1, 0], [0, 1]], orb)
    W = _square_rot(order)
    pm = symmetry._orbit_map(np.asarray(orb), W, np.zeros(2))
    assert pm is not None
    op = symmetry.SymmetryOp(W, np.zeros(2), pm[0], pm[1],
                             np.asarray(m._lat), np.ones(2, complex))
    ops = [symmetry._op_power(op, k, np.asarray(m._lat))
           for k in range(1, order)]
    ms = symmetry.symmetrize(m, ops)
    found = symmetry.find_symmetries(ms)
    assert any(o.order == order and o.det > 0 for o in found)
    # gap check at a few k before trusting the indicator
    ev = ms.solve_all(np.random.default_rng(0).random((64, 2)))
    gap = float((ev[1] - ev[0]).min())
    if gap < 0.05:
        pytest.skip("near-degenerate draw; indicator needs a gap")
    _indicator_matches(ms, [0], nk=(61, 61))


@pytest.mark.parametrize("seed", [10, 11])
def test_fuzz_symmetrize_triangular_c3(seed):
    """Random honeycomb-geometry model averaged over C3."""
    rng = np.random.default_rng(seed)
    lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2.0]]
    orb = [[1 / 3.0, 1 / 3.0], [2 / 3.0, 2 / 3.0]]
    m = _random_model(rng, lat, orb)
    W = np.array([[-1, 1], [-1, 0]])  # C3 on the triangular lattice
    pm = symmetry._orbit_map(np.asarray(orb), W, np.zeros(2))
    assert pm is not None
    op = symmetry.SymmetryOp(W, np.zeros(2), pm[0], pm[1],
                             np.asarray(lat), np.ones(2, complex))
    ms = symmetry.symmetrize(m, [op, symmetry._op_power(
        op, 2, np.asarray(lat))])
    found = symmetry.find_symmetries(ms)
    assert any(o.order == 3 and o.det > 0 for o in found)
    ev = ms.solve_all(np.random.default_rng(0).random((64, 2)))
    if float((ev[1] - ev[0]).min()) < 0.05:
        pytest.skip("near-degenerate draw; indicator needs a gap")
    _indicator_matches(ms, [0], nk=(61, 61))


def test_symmetrize_is_projection():
    """Symmetrizing an already-symmetric model is the identity (same
    spectra at random k)."""
    h = ptt.models.haldane()
    ops = symmetry.find_symmetries(h)
    hs = symmetry.symmetrize(h, ops)
    ks = np.random.default_rng(3).random((16, 2))
    np.testing.assert_allclose(h.solve_all(ks), hs.solve_all(ks),
                               atol=1e-10)


def test_spinful_3d_raises():
    """nspin == 2 with dim != 2 must raise, not silently return []
    (the SU(2) factors are only built for the 2-D crystal classes;
    advisor finding, round 4)."""
    m = ptt.tb_model(3, 3, np.eye(3), [[0.0, 0.0, 0.0]], nspin=2)
    m.set_hop([0.5, 0.1, 0.0, 0.0], 0, 0, [1, 0, 0])
    m.set_hop([0.5, 0.0, 0.1, 0.0], 0, 0, [0, 1, 0])
    m.set_hop([0.5, 0.0, 0.0, 0.1], 0, 0, [0, 0, 1])
    with pytest.raises(PythtbError, match="2-D models only"):
        symmetry.find_symmetries(m)
