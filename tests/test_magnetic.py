"""Magnetic field / Peierls substitution tests.

The decisive oracle is gauge invariance of OPEN clusters: the spectrum
of a finite flake depends only on |t| of each hopping and the flux
through every closed loop of the hopping graph.  A brute-force Peierls
flake (phases from the unwrapped Landau gauge, computed here from first
principles, independently of pythtb_tpu.magnetic) must therefore match
the flake cut out of :func:`magnetic_supercell` output exactly, even
though the two use very different gauges.  This validates the
magnetic-translation correction term on models with fractional orbital
positions (graphene, Kane-Mele) and complex hoppings (Haldane).
"""

import copy

import numpy as np
import pytest

from pythtb_tpu import magnetic, tb_model
from pythtb_tpu.models import library as zoo
from pythtb_tpu import flows


def square_lattice(t=1.0):
    return zoo.square(t)


def brute_force_flake(model, n1, n2, phi, dirs=(0, 1)):
    """Finite (n1 x n2)-cell open flake of ``model`` with uniform flux
    ``phi`` per original (dirs) plaquette, phases applied brute-force in
    the unwrapped Landau gauge A = 2*pi*phi*x1*dx2.

    Completely independent of pythtb_tpu.magnetic: it cuts first (no
    periodicity left, so no magnetic-translation subtlety exists) and
    computes each phase from the orbital positions (cut_piece keeps the
    lattice vectors, so reduced coordinates stay in original-cell
    units, spanning 0..num along the cut directions).
    """
    d1, d2 = dirs
    flake = model.cut_piece(n1, d1).cut_piece(n2, d2)
    pos = flake._orb  # original-cell reduced units
    out = copy.deepcopy(flake)
    for h in out._hoppings:
        i, j = h[1], h[2]
        a1, a2 = pos[i, d1], pos[i, d2]
        b1, b2 = pos[j, d1], pos[j, d2]
        theta = 2.0 * np.pi * phi * 0.5 * (a1 + b1) * (b2 - a2)
        h[0] = np.asarray(h[0], dtype=complex) * np.exp(1.0j * theta)
    out._invalidate()
    return out


def msc_flake(model, n1, n2, p, q, dirs=(0, 1)):
    """The same physical flake built the other way: magnetic Bloch
    supercell first, then cut (n1 must be a multiple of q)."""
    assert n1 % q == 0
    msc = magnetic.magnetic_supercell(model, p, q, dirs=dirs)
    return msc.cut_piece(n1 // q, dirs[0]).cut_piece(n2, dirs[1])


def _sorted_evals(model):
    return np.sort(np.asarray(model.solve_all()).ravel())


@pytest.mark.parametrize(
    "p,q,n1,n2",
    [(1, 3, 6, 4), (2, 5, 5, 3), (-1, 4, 8, 3)],
)
def test_square_open_cluster_oracle(p, q, n1, n2):
    sq = square_lattice()
    ours = _sorted_evals(msc_flake(sq, n1, n2, p, q))
    oracle = _sorted_evals(brute_force_flake(sq, n1, n2, p / q))
    np.testing.assert_allclose(ours, oracle, atol=1e-10)


@pytest.mark.parametrize("p,q", [(1, 2), (1, 3)])
def test_honeycomb_fractional_positions_oracle(p, q):
    # graphene's orbitals sit at (1/3,1/3) and (2/3,2/3): hops have
    # non-integer x2 differences, exercising the magnetic-translation
    # gauge correction term
    g = zoo.graphene(t=-1.0, delta=0.2)
    ours = _sorted_evals(msc_flake(g, 2 * q, 3, p, q))
    oracle = _sorted_evals(brute_force_flake(g, 2 * q, 3, p / q))
    np.testing.assert_allclose(ours, oracle, atol=1e-10)


def test_haldane_complex_hops_oracle():
    # complex NNN amplitudes compose with the field phases
    h = zoo.haldane()
    ours = _sorted_evals(msc_flake(h, 4, 3, 1, 4))
    oracle = _sorted_evals(brute_force_flake(h, 4, 3, 1.0 / 4.0))
    np.testing.assert_allclose(ours, oracle, atol=1e-10)


def test_spinful_kane_mele_oracle():
    km = zoo.kane_mele()
    ours = _sorted_evals(msc_flake(km, 3, 2, 1, 3))
    oracle = _sorted_evals(brute_force_flake(km, 3, 2, 1.0 / 3.0))
    np.testing.assert_allclose(ours, oracle, atol=1e-10)


def test_gauge_direction_invariance():
    # enlarging along y with dirs=(1,0) gives flux of opposite sign;
    # open-cluster spectra at (p, dirs=(0,1)) and (-p, dirs=(1,0)) match
    g = zoo.graphene()
    a = _sorted_evals(msc_flake(g, 2, 4, 1, 2, dirs=(0, 1)))
    b = _sorted_evals(msc_flake(g, 4, 2, -1, 2, dirs=(1, 0)))
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_zero_flux_is_plain_supercell():
    g = zoo.graphene()
    msc = magnetic.magnetic_supercell(g, 0, 3)
    sc = g.make_supercell([[3, 0], [0, 1]], to_home_suppress_warning=True)
    k = np.array([[0.1, 0.2], [0.35, -0.4], [0.0, 0.0]])
    np.testing.assert_allclose(msc.solve_all(k), sc.solve_all(k), atol=1e-12)


def test_tknn_chern_numbers():
    # TKNN 1982: square lattice at flux 1/3 has band Chern numbers
    # (1, -2, 1)
    sq = square_lattice()
    msc = magnetic.magnetic_supercell(sq, 1, 3)
    c0 = flows.chern_number(msc, occ=[0], nk=(31, 31))
    c01 = flows.chern_number(msc, occ=[0, 1], nk=(31, 31))
    call = flows.chern_number(msc, occ=[0, 1, 2], nk=(31, 31))
    assert abs(c0 - 1.0) < 1e-6
    assert abs(c01 - (-1.0)) < 1e-6  # 1 + (-2)
    assert abs(call) < 1e-8


def test_denominator_consistency():
    # the same physical system at flux 1/2 built with q=2 and with
    # q=12 (p=6): eigenvalue multisets over commensurate k-meshes that
    # cover the same original-lattice k-set must agree exactly
    sq = square_lattice()
    f12, _ = magnetic.hofstadter_fn(sq, 12)
    f2, _ = magnetic.hofstadter_fn(sq, 2)
    k2s = [0.0, 0.17, 0.5]
    for k2 in k2s:
        k12 = np.array([[j / 2.0, k2] for j in range(2)])
        k2m = np.array([[j / 12.0, k2] for j in range(12)])
        a = np.sort(np.asarray(f12(np.array([6.0]), k12)).ravel())
        b = np.sort(np.asarray(f2(np.array([1.0]), k2m)).ravel())
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_butterfly_program_shapes_and_symmetries():
    sq = square_lattice()
    phis, evals = magnetic.hofstadter_butterfly(sq, 8, nk=4)
    assert evals.shape == (9, 16, 8)
    assert phis[0] == 0.0 and phis[-1] == 1.0
    # time reversal: spectrum at phi and 1-phi (= -phi) identical
    for i in range(9):
        np.testing.assert_allclose(
            np.sort(evals[i].ravel()), np.sort(evals[8 - i].ravel()), atol=1e-9
        )
    # zero-flux column: the nk=4 mesh covers orig k with k1 in m/8 and
    # k2 in m/4, so the free-band extrema +-4 are hit exactly
    assert abs(evals[0].min() - (-4.0)) < 1e-9 and abs(evals[0].max() - 4.0) < 1e-9


def test_peierls_model_ribbon_matches_supercell_route():
    # finite-direction route (any real flux) vs magnetic supercell
    # route, compared on the same open cluster
    sq = square_lattice()
    p, q, W, L = 1, 4, 4, 3
    # route A: ribbon finite along x, Peierls phases directly (reduced
    # coordinates stay in original-cell units after cut_piece)
    ribbon = sq.cut_piece(W, 0)
    pm = magnetic.peierls_model(ribbon, p / q, dirs=(0, 1))
    a = _sorted_evals(pm.cut_piece(L, 1))
    # route B: magnetic supercell then cut
    b = _sorted_evals(msc_flake(sq, W, L, p, q))
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_peierls_model_irrational_flux_runs():
    sq = square_lattice()
    ribbon = sq.cut_piece(6, 0)
    pm = magnetic.peierls_model(ribbon, 0.123456789, dirs=(0, 1))
    ev = pm.solve_all(np.linspace(0, 1, 5)[:, None])
    assert np.all(np.isfinite(ev)) and ev.shape == (6, 5)


def test_error_cases():
    sq = square_lattice()
    from pythtb_tpu import PythtbError

    with pytest.raises(PythtbError):
        magnetic.magnetic_supercell(sq, 1, 3, dirs=(0, 0))
    with pytest.raises(PythtbError):
        magnetic.magnetic_supercell(sq, 1.5, 3)
    with pytest.raises(PythtbError):
        magnetic.magnetic_supercell(sq, 1, 0)
    with pytest.raises(PythtbError):
        magnetic.peierls_model(sq, 0.3)  # dirs[0] periodic
    ribbon = sq.cut_piece(3, 0)
    with pytest.raises(PythtbError):
        magnetic.magnetic_supercell(ribbon, 1, 2, dirs=(0, 1))  # finite d1


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_random_models_oracle(seed):
    """Random 2-D models (random lattices, fractional orbital positions,
    complex hops, random rational flux): the magnetic-supercell route
    must reproduce the brute-force Peierls open cluster exactly."""
    rng = np.random.RandomState(100 + seed)
    norb = rng.randint(1, 4)
    lat = np.eye(2) * (1.0 + rng.rand(2)) + 0.3 * rng.randn(2, 2)
    if np.linalg.det(lat) < 0.3:
        lat = np.eye(2) * 1.5
    orb = rng.rand(norb, 2)
    m = tb_model(2, 2, lat=lat, orb=orb)
    m.set_onsite(rng.randn(norb))
    # candidate bonds with canonical orientation (no conjugate dupes)
    added = 0
    for _ in range(12):
        i, j = rng.randint(norb), rng.randint(norb)
        R = rng.randint(-1, 2, size=2)
        if (tuple(R) < (0, 0)) or (tuple(R) == (0, 0) and i >= j):
            continue
        amp = rng.randn() + 1j * rng.randn()
        try:
            m.set_hop(amp, i, j, R, mode="set")
            added += 1
        except Exception:
            pass
    if added == 0:
        m.set_hop(1.0, 0, 0, [1, 0])
    q = rng.randint(1, 5)
    p = rng.randint(-q, q + 1)
    n1 = q * rng.randint(1, 3)
    n2 = rng.randint(2, 4)
    ours = _sorted_evals(msc_flake(m, n1, n2, p, q))
    oracle = _sorted_evals(brute_force_flake(m, n1, n2, p / q))
    np.testing.assert_allclose(ours, oracle, atol=1e-9)
