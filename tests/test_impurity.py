"""Oracles for impurity embedding (pythtb_tpu.impurity).

The k-grid Green's function with nk = L is ALGEBRAICALLY identical to
the matrix inverse on an L x L glued torus (same momentum content), so
both G0 and the embedded G have exact dense oracles at 1e-10 -- no
finite-size tolerance needed.  Physics tiers: in-gap bound-state
energies vs dense impurity flakes, LDOS positivity, attraction/
repulsion symmetry of the gapped host.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, impurity
from pythtb_tpu.ops.matvec import sparse_h, to_dense

from . import zoo


def _torus_dense_g(model, L, energies, eta, sites, V_at=None):
    """Dense (E + i eta - H)^{-1} on an L1 x L2 glued torus, restricted
    to ``sites`` (home-cell state indices); optionally add the cluster
    perturbation ``V_at`` (matrix over those sites) first."""
    fl = model.cut_piece(L[0], 0, glue_edgs=True).cut_piece(
        L[1], 1, glue_edgs=True)
    H = to_dense(sparse_h(fl))
    # cut_piece cell ordering: home cell (R = 0) comes first, so the
    # home-cell orbital i sits at flat index i
    if V_at is not None:
        for a, sa in enumerate(sites):
            for b, sb in enumerate(sites):
                H[sa, sb] += V_at[a, b]
    out = []
    eye = np.eye(H.shape[0])
    for E in np.atleast_1d(energies):
        G = np.linalg.inv((E + 1j * eta) * eye - H)
        out.append(G[np.ix_(sites, sites)])
    return np.stack(out)


def test_g0_exact_torus_identity():
    """nk = L makes the k-sum G0 equal the dense torus inverse
    exactly, including inter-cell (R != 0) cluster entries."""
    m = zoo.haldane(ptt)
    L = (6, 5)
    cluster = [0, 1, ([1, 0], 0)]
    energies = np.array([-0.7, 0.2, 1.4])
    eta = 0.05
    G0 = impurity.host_greens_function(m, energies, cluster, nk=L, eta=eta)
    # torus flat indices: cut_piece-of-cut_piece orders the FIRST cut
    # direction fastest, so cell (c0, c1) orbital o sits at
    # (c1 * L0 + c0) * norb + o; cell (1, 0) orb 0 -> index 2
    sites = [0, 1, 2]
    ref = _torus_dense_g(m, L, energies, eta, sites)
    np.testing.assert_allclose(G0, ref, atol=1e-10)


def test_g0_spinful_torus_identity():
    km = zoo.kane_mele(ptt)
    L = (4, 4)
    G0 = impurity.host_greens_function(km, np.array([0.3]), [0, 1],
                                       nk=L, eta=0.08)
    sites = [0, 1, 2, 3]  # two orbitals x two spins, spin-fastest
    ref = _torus_dense_g(km, L, np.array([0.3]), 0.08, sites)
    np.testing.assert_allclose(G0, ref, atol=1e-10)


def test_embedded_g_exact_torus_identity():
    """G = G0 + G0 T G0 equals the dense inverse of the torus WITH the
    impurity inserted -- exact at nk = L."""
    m = ptt.models.bn(delta=1.0)
    L = (6, 6)
    V = np.array([[3.0, 0.4 - 0.2j], [0.4 + 0.2j, -1.0]])
    cluster = [0, 1]
    energies = np.array([-0.5, 0.1, 0.8])
    eta = 0.03
    G, T = impurity.t_matrix(m, V, energies, cluster, nk=L, eta=eta)
    ref = _torus_dense_g(m, L, energies, eta, [0, 1], V_at=V)
    np.testing.assert_allclose(G, ref, atol=1e-10)
    # LDOS positivity
    assert (-np.imag(np.diagonal(G, axis1=1, axis2=2)) / np.pi).min() > 0


@pytest.mark.parametrize("U,orb,pin", [
    (+2.5, 0, -0.09976), (-2.5, 1, +0.09976), (+6.0, 0, +0.63562),
])
def test_bound_states_vs_dense_flake(U, orb, pin):
    """In-gap levels of a single-site impurity in gapped BN: T-matrix
    embedding vs a 24x24 glued dense flake (and chiral symmetry of the
    +U-on-anion / -U-on-cation pair)."""
    bn = ptt.models.bn(delta=1.0)
    roots = impurity.bound_states(bn, np.array([[U]]), [orb],
                                  (-0.95, 0.95), nk=(64, 64))
    assert len(roots) == 1
    assert abs(roots[0] - pin) < 2e-5
    fl = bn.cut_piece(24, 0, glue_edgs=True).cut_piece(24, 1,
                                                       glue_edgs=True)
    fl.set_onsite(U, 2 * (24 * 12 + 12) + orb, mode="add")
    w = np.sort(fl.solve_all())
    ing = w[np.abs(w) < 0.95]
    assert len(ing) == 1
    assert abs(roots[0] - ing[0]) < 1e-4


def test_bound_state_count_multisite():
    """A two-site impurity can bind two states; the eigenvalue-count
    scanner finds both (det-sign scanning would miss even crossings at
    degeneracy)."""
    bn = ptt.models.bn(delta=1.0)
    V = np.diag([6.0, 6.0])
    cluster = [0, ([1, 0], 0)]
    roots = impurity.bound_states(bn, V, cluster, (-0.95, 0.95),
                                  nk=(48, 48))
    assert len(roots) == 2
    fl = bn.cut_piece(24, 0, glue_edgs=True).cut_piece(24, 1,
                                                       glue_edgs=True)
    c0 = 2 * (24 * 12 + 12)
    fl.set_onsite(6.0, c0 + 0, mode="add")
    fl.set_onsite(6.0, c0 + 2, mode="add")  # cell (13, 12), orb 0
    w = np.sort(fl.solve_all())
    ing = w[np.abs(w) < 0.95]
    assert len(ing) == 2
    np.testing.assert_allclose(roots, ing, atol=5e-4)


def test_errors():
    bn = ptt.models.bn()
    with pytest.raises(PythtbError):
        impurity.host_greens_function(bn, [0.0], [5])
    with pytest.raises(PythtbError):
        impurity.t_matrix(bn, np.array([[1j]]), [0.0], [0])
    with pytest.raises(PythtbError):
        impurity.t_matrix(bn, np.eye(3), [0.0], [0])
    with pytest.raises(PythtbError):
        impurity.bound_states(bn, np.eye(1), [0], (1.0, -1.0))
    with pytest.raises(PythtbError):
        impurity.host_greens_function(
            bn.cut_piece(3, 0, glue_edgs=False).cut_piece(
                3, 1, glue_edgs=False), [0.0], [0])


def test_bound_states_near_degenerate_pair_separated():
    """Regression (code review): two DISTINCT levels inside one scan
    interval must come back as two different energies (the recursive
    bracket refinement), and non-periodic cluster R components must be
    rejected."""
    bn = ptt.models.bn(delta=1.0)
    # weakly split two-site impurity: levels ~1e-3 apart
    V = np.diag([6.0, 6.0])
    cluster = [0, ([3, 0], 0)]
    roots = impurity.bound_states(bn, V, cluster, (-0.95, 0.95),
                                  nk=(48, 48), n_scan=5)
    assert len(roots) == 2
    assert abs(roots[1] - roots[0]) > 1e-6  # genuinely separated
    fine = impurity.bound_states(bn, V, cluster, (-0.95, 0.95),
                                 nk=(48, 48), n_scan=301)
    np.testing.assert_allclose(roots, fine, atol=1e-7)
    # non-periodic R rejection (dim_r = 3, dim_k = 2 host)
    from pythtb_tpu.models import moire

    g = moire.sk_graphene()
    with pytest.raises(PythtbError, match="non-periodic"):
        impurity.host_greens_function(g, [0.0], [([0, 0, 1], 0)],
                                      nk=(8, 8))
