"""Band-unfolding oracles: pristine exactness, Parseval sum rule,
disorder smearing, nontrivial (off-diagonal) supercell matrices,
spinful layout."""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import unfold
from pythtb_tpu.model import PythtbError


def _pristine_check(model, M, kpts, atol=1e-8):
    """Unfolding a pristine supercell must reproduce the primitive
    bands with unit weight and leave every folded image at zero.

    Degeneracy-aware: when a folded image happens to be degenerate with
    the target band (e.g. a TRS partner image), eigh mixes the
    eigenspace and only the TOTAL weight inside it is well-defined --
    so weights are compared as sums over energy clusters."""
    sc = model.make_supercell(M)
    evals, w = unfold.unfold_bands(sc, M, kpts)
    prim = model.solve_all(kpts).T  # (nk, nsta_prim)
    nsta_p = prim.shape[1]
    for b in range(kpts.shape[0]):
        # Parseval: total weight = number of primitive states
        np.testing.assert_allclose(w[b].sum(), nsta_p, atol=1e-9)
        # per distinct primitive energy: clustered weight = multiplicity
        left = np.ones(evals.shape[1], dtype=bool)
        for e0 in np.unique(np.round(prim[b], 9)):
            mult = int(np.sum(np.abs(prim[b] - e0) < 1e-8))
            sel = np.abs(evals[b] - e0) < 1e-7
            assert sel.any(), "no supercell state at primitive E=%g" % e0
            np.testing.assert_allclose(w[b][sel].sum(), mult, atol=atol)
            left &= ~sel
        # every state outside the primitive energies carries nothing
        if left.any():
            assert np.abs(w[b][left]).max() < atol


def test_pristine_chain():
    m = ptt.models.chain(t=-1.0)
    kpts = np.array([[0.05], [0.17], [0.33], [0.41]])
    _pristine_check(m, np.array([[3]]), kpts)


def test_pristine_graphene_diag():
    m = ptt.models.graphene()
    kpts = np.array([[0.1, 0.2], [0.31, 0.05], [0.45, 0.41]])
    _pristine_check(m, np.diag([2, 3]), kpts)


def test_pristine_offdiagonal_supercell():
    """Non-diagonal M (sqrt(5) x sqrt(5) cell) exercises the generic
    K = k M^T mapping and the wrap bookkeeping."""
    m = ptt.models.graphene(delta=0.3)
    kpts = np.array([[0.12, 0.07], [0.4, 0.33]])
    _pristine_check(m, np.array([[2, 1], [-1, 2]]), kpts)


def test_pristine_spinful():
    m = ptt.models.kane_mele()
    kpts = np.array([[0.15, 0.22], [0.4, 0.1]])
    _pristine_check(m, np.diag([2, 2]), kpts)


def test_degenerate_fold_weight_split():
    """At a k where two primitive images are degenerate, eigh returns an
    arbitrary mix -- but the TOTAL weight in the degenerate space and
    the Parseval sum must survive."""
    m = ptt.models.chain(t=-1.0)
    M = np.array([[2]])
    sc = m.make_supercell(M)
    # k = 0.25: images k and k - 0.5 give E = -2cos(2pi*0.25) = 0 twice
    evals, w = unfold.unfold_bands(sc, M, np.array([[0.25]]))
    np.testing.assert_allclose(w[0].sum(), 1.0, atol=1e-9)
    np.testing.assert_allclose(evals[0], [0.0, 0.0], atol=1e-12)


def test_disorder_smearing_and_sum_rule():
    """Weak onsite disorder: the sum rule is exact regardless, weights
    stay concentrated near the pristine bands, and the weighted mean
    energy tracks the primitive value."""
    rng = np.random.default_rng(0)
    m = ptt.models.graphene(delta=0.6)
    M = np.diag([3, 3])
    sc = m.make_supercell(M)
    sc.set_onsite(0.1 * rng.standard_normal(sc._norb), mode="add")
    kpts = np.array([[0.2, 0.1], [0.37, 0.42]])
    evals, w = unfold.unfold_bands(sc, M, kpts)
    prim = m.solve_all(kpts).T
    for b in range(2):
        np.testing.assert_allclose(w[b].sum(), 2.0, atol=1e-9)
        for band in range(2):
            e0 = prim[b][band]
            sel = np.abs(evals[b] - e0) < 0.5
            assert w[b][sel].sum() > 0.9  # weight stays near the band
            emean = (w[b][sel] * evals[b][sel]).sum() / w[b][sel].sum()
            assert abs(emean - e0) < 0.05


def test_unfold_errors():
    m = ptt.models.graphene()
    sc = m.make_supercell(np.diag([2, 2]))
    with pytest.raises(PythtbError):
        unfold.unfold_bands(sc, np.diag([2, 2, 2]), np.zeros((1, 2)))
    with pytest.raises(PythtbError):
        unfold.unfold_bands(sc, np.diag([3, 3]), np.zeros((1, 2)))
    with pytest.raises(PythtbError):
        unfold.unfold_bands(sc, np.diag([2, 2]), np.zeros((1, 3)))
    with pytest.raises(PythtbError):
        unfold.unfold_bands(sc, np.diag([2, 2]), np.zeros((1, 2)),
                            orbital_map=np.zeros(5, dtype=int))
