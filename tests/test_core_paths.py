"""Equivalence of the alternative assembly code paths.

The dense-pattern matmul is the default; very large models fall back to
scatter-add (core.finalize use_pattern=False).  Both must produce
identical Hamiltonians for spinless and spinful models.
"""

import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import core
from pythtb_tpu.ops import solver

from . import zoo


def _both_paths(model, kpts):
    amps = [h[0] for h in model._hoppings]
    his = [h[1] for h in model._hoppings]
    hjs = [h[2] for h in model._hoppings]
    hRs = [h[3] for h in model._hoppings]
    out = []
    for use_pattern in (True, False):
        static, data = core.finalize(
            model._dim_k, model._dim_r, model._per, model._nspin, model._norb,
            model._orb, model._site_energies, amps, his, hjs, hRs,
            use_pattern=use_pattern,
        )
        assert static.use_pattern == use_pattern
        out.append(solver.hamiltonian_kpts(static, data, kpts))
    return out


def test_scatter_matches_pattern_spinless():
    m = zoo.haldane(ptt)
    k = np.random.RandomState(0).rand(9, 2)
    Hp, Hs = _both_paths(m, k)
    np.testing.assert_allclose(Hp, Hs, atol=1e-13)
    # hermitian
    np.testing.assert_allclose(Hs, np.conj(np.swapaxes(Hs, -1, -2)), atol=1e-13)


def test_scatter_matches_pattern_spinful():
    m = zoo.kane_mele(ptt, "odd")
    k = np.random.RandomState(1).rand(7, 2)
    Hp, Hs = _both_paths(m, k)
    np.testing.assert_allclose(Hp, Hs, atol=1e-13)
    np.testing.assert_allclose(Hs, np.conj(np.swapaxes(Hs, -1, -2)), atol=1e-13)


def test_solve_large_model_uses_scatter():
    """A model big enough to exceed the pattern budget still solves
    correctly (spectra match a down-thresholded pattern solve)."""
    import pythtb_tpu.config as cfg

    m = zoo.haldane(ptt).cut_piece(12, 0).cut_piece(12, 1)  # norb=288
    static, _ = m._get_finalized()
    # 12 hops/cell * 144 cells-ish -> pattern fine normally; force paths
    e_default = m.solve_all()
    old = cfg.PATTERN_MAX_ELEMS
    try:
        cfg.PATTERN_MAX_ELEMS = 1  # force scatter
        m._invalidate()
        e_scatter = m.solve_all()
        assert m._get_finalized()[0].use_pattern is False
    finally:
        cfg.PATTERN_MAX_ELEMS = old
        m._invalidate()
    np.testing.assert_allclose(e_default, e_scatter, atol=1e-12)


def test_analytic_2x2_eigh_stress():
    """Closed-form 2x2 Hermitian eigendecomposition vs LAPACK on random,
    near-degenerate, and exactly-degenerate matrices."""
    import jax
    import jax.numpy as jnp

    from pythtb_tpu.ops.eigh import eigh_batched

    rng = np.random.RandomState(0)
    B = 20000
    a = rng.randn(B)
    b = rng.randn(B)
    c = rng.randn(B) + 1j * rng.randn(B)
    # adversarial groups: near-degenerate (tiny c), tiny delta, exact degenerate
    c[:2000] *= 1e-12
    a[2000:4000] = b[2000:4000] + rng.randn(2000) * 1e-12
    a[4000:5000] = b[4000:5000]
    c[4000:5000] = 0.0
    H = np.zeros((B, 2, 2), complex)
    H[:, 0, 0] = a
    H[:, 1, 1] = b
    H[:, 0, 1] = c
    H[:, 1, 0] = np.conj(c)

    w, v = jax.jit(eigh_batched)(jnp.asarray(H))
    w = np.asarray(w)
    v = np.asarray(v)
    w_ref = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(w, w_ref, atol=1e-12)
    # rows are states: residual and orthonormality
    resid = np.einsum("bij,bsj->bsi", H, v) - w[:, :, None] * v
    assert np.abs(resid).max() < 1e-10
    gram = np.einsum("bsi,bti->bst", v.conj(), v)
    assert np.abs(gram - np.eye(2)).max() < 1e-12
