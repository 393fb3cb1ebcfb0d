"""Oracle tests for the quantum-geometry module (pythtb_tpu.geometry).

Tiers:
- finite-difference projector oracle: Q_ab = Tr[dP (1-P) dP] with dP by
  central differences of the Convention-II (orbital-embedded) spectral
  projector -- fully gauge-invariant, shares NO code with the analytic
  velocity-matrix path;
- Chern consistency: the integrated curvature against the plaquette
  Chern engine (independent algorithms: analytic interband sums vs
  Wilson-loop link phases);
- Omega_I identity: the integrated metric trace against the
  Marzari-Vanderbilt b-shell discretization from pythtb_tpu.wannier
  (independent code path), including its O(b^2) convergence rate;
- pointwise inequalities tr g >= |Omega_xy| and det g >= Omega^2/4
  (single band), exact consequences of Cauchy-Schwarz on the QGT.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows, geometry

from .test_fuzz_new_subsystems import _random_2d


# ---------------------------------------------------------------------------
# finite-difference projector oracle
# ---------------------------------------------------------------------------


def _cII_states(model, k):
    """Eigenvectors rephased to the Convention-II (orbital-embedded,
    cell-periodic) gauge at one reduced k-point."""
    _, vec = model.solve_one(k, eig_vectors=True)
    vec = np.atleast_2d(np.asarray(vec))
    if vec.ndim == 3:  # spinful (nsta, norb, 2) -> flat spin-fastest
        vec = vec.reshape(vec.shape[0], -1)
    t = np.asarray(model._orb, dtype=np.float64)
    if model._nspin == 2:
        t = np.repeat(t, 2, axis=0)
    ph = np.exp(2.0j * np.pi * (t @ np.asarray(k, dtype=np.float64)))
    return vec * ph[None, :]


def _qgt_fd(model, k, group, delta=1e-5):
    """Gauge-invariant FD QGT: Q_ab = Tr[dP_a (1 - P) dP_b], dP by
    central differences of the band-group projector at Cartesian
    offsets delta."""
    lat = np.asarray(model._lat, dtype=np.float64)
    dim = model._dim_k

    def proj(kk):
        u = _cII_states(model, kk)
        return sum(np.outer(u[n], u[n].conj()) for n in group)

    dP = []
    for a in range(dim):
        dk_red = lat[:, a] * delta / (2.0 * np.pi)
        dP.append((proj(k + dk_red) - proj(k - dk_red)) / (2.0 * delta))
    P0 = proj(k)
    Qc = np.eye(P0.shape[0]) - P0
    Q = np.empty((dim, dim), dtype=complex)
    for a in range(dim):
        for b in range(dim):
            Q[a, b] = np.trace(dP[a] @ Qc @ dP[b])
    return Q


@pytest.mark.parametrize("seed", [3, 8, 21])
def test_fd_projector_oracle_random(seed):
    m = _random_2d(seed, norb=3)
    rng = np.random.default_rng(100 + seed)
    ks = rng.random((3, 2))
    for occ in ([0], [0, 1]):
        Q = geometry.quantum_geometric_tensor(m, ks, occ=occ)
        for i, k in enumerate(ks):
            Qfd = _qgt_fd(m, k, occ)
            assert np.abs(Q[i] - Qfd).max() < 1e-7
    # band-resolved: middle band vs everything else
    Qb = geometry.quantum_geometric_tensor(m, ks, bands=[1])
    for i, k in enumerate(ks):
        assert np.abs(Qb[i, 0] - _qgt_fd(m, k, [1])).max() < 1e-7


def test_fd_projector_oracle_spinful():
    m = ptt.models.kane_mele()
    ks = np.array([[0.11, 0.27], [0.37, 0.62]])
    Q = geometry.quantum_geometric_tensor(m, ks, occ=[0, 1])
    for i, k in enumerate(ks):
        assert np.abs(Q[i] - _qgt_fd(m, k, [0, 1])).max() < 1e-7


def test_fd_projector_oracle_1d():
    m = ptt.models.ssh(delta=0.3)
    ks = np.array([[0.08], [0.41]])
    Q = geometry.quantum_geometric_tensor(m, ks, occ=[0])
    for i, k in enumerate(ks):
        assert np.abs(Q[i] - _qgt_fd(m, k, [0])).max() < 1e-8


# ---------------------------------------------------------------------------
# Chern consistency and integrated geometry
# ---------------------------------------------------------------------------


def test_integrated_chern_matches_plaquette():
    h = ptt.models.haldane()
    res = geometry.integrated_metric(h, occ=[0], nk=(31, 31))
    C = flows.chern_number(h, occ=[0], nk=(31, 31))
    assert abs(res["chern"] - C) < 1e-6
    assert abs(C + 1.0) < 1e-8
    # trivial phase: Chern 0, but metric stays positive
    ht = ptt.models.haldane(delta=0.5, t2=0.05 * np.exp(0.2j))
    rt = geometry.integrated_metric(ht, occ=[0], nk=(31, 31))
    assert abs(rt["chern"]) < 1e-6
    assert rt["omega_i"] > 0.0


def test_integrated_curvature_trs_vanishes():
    km = ptt.models.kane_mele()
    r = geometry.integrated_metric(km, occ=[0, 1], nk=(25, 25))
    assert abs(r["chern"]) < 1e-10
    assert r["omega_i"] > 0.0
    # metric symmetric positive semidefinite
    g = r["metric"]
    assert np.abs(g - g.T).max() < 1e-12
    assert np.linalg.eigvalsh(g).min() > 0.0


def test_omega_i_matches_bshell_spread():
    """Integrated metric trace == MV gauge-invariant spread Omega_I
    computed by the INDEPENDENT b-shell finite-difference machinery in
    pythtb_tpu.wannier, converging at the O(b^2) rate."""
    from pythtb_tpu import wannier as wn

    def oi_bshell(model, occ, nk):
        static, data = model._get_finalized()
        lat = np.asarray(model._lat, dtype=np.float64)
        b_int, b_cart, w_b = wn._bshells(lat, list(range(model._dim_r)), nk)
        nbr = wn._neighbor_index(nk, b_int)
        t_orb = wn.WannierInterpolator._t_orb(model)
        u = wn.unpack_cplx(wn._grid_states_jit(
            static, data, tuple(nk), jnp.asarray(t_orb), tuple(occ)))
        S = jnp.einsum("kms,kbns->kbmn", jnp.conj(u), u[np.asarray(nbr)])
        _, oi, _ = wn._spread_terms(S, jnp.asarray(w_b), jnp.asarray(b_cart))
        return float(oi)

    h = ptt.models.haldane()
    errs = []
    for nk in [(12, 12), (24, 24)]:
        oi_fd = oi_bshell(h, [0], nk)
        oi_an = geometry.integrated_metric(h, occ=[0], nk=nk)["omega_i"]
        errs.append(abs(oi_fd - oi_an))
    assert errs[1] < 4e-3
    assert errs[0] / errs[1] > 3.0  # O(b^2): halving b cuts the error 4x

    # 1-D: SSH lower band
    s = ptt.models.ssh(delta=0.3)
    oi_fd = oi_bshell(s, [0], (64,))
    oi_an = geometry.integrated_metric(s, occ=[0], nk=(64,))["omega_i"]
    assert abs(oi_fd - oi_an) < 5e-4


@pytest.mark.parametrize("seed", [5, 17])
def test_pointwise_inequalities_fuzz(seed):
    m = _random_2d(seed, norb=3)
    rng = np.random.default_rng(200 + seed)
    ks = rng.random((40, 2))
    Q = geometry.quantum_geometric_tensor(m, ks, occ=[0])
    g = Q.real
    om = -2.0 * Q.imag
    trg = g[:, 0, 0] + g[:, 1, 1]
    assert (trg - np.abs(om[:, 0, 1])).min() > -1e-12
    det = g[:, 0, 0] * g[:, 1, 1] - g[:, 0, 1] * g[:, 1, 0]
    assert (det - om[:, 0, 1] ** 2 / 4.0).min() > -1e-12
    # metric/curvature convenience wrappers agree with the QGT parts
    np.testing.assert_allclose(
        geometry.quantum_metric(m, ks[:4], occ=[0]), g[:4], atol=1e-14)
    np.testing.assert_allclose(
        geometry.berry_curvature(m, ks[:4], occ=[0]), om[:4], atol=1e-14)


# ---------------------------------------------------------------------------
# guards and error surfaces
# ---------------------------------------------------------------------------


def test_degeneracy_warning():
    # gapless graphene: occupied/empty touch at the Dirac points, which
    # a 6x6 grid hits exactly
    g = ptt.models.haldane(delta=0.0, t2=0.0)
    with pytest.warns(UserWarning, match="degeneracy"):
        geometry.integrated_metric(g, occ=[0], nk=(6, 6))


def test_error_surfaces():
    h = ptt.models.haldane()
    ks = np.zeros((1, 2))
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, ks)  # neither
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, ks, occ=[0], bands=[0])
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, ks, occ=[0, 1])  # full space
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, ks, occ=[5])
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, np.zeros((1, 3)), occ=[0])
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(h, ks, bands="some")
    rib = h.cut_piece(3, 0)
    with pytest.raises(PythtbError):
        geometry.quantum_geometric_tensor(rib, np.zeros((1, 1)), occ=[0])
    with pytest.raises(PythtbError):
        geometry.integrated_metric(h, occ=[0], nk=(31,))


def test_band_list_selection():
    h = ptt.models.haldane()
    ks = np.array([[0.2, 0.3]])
    Qall = geometry.quantum_geometric_tensor(h, ks, bands="all")
    Q1 = geometry.quantum_geometric_tensor(h, ks, bands=[1])
    assert Qall.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(Qall[:, [1]], Q1, atol=1e-15)
    # two-band model: each band's abelian QGT has conjugate off-diagonal
    # structure (same metric, opposite curvature)
    np.testing.assert_allclose(Qall[:, 0].real, Qall[:, 1].real, atol=1e-12)
    np.testing.assert_allclose(Qall[:, 0].imag, -Qall[:, 1].imag, atol=1e-12)
