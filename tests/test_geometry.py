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


# ---------------------------------------------------------------------------
# superfluid weight
# ---------------------------------------------------------------------------


def _ds_torus_dense(model, mu, delta, L, h=1e-3, T=None):
    """Independent oracle: dense BdG on an L1 x L2 twisted torus built
    directly from the hop list (exact displacements; shares no code
    with assemble/device paths)."""
    T = delta / 50.0 if T is None else T
    lat = np.asarray(model._lat, dtype=np.float64)
    orb = np.asarray(model._orb, dtype=np.float64)
    norb = model._norb
    cells = np.array([(i, j) for i in range(L[0]) for j in range(L[1])])
    nc = len(cells)
    N = norb * nc

    def H_q(q):
        H = np.zeros((N, N), complex)
        for h_ in model._hoppings:
            amp, i, j, R = h_[0], h_[1], h_[2], np.asarray(h_[3])
            dvec = (orb[j] + R[:2] - orb[i]) @ lat
            ph = np.exp(1j * np.asarray(q) @ dvec)
            for c_idx, c in enumerate(cells):
                tc = (c + R[:2]) % [L[0], L[1]]
                t_idx = int(tc[0] * L[1] + tc[1])
                H[c_idx * norb + i, t_idx * norb + j] += amp * ph
                H[t_idx * norb + j, c_idx * norb + i] += np.conj(amp * ph)
        H += np.kron(np.eye(nc),
                     np.diag(np.asarray(model._site_energies, float)))
        return H

    def F(q):
        Hq = H_q(np.asarray(q))
        I = np.eye(N)
        bdg = np.zeros((2 * N, 2 * N), complex)
        bdg[:N, :N] = Hq - mu * I
        bdg[N:, N:] = -(np.conj(Hq) - mu * I)
        bdg[:N, N:] = delta * I
        bdg[N:, :N] = delta * I
        lam = np.linalg.eigvalsh(bdg)
        return (-T * np.sum(np.logaddexp(0, -lam / T))
                + np.real(np.trace(Hq)) - mu * N) / nc

    qs = [(0, 0), (h, 0), (-h, 0), (0, h), (0, -h),
          (h, h), (-h, -h), (h, -h), (-h, h)]
    Fv = np.array([F(q) for q in qs])
    D = np.array([
        [(Fv[1] + Fv[2] - 2 * Fv[0]) / h**2,
         (Fv[5] + Fv[6] - Fv[7] - Fv[8]) / (4 * h**2)],
        [(Fv[5] + Fv[6] - Fv[7] - Fv[8]) / (4 * h**2),
         (Fv[3] + Fv[4] - 2 * Fv[0]) / h**2],
    ])
    return D / abs(np.linalg.det(lat[:2, :2]))


def test_superfluid_weight_vs_twisted_torus():
    """k-space BdG stencil == dense twisted-torus BdG (independent
    construction) on matching grids, Lieb flat band + a random model."""
    lieb = ptt.models.lieb()
    Dk = geometry.superfluid_weight(lieb, 0.0, 0.3, nk=(6, 6))
    Dt = _ds_torus_dense(lieb, 0.0, 0.3, (6, 6))
    np.testing.assert_allclose(Dk, Dt, atol=1e-7)
    m = _random_2d(11, norb=2)
    mu = float(np.median(m.solve_all(np.random.default_rng(1).random((32, 2)))))
    Dk2 = geometry.superfluid_weight(m, mu, 0.4, nk=(5, 5))
    Dt2 = _ds_torus_dense(m, mu, 0.4, (5, 5))
    np.testing.assert_allclose(Dk2, Dt2, atol=1e-7)


def test_superfluid_weight_single_band_conventional():
    """One band has NO geometric part: at T ~ 0 the weight is the
    closed-form diamagnetic sum (1/A_c N) sum_k d2eps/dk2 * n_k with
    the BCS occupation n_k = (1 - xi/E)/2 -- an independent analytic
    route (no BdG, no stencil)."""
    sq = ptt.models.square(t=-1.0)  # eps = -2t(cos kx a + cos ky a)?
    static, _ = sq._get_finalized()
    assert static.nsta == 1
    lat = np.asarray(sq._lat)
    a_len = lat[0, 0]
    mu, delta = -1.0, 0.25
    nk = 48
    D = geometry.superfluid_weight(sq, mu, delta, nk=(nk, nk))
    ks = np.stack(np.meshgrid(np.arange(nk) / nk, np.arange(nk) / nk,
                              indexing="ij"), -1).reshape(-1, 2)
    eps = sq.solve_all(ks).ravel()
    xi = eps - mu
    n_k = 0.5 * (1.0 - xi / np.sqrt(xi**2 + delta**2))
    # d2 eps / dkx2 for eps = 2t cos(kx a) + 2t cos(ky a):
    t_amp = float(np.real(sq._hoppings[0][0]))
    d2eps = -2.0 * t_amp * (a_len**2) * np.cos(2 * np.pi * ks[:, 0])
    Ac = abs(np.linalg.det(lat[:2, :2]))
    # factor 2: the BdG free energy counts both spin species
    D_analytic = 2.0 * np.sum(d2eps * n_k) / (len(ks) * Ac)
    assert abs(D[0, 0] - D_analytic) < 2e-4 * max(abs(D_analytic), 1.0)
    assert abs(D[0, 1]) < 1e-8


def test_superfluid_weight_flat_band_geometric():
    """Lieb flat band at mu = 0: the conventional (dispersion) part is
    exactly zero, yet D_s > 0 -- carried by the quantum metric; it
    grows with delta and vanishes as delta -> 0."""
    lieb = ptt.models.lieb()
    D1 = geometry.superfluid_weight(lieb, 0.0, 0.3, nk=(24, 24))
    assert D1[0, 0] > 0.05
    np.testing.assert_allclose(D1[0, 0], D1[1, 1], atol=1e-6)  # C4
    assert np.linalg.eigvalsh(D1).min() > 0.0  # positive definite
    D_small = geometry.superfluid_weight(lieb, 0.0, 0.03, nk=(24, 24))
    assert 0.0 < D_small[0, 0] < 0.35 * D1[0, 0]


def test_superfluid_weight_trivial_insulator_vanishes():
    """Gapped trivial band, mu in the gap, delta << gap: D_s -> 0."""
    cb = ptt.models.checkerboard(delta=4.0, t=0.3)
    D = geometry.superfluid_weight(cb, 0.0, 0.02, nk=(16, 16))
    assert np.abs(D).max() < 1e-4
    with pytest.raises(PythtbError):
        geometry.superfluid_weight(cb, 0.0, -0.1)
    with pytest.raises(PythtbError):
        geometry.superfluid_weight(ptt.models.kane_mele(), 0.0, 0.1)


def test_drude_weight_vs_superfluid_limit():
    """Kohn/Leggett: for a clean TRS metal the delta -> 0 superfluid
    weight equals the Drude weight (band-curvature f-sum with the
    exact interband sum-rule term).  Isotropy and the insulator zero
    come along."""
    sq = ptt.models.square(t=-1.0)
    D = geometry.drude_weight(sq, -1.0, nk=(48, 48), temperature=0.02)
    Ds = geometry.superfluid_weight(sq, -1.0, 0.05, nk=(48, 48))
    assert abs(Ds[0, 0] / D[0, 0] - 1.0) < 5e-3
    assert abs(D[0, 0] - D[1, 1]) < 1e-10 and abs(D[0, 1]) < 1e-10
    # doped graphene (two bands, TRS): same limit
    g = ptt.models.graphene()
    Dg = geometry.drude_weight(g, -0.8, nk=(72, 72), temperature=0.03)
    Dsg = geometry.superfluid_weight(g, -0.8, 0.08, nk=(72, 72))
    # finite delta adds a small positive GEOMETRIC (interband metric)
    # piece on top of the Drude limit -- allow it, require closeness
    assert 0.0 < Dsg[0, 0] / Dg[0, 0] - 1.0 < 0.08
    # insulator: exactly zero band sum
    cb = ptt.models.checkerboard(delta=4.0, t=0.3)
    assert np.abs(geometry.drude_weight(cb, 0.0, nk=(24, 24))).max() < 1e-12


def test_superfluid_step_resolution_warning():
    """Regression: a twist step that cannot resolve delta/bandwidth
    silently underestimated D_s by ~13% -- now warns (fd path only;
    the analytic default has no step)."""
    sq = ptt.models.square(t=-1.0)
    with pytest.warns(UserWarning, match="underestimate"):
        geometry.superfluid_weight(sq, -1.0, 0.002, nk=(8, 8),
                                   method="fd")


def test_superfluid_analytic_matches_fd():
    """The analytic (Daleckii-Krein) Hessian == the finite-difference
    stencil at its own truncation level, gapped and metallic cases.
    The analytic route exists because the fd stencil cancels to zero
    in f32 on hardware (measured: Lieb D_xx read 0.0; analytic reads
    0.2116625 vs the 0.211662 x64 pin)."""
    lieb = ptt.models.lieb()
    Da = geometry.superfluid_weight(lieb, 0.0, 0.3, nk=(12, 12))
    Df = geometry.superfluid_weight(lieb, 0.0, 0.3, nk=(12, 12),
                                    method="fd")
    np.testing.assert_allclose(Da, Df, atol=5e-7)
    sq = ptt.models.square(t=-1.0)
    Da2 = geometry.superfluid_weight(sq, -0.7, 0.22, nk=(18, 18))
    Df2 = geometry.superfluid_weight(sq, -0.7, 0.22, nk=(18, 18),
                                     method="fd")
    np.testing.assert_allclose(Da2, Df2, atol=1e-6)


def test_drude_spin_convention():
    """Regression (review): an explicit-spin copy of a spinless model
    must give the SAME Drude weight (its states already count both
    spins)."""
    sq1 = ptt.models.square(t=-1.0)
    sq2 = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]],
                       nspin=2)
    sq2.set_hop([-1.0, 0.0, 0.0, 0.0], 0, 0, [1, 0])
    sq2.set_hop([-1.0, 0.0, 0.0, 0.0], 0, 0, [0, 1])
    D1 = geometry.drude_weight(sq1, -1.0, nk=(24, 24), temperature=0.05)
    D2 = geometry.drude_weight(sq2, -1.0, nk=(24, 24), temperature=0.05)
    np.testing.assert_allclose(D1, D2, atol=1e-10)
