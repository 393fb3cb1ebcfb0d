"""Random-model fuzz tiers for the round-3 subsystems, mirroring the
package's oracle-fuzz tradition (fixed committed seeds for
determinism; the end-of-round burn-in sweeps fresh seeds).

Every case is a DIFFERENTIAL oracle -- two independent algorithms for
the same quantity -- not a smoke check:
- Floquet: truncated extended-zone matrix vs the exact one-period
  propagator (circle metric);
- shift current: sum-rule generalized derivative vs finite-difference
  covariant derivative in a smoothed gauge;
- unfolding: pristine supercell cluster weights vs primitive bands;
- entanglement: Peschel products vs an exact Fock-space partial trace;
- Berry dipole: Fermi-surface form vs the integration-by-parts
  curvature-gradient form.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu import entanglement, flows, floquet, optical, unfold

from .test_entanglement import _exact_rdm_spectrum
from .test_floquet import _assert_circle_close, _zone_copy
from .test_shift_current import _band_data, _fd_gen_derivative_1d
from .test_unfold import _pristine_check

# committed-seed burn-in tier: redundant-by-design coverage, excluded
# from the default (<15 min) driver gate; run with -m '' for the full tier
pytestmark = pytest.mark.slow


def _random_1d(seed, norb=None):
    rng = np.random.default_rng(seed)
    norb = norb or int(rng.integers(2, 4))
    m = ptt.tb_model(1, 1, lat=[[1.0 + 0.3 * rng.random()]],
                     orb=rng.uniform(0.0, 1.0, (norb, 1)))
    m.set_onsite(rng.standard_normal(norb))
    for i in range(norb):
        j = (i + 1) % norb
        R = [1] if j <= i else [0]
        m.set_hop(rng.standard_normal() + 1j * rng.standard_normal(),
                  i, j, R)
    if rng.random() < 0.5:
        m.set_hop(0.5 * rng.standard_normal(), 0, 0, [1])
    return m


def _random_2d(seed, norb=2):
    rng = np.random.default_rng(seed)
    lat = np.eye(2) + 0.2 * rng.standard_normal((2, 2))
    m = ptt.tb_model(2, 2, lat=lat, orb=rng.uniform(0, 1, (norb, 2)))
    m.set_onsite(rng.standard_normal(norb))
    hops = [(0, 1, [0, 0]), (0, 1, [1, 0]), (0, 1, [0, 1]),
            (0, 0, [1, 0]), (1, 1, [0, 1])]
    for i, j, R in hops:
        if i == j:
            m.set_hop(0.5 * rng.standard_normal(), i, j, R)
        else:
            m.set_hop(rng.standard_normal() + 1j * rng.standard_normal(),
                      i, j, R)
    return m


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
def test_fuzz_floquet_matrix_vs_propagator(seed):
    rng = np.random.default_rng(1000 + seed)
    m = _random_1d(seed)
    omega = float(rng.uniform(2.5, 6.0))
    drive = {"A": [float(rng.uniform(0.2, 1.0))],
             "phase": [float(rng.uniform(0, 2 * np.pi))]}
    kpts = rng.uniform(0, 1, (4, 1))
    quasi, wgt = floquet.quasienergies(m, omega, drive, kpts, nharm=8)
    approx = _zone_copy(quasi, wgt, m._nsta, omega)
    exact = floquet.quasienergies_exact(m, omega, drive, kpts, nt=4096)
    _assert_circle_close(approx, exact, omega, 1e-5)


@pytest.mark.parametrize("seed", [21, 22, 23, 24, 25, 26, 27, 28])
def test_fuzz_shift_sum_rule_vs_fd(seed):
    rng = np.random.default_rng(2000 + seed)
    m = _random_1d(seed)
    for _ in range(2):
        k0 = float(rng.uniform(0.05, 0.95))
        evals, _, V, W2 = _band_data(m, np.array([[k0]]))
        # FD covariant derivatives blow up near degeneracies; skip
        # near-degenerate draws (the masked sum rule is fine there,
        # but the oracle itself is not)
        E = evals[0]
        if np.min(np.abs(E[:, None] - E[None, :])[~np.eye(len(E), dtype=bool)]) < 0.05:
            continue
        _, rgen_sr = optical._gen_derivative(
            jnp.asarray(evals), jnp.asarray(V), jnp.asarray(W2), 1e-7
        )
        _, rgen_fd = _fd_gen_derivative_1d(m, k0)
        off = ~np.eye(len(E), dtype=bool)
        np.testing.assert_allclose(
            np.asarray(rgen_sr)[0, 0, 0][off], rgen_fd[off],
            atol=1e-5 * max(1.0, np.abs(rgen_fd).max()),
        )


@pytest.mark.parametrize("seed", [31, 32, 33, 34, 35, 36])
def test_fuzz_unfold_pristine(seed):
    rng = np.random.default_rng(3000 + seed)
    m = _random_2d(seed)
    mats = [np.diag([2, 2]), np.diag([3, 2]), np.array([[2, 1], [-1, 2]]),
            np.array([[1, 1], [-1, 2]])]
    M = mats[int(rng.integers(0, len(mats)))]
    kpts = rng.uniform(0.02, 0.98, (3, 2))
    _pristine_check(m, M, kpts, atol=1e-7)


@pytest.mark.parametrize("seed", [41, 42, 43, 44, 45, 46])
def test_fuzz_entanglement_fock_oracle(seed):
    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(4, 7))
    m = ptt.tb_model(0, 1, lat=[[1.0]],
                     orb=[[i / n] for i in range(n)])
    m.set_onsite(rng.standard_normal(n))
    for i in range(n - 1):
        m.set_hop(rng.standard_normal() + 1j * rng.standard_normal(),
                  i, i + 1)
    if n > 4:
        m.set_hop(0.4 * rng.standard_normal(), 0, n - 1)
    nocc = int(rng.integers(1, n))
    nA = int(rng.integers(1, n))
    sites = sorted(rng.choice(n, size=nA, replace=False).tolist())
    xi = entanglement.correlation_spectrum(m, nocc, sites)
    levels = [1.0]
    for x in xi:
        levels = [l * (1.0 - x) for l in levels] + [l * x for l in levels]
    pred = np.sort(np.array(levels))[::-1]
    exact = _exact_rdm_spectrum(m, nocc, sites)
    k = min(len(pred), len(exact))
    np.testing.assert_allclose(pred[:k], exact[:k], atol=1e-9)


@pytest.mark.parametrize("seed", [51, 52, 53, 54])
def test_fuzz_dipole_vs_gradient(seed):
    rng = np.random.default_rng(5000 + seed)
    m = _random_2d(seed + 100)
    # the FD-gradient oracle converges O(h^2) toward the Fermi-surface
    # form (measured: 3.3% / 0.8% / 0.2% at 101/201/401); 201^2 with a
    # 2% tolerance keeps the tier cheap and discriminating
    nk = (201, 201)
    E_probe = m.solve_all(rng.uniform(0, 1, (64, 2)))
    # a small direct gap concentrates the curvature into a feature the
    # central-difference oracle cannot resolve at this grid; skip such
    # draws (the guard mirrors the shift-current FD fuzz)
    if (E_probe[1] - E_probe[0]).min() < 0.3:
        pytest.skip("near-degenerate draw: FD curvature oracle unreliable")
    mu = float(rng.uniform(E_probe.min(), E_probe.max()))
    T = 0.1
    d_pkg = flows.berry_dipole(m, mu, T, nk=nk)
    from .test_nonlinear_geometry import _curvature_grid

    E, om, lat = _curvature_grid(m, nk)
    f = 1.0 / (np.exp(np.clip((E - mu) / T, -80, 80)) + 1.0)
    dom_red = np.stack([
        (np.roll(om, -1, axis=d) - np.roll(om, 1, axis=d)) * (nk[d] / 2.0)
        for d in range(2)
    ])
    dom_cart = np.einsum("ra,rijs->aijs", lat / (2.0 * np.pi), dom_red)
    d_fd = np.einsum("ijs,aijs->a", f, dom_cart) / (
        nk[0] * nk[1] * abs(np.linalg.det(lat))
    )
    scale = max(np.abs(d_fd).max(), 1e-6)
    np.testing.assert_allclose(d_fd, d_pkg, atol=2e-2 * scale)


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_fuzz_dynamics_evolve_vs_dense(seed):
    """Chebyshev propagation == dense eigendecomposition evolution on
    random finite chains (random hop graph, complex amplitudes)."""
    from pythtb_tpu import dynamics
    from pythtb_tpu.ops.matvec import sparse_h, to_dense

    rng = np.random.default_rng(seed)
    m = _random_1d(seed, norb=3).cut_piece(6, 0, glue_edgs=False)
    n = m._nsta
    psi0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    psi0 /= np.linalg.norm(psi0)
    times = np.linspace(0.6, 4.2, 7)
    out = dynamics.evolve(m, psi0, times)
    H = to_dense(sparse_h(m))
    w, v = np.linalg.eigh(H)
    c0 = v.conj().T @ psi0
    ref = np.stack([v @ (np.exp(-1j * w * t) * c0) for t in times])
    assert np.abs(out - ref).max() < 1e-9


@pytest.mark.parametrize("seed", [51, 52])
def test_fuzz_impurity_g0_torus_identity(seed):
    """Random 2-D host: k-sum G0 == dense glued-torus inverse exactly
    at nk = L (phase convention under random orbital positions)."""
    from pythtb_tpu import impurity
    from .test_impurity import _torus_dense_g

    m = _random_2d(seed, norb=3)
    L = (5, 4)
    Es = np.array([-0.8, 0.4])
    G0 = impurity.host_greens_function(
        m, Es, [0, 2, ([0, 1], 1)], nk=L, eta=0.07)
    # cell (0, 1) orb 1 -> flat (1 * L0 + 0) * norb + 1 = 16
    ref = _torus_dense_g(m, L, Es, 0.07, [0, 2, 1 * L[0] * 3 + 1])
    np.testing.assert_allclose(G0, ref, atol=1e-10)


@pytest.mark.parametrize("seed", [61, 62])
def test_fuzz_superfluid_k_vs_torus(seed):
    """Random 2-D host at a random in-band mu: analytic Daleckii-Krein
    BdG Hessian == dense twisted-torus construction.

    Regression note (round 4 -> 5): the torus oracle is itself an
    O(h^2) central-difference Hessian; at h = 1e-3 its truncation error
    reaches 3.5e-6 on some draws (seed 62), which is NOT an error in
    the analytic path -- halving h shrank the disagreement exactly 4x
    and the analytic value matches the Richardson-extrapolated oracle
    at 3.5e-8.  The oracle is therefore Richardson-extrapolated here
    (two steps, O(h^4)) so the 1e-7 tolerance tests the library, not
    the oracle's stencil."""
    from pythtb_tpu import geometry
    from .test_geometry import _ds_torus_dense

    rng = np.random.default_rng(seed)
    m = _random_2d(seed, norb=2)
    ev = m.solve_all(rng.random((64, 2)))
    mu = float(np.quantile(ev, rng.uniform(0.2, 0.8)))
    delta = float(rng.uniform(0.15, 0.5))
    Dk = geometry.superfluid_weight(m, mu, delta, nk=(5, 5))
    D1 = _ds_torus_dense(m, mu, delta, (5, 5), h=1e-3)
    D2 = _ds_torus_dense(m, mu, delta, (5, 5), h=5e-4)
    Dt = (4.0 * D2 - D1) / 3.0
    np.testing.assert_allclose(Dk, Dt, atol=1e-7)


# ---- round-4 subsystems: spectrum slices + mean field -----------------

@pytest.mark.parametrize("seed", [41, 42, 43, 44])
def test_fuzz_sparse_h_k_matches_assemble(seed):
    """Random periodic models: the Bloch ELL table equals the dense
    assembly path exactly at a random k."""
    from pythtb_tpu.ops.hamiltonian import assemble
    from pythtb_tpu.ops.matvec import sparse_h_k, to_dense

    rng = np.random.default_rng(seed)
    m = _random_2d(seed) if seed % 2 else _random_1d(seed)
    k = rng.uniform(-1.0, 1.0, m._dim_k)
    static, data = m._get_finalized()
    H_ref = np.asarray(assemble(static, data, np.asarray([k])))[0]
    h = sparse_h_k(m, k)
    np.testing.assert_allclose(to_dense(h), H_ref, atol=1e-13)
    ev = np.linalg.eigvalsh(H_ref)
    assert h.window[0] <= ev.min() + 1e-12
    assert h.window[1] >= ev.max() - 1e-12


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_fuzz_solve_window_random_flakes(seed):
    """Random supercell flakes, random interior sigma: the slice equals
    the dense nearest-to-sigma eigenvalues (skipping draws where the
    selection boundary is quasi-degenerate, where 'nearest' itself is
    ill-posed)."""
    from pythtb_tpu.ops.matvec import sparse_h, to_dense

    rng = np.random.default_rng(seed)
    m = _random_2d(seed).cut_piece(4, 0, glue_edgs=False).cut_piece(
        4, 1, glue_edgs=False)
    h = sparse_h(m)
    ev = np.linalg.eigvalsh(to_dense(h))
    lo, hi = ev.min(), ev.max()
    sigma = float(rng.uniform(lo + 0.25 * (hi - lo), hi - 0.25 * (hi - lo)))
    kk = 5
    d = np.sort(np.abs(ev - sigma))
    if d[kk] - d[kk - 1] < 1e-3:
        pytest.skip("selection boundary quasi-degenerate for this draw")
    w = flows.solve_window(m, kk, sigma, seed=seed)
    exact = np.sort(ev[np.argsort(np.abs(ev - sigma), kind="stable")[:kk]])
    np.testing.assert_allclose(w, exact, atol=1e-8)


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_fuzz_hartree_fock_vs_numpy(seed):
    """Random finite models through the device HF fixed point vs the
    plain-NumPy oracle loop of test_meanfield."""
    from pythtb_tpu import meanfield

    from .test_meanfield import _dense_h0, _numpy_hf

    rng = np.random.default_rng(seed)
    m = _random_2d(seed).cut_piece(3, 0, glue_edgs=False).cut_piece(
        2, 1, glue_edgs=False)
    norb = m._norb
    U = float(rng.uniform(0.5, 4.0))
    n_elec = float(rng.integers(2, 2 * norb - 2))
    kt = 0.05  # generous smearing keeps both fixed points unique
    n0 = np.clip(np.stack([
        n_elec / (2 * norb) + 0.2 * (rng.random(norb) - 0.5),
        n_elec / (2 * norb) - 0.2 * (rng.random(norb) - 0.5),
    ]), 0.0, 1.0)
    r = meanfield.hartree_fock(m, U, n_elec, temperature=kt, init=n0,
                               tol=1e-13, max_iters=6000, mix=0.4)
    n_ref, _mu = _numpy_hf(_dense_h0(m), U, n_elec, kt, n0, mix=0.4,
                           iters=6000)
    np.testing.assert_allclose(
        np.stack([r["n_up"], r["n_dn"]]), n_ref, atol=1e-7)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_fuzz_bcs_gap_equation_single_orbital(seed):
    """Random single-orbital dispersions: the converged BdG gap solves
    the analytic gap equation (exact for one orbital)."""
    from pythtb_tpu import meanfield

    rng = np.random.default_rng(seed)
    m = ptt.tb_model(2, 2, lat=np.eye(2), orb=[[0.0, 0.0]])
    m.set_onsite([float(rng.uniform(-0.5, 0.5))])
    m.set_hop(float(rng.uniform(-1.5, -0.5)), 0, 0, [1, 0])
    m.set_hop(float(rng.uniform(-1.5, -0.5)), 0, 0, [0, 1])
    if rng.random() < 0.5:
        m.set_hop(float(rng.uniform(-0.4, 0.4)), 0, 0, [1, 1])
    g = float(rng.uniform(1.5, 3.0))
    mu = float(rng.uniform(-1.0, 1.0))
    kt, nk = 0.02, 32
    r = meanfield.bcs_gap(m, g, mu, nk=(nk, nk), temperature=kt,
                          tol=1e-12, max_iters=4000)
    ks = np.arange(nk) / nk
    KX, KY = np.meshgrid(ks, ks, indexing="ij")
    eps = np.asarray(m.solve_all(np.stack([KX.ravel(), KY.ravel()], -1)))[0]
    lo, hi = 1e-9, 10.0
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        E = np.sqrt((eps - mu) ** 2 + mid**2)
        if np.mean(np.tanh(E / (2 * kt)) / (2 * E)) > 1.0 / g:
            lo = mid
        else:
            hi = mid
    np.testing.assert_allclose(r["delta"][0], 0.5 * (lo + hi), atol=1e-8)


@pytest.mark.parametrize("seed", [81, 82])
def test_fuzz_hf_matrix_vs_numpy(seed):
    """Random spinful flakes through the noncollinear HF fixed point vs
    the plain-NumPy full-matrix oracle (rotation-invariant content; the
    fixed points carry continuous spin-rotation zero modes)."""
    from pythtb_tpu import meanfield

    from .test_meanfield import _dense_h0_spinful, _numpy_hf_matrix

    rng = np.random.default_rng(seed)
    flake = ptt.models.kane_mele(
        esite=float(rng.uniform(0.0, 0.8)),
        spin_orb=float(rng.uniform(0.0, 0.4)),
        rashba=float(rng.uniform(0.0, 0.3)),
    ).cut_piece(2, 0, glue_edgs=False).cut_piece(2, 1, glue_edgs=False)
    norb = flake._norb
    U = float(rng.uniform(1.0, 4.0))
    n_elec = float(norb)
    kt = 0.05
    rho0 = np.broadcast_to((n_elec / (2 * norb)) * np.eye(2),
                           (norb, 2, 2)).astype(complex).copy()
    pz = 0.2 * (rng.random(norb) - 0.5)
    pxy = 0.2 * (rng.random(norb) - 0.5) + 0.2j * (rng.random(norb) - 0.5)
    rho0[:, 0, 0] += pz
    rho0[:, 1, 1] -= pz
    rho0[:, 0, 1] += pxy
    rho0[:, 1, 0] += np.conj(pxy)
    # tol 1e-4: random draws can sit near criticality where linear
    # mixing plateaus (measured: seeds 81/82 stall at 7e-7 / 3.6e-5
    # after 6000 iterations -- a 1e-9 request made passing tests warn
    # "not converged").  The rotation-invariant comparisons below use
    # atol 5e-4, so a 1e-4 fixed-point residual is ample; both solvers
    # run the same trajectory so they stop at the same point.
    r = meanfield.hartree_fock(flake, U, n_elec, temperature=kt,
                               init=rho0, tol=1e-4, max_iters=6000,
                               mix=0.4)
    rho_ref, mu_ref = _numpy_hf_matrix(_dense_h0_spinful(flake), U,
                                       n_elec, kt, rho0, mix=0.4,
                                       tol=1e-4)
    sig = np.array([[[0, 1], [1, 0]], [[0, -1j], [1j, 0]],
                    [[1, 0], [0, -1]]])
    m_dev = np.real(np.einsum("iab,sba->is", r["rho"], sig))
    m_ref = np.real(np.einsum("iab,sba->is", rho_ref, sig))
    # tolerance note: the fixed-point manifold has spin-rotation zero
    # modes, so linear mixing converges sublinearly along them and the
    # two solvers stop at slightly different points of the same valley
    np.testing.assert_allclose(np.linalg.norm(m_dev, axis=1),
                               np.linalg.norm(m_ref, axis=1), atol=5e-4)
    np.testing.assert_allclose(r["density"],
                               np.real(np.trace(rho_ref, axis1=-2,
                                                axis2=-1)), atol=5e-4)
    assert abs(r["mu"] - mu_ref) < kt
