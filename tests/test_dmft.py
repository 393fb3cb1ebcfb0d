"""DMFT oracle tier.

Exact pins: the ED Lehmann machine against analytic noninteracting and
atomic Green's functions; the lattice t -> 0 limit against the closed-
form atomic self-energy; the Schur-complement G_loc program against
dense matrix inversion.  Physics brackets: Bethe-lattice metal /
Mott-insulator endpoints with monotonic quasiparticle weight.
"""

import numpy as np
import pytest

import pythtb_tpu as pt
from pythtb_tpu import dmft
from pythtb_tpu.model import PythtbError


def test_matsubara_grid():
    wn = dmft.matsubara(10.0, 4)
    assert np.allclose(wn, (2 * np.arange(4) + 1) * np.pi / 10.0)
    with pytest.raises(PythtbError):
        dmft.matsubara(-1.0, 4)


def test_aim_u0_exact():
    """U = 0 Lehmann G_imp == analytic 1/(iw - eps - Delta): pins the
    sector enumeration, fermionic signs, thermal weights, and the
    device pole sum with zero fit error in the loop."""
    wn = dmft.matsubara(8.0, 64)
    eps_b = np.array([-0.7, 0.4, 1.1])
    v_b = np.array([0.5, 0.3, 0.6])
    g, info = dmft._aim_solve(0.3, 0.0, eps_b, v_b, 8.0, wn)
    hyb = np.sum(v_b[:, None] ** 2 / (1j * wn[None, :] - eps_b[:, None]),
                 axis=0)
    g_exact = 1.0 / (1j * wn - 0.3 - hyb)
    np.testing.assert_allclose(g, g_exact, atol=1e-10)


def test_aim_atomic_exact():
    """n_bath = 0 against the exact finite-T atomic Green's function,
    occupation, and double occupancy."""
    beta, U, eps = 6.0, 3.0, -1.5
    wn = dmft.matsubara(beta, 48)
    g, info = dmft._aim_solve(eps, U, np.zeros(0), np.zeros(0), beta, wn)
    Z = 1 + 2 * np.exp(-beta * eps) + np.exp(-beta * (2 * eps + U))
    n_sig = (np.exp(-beta * eps) + np.exp(-beta * (2 * eps + U))) / Z
    g_exact = (1 - n_sig) / (1j * wn - eps) + n_sig / (1j * wn - eps - U)
    np.testing.assert_allclose(g, g_exact, atol=1e-12)
    assert abs(info["n_imp"] - 2 * n_sig) < 1e-12
    assert abs(info["docc"] - np.exp(-beta * (2 * eps + U)) / Z) < 1e-12


def test_aim_sum_rule_and_ph():
    """sum of Lehmann weights is 1 (asserted internally too) and the
    ph-symmetric impurity gives purely imaginary G."""
    beta = 12.0
    wn = dmft.matsubara(beta, 32)
    eps_b = np.array([-0.9, -0.3, 0.3, 0.9])
    v_b = np.array([0.4, 0.5, 0.5, 0.4])
    g, info = dmft._aim_solve(-1.0, 2.0, eps_b, v_b, beta, wn)
    assert abs(np.sum(info["amps"]) - 1.0) < 1e-9
    assert np.max(np.abs(np.real(g))) < 1e-10  # ph symmetric
    assert abs(info["n_imp"] - 1.0) < 1e-10


def test_gloc_schur_vs_dense():
    """The pole-form lattice G_loc (one batched eigh + elementwise
    reduction, the device program) equals brute-force dense matrix
    inversion on a random 3-orbital model."""
    rng = np.random.default_rng(7)
    m = pt.tb_model(1, 1, [[1.0]], [[0.0], [0.3], [0.6]])
    m.set_onsite([0.2, -0.4, 0.5])
    for a in range(3):
        for b in range(a, 3):
            amp = rng.normal(0, 0.4) + 1j * rng.normal(0, 0.4)
            if a == b:
                amp = rng.normal(0, 0.4)
            m.set_hop(amp, a, b, [1])
    nk, mu = 16, 0.23
    wn = dmft.matsubara(9.0, 24)
    sigma = rng.normal(0, 0.3, len(wn)) - 1j * np.abs(rng.normal(0, 0.3, len(wn)))
    epso, amps, lams, _ = dmft._lattice_pole_data(m, 0, [nk])
    g_pole = dmft._gloc_lattice(epso, amps, lams, wn, mu, sigma)
    # dense oracle
    kpts = m.k_uniform_mesh([nk])
    static, data = m._get_finalized()
    import jax, jax.numpy as jnp
    from pythtb_tpu.utils.xfer import host_unpack
    from pythtb_tpu import config
    hk = np.asarray(host_unpack(np.asarray(jax.device_get(
        dmft._assemble_ri_jit(static, data,
                              jnp.asarray(kpts, config.float_dtype()))))),
        dtype=complex)
    g_dense = np.empty(len(wn), dtype=complex)
    for i, w in enumerate(wn):
        acc = 0.0
        for Hk in hk:
            M = (1j * w + mu) * np.eye(3) - Hk
            M[0, 0] -= sigma[i]
            acc += np.linalg.inv(M)[0, 0]
        g_dense[i] = acc / len(hk)
    np.testing.assert_allclose(g_pole, g_dense, atol=1e-10)


def test_lattice_atomic_sigma():
    """t -> 0 lattice: the converged half-filling self-energy is the
    exact atomic Sigma(iw) = U/2 + (U^2/4)/(iw)."""
    m = pt.tb_model(1, 1, [[1.0]], [[0.0]])
    m.set_onsite([0.7])
    m.set_hop(1e-30, 0, 0, [1])  # keep the hop table non-empty
    U = 3.0
    r = dmft.solve(m, U, beta=8.0, nk=[4], n_matsubara=64, n_bath=0,
                   max_iter=20, mix=1.0)
    sig_exact = U / 2 + (U ** 2 / 4) / (1j * r.wn)
    assert r.converged
    np.testing.assert_allclose(r.sigma, sig_exact, atol=1e-10)


@pytest.fixture(scope="module")
def bethe_runs():
    import warnings

    out = {}
    for U in (1.0, 3.0, 6.0):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out[U] = dmft.bethe(U, D=2.0, beta=20.0, n_matsubara=128,
                                n_bath=4, max_iter=40)
    return out


def test_bethe_metal(bethe_runs):
    r = bethe_runs[1.0]
    assert r.converged
    assert 0.85 < r.Z < 0.97  # weakly correlated metal
    assert 0.18 < r.docc < 0.25  # mildly suppressed from U=0 value 1/4
    assert np.max(np.abs(np.real(r.sigma) - 0.5)) < 1e-3  # ph: Re = U/2
    assert np.max(np.abs(np.real(r.g_loc))) < 1e-3
    assert r.sc_residual < 2e-2
    assert abs(r.n_imp - 1.0) < 1e-4


def test_bethe_mott(bethe_runs):
    r = bethe_runs[6.0]
    assert r.converged
    assert r.Z < 0.05  # Mott insulator (U_c2 ~ 5.8 at T = 0, D = 2)
    assert r.docc < 0.03
    # insulating Sigma diverges at low frequency
    assert abs(np.imag(r.sigma[0])) > 5.0


def test_bethe_z_monotone(bethe_runs):
    zs = [bethe_runs[U].Z for U in (1.0, 3.0, 6.0)]
    assert zs[0] > zs[1] > zs[2]
    ds = [bethe_runs[U].docc for U in (1.0, 3.0, 6.0)]
    assert ds[0] > ds[1] > ds[2]


def test_bethe_spectral(bethe_runs):
    """Exact-Lehmann impurity spectral function: normalized, gapped in
    the Mott phase, weight at the Fermi level in the metal."""
    om = np.linspace(-8, 8, 801)
    a_m = bethe_runs[1.0].spectral(om, eta=0.1)
    a_i = bethe_runs[6.0].spectral(om, eta=0.1)
    for a in (a_m, a_i):
        assert np.all(a > -1e-12)
        assert abs(np.trapezoid(a, om) - 1.0) < 0.05  # Lorentzian tails
    assert a_m[400] > 0.1  # metallic weight at w = 0
    assert a_i[400] < 0.05  # Mott gap
    # Hubbard bands at +- U/2
    iu = np.argmin(np.abs(om - 3.0))
    assert a_i[iu] > a_i[400] * 3


def test_square_lattice_halffilling():
    m = pt.tb_model(2, 2, [[1, 0], [0, 1]], [[0, 0]])
    m.set_hop(-0.5, 0, 0, [1, 0])
    m.set_hop(-0.5, 0, 0, [0, 1])
    r = dmft.solve(m, 2.0, beta=20.0, nk=[16, 16], n_matsubara=128,
                   n_bath=4, max_iter=30)
    assert r.converged
    assert abs(r.n_imp - 1.0) < 1e-4  # ph symmetry at mu = U/2
    assert np.max(np.abs(np.real(r.sigma) - 1.0)) < 1e-3
    assert 0.4 < r.Z < 0.85  # correlated metal at U = bandwidth


def test_schur_spectator_band():
    """A detached far-away band must not change the solution at all
    (exact Schur complement + hybridization-weighted fit scale)."""
    m = pt.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
    m.set_onsite([0.0, 30.0])
    m.set_hop(-0.5, 0, 0, [1])
    m.set_hop(0.3, 1, 1, [1])
    m.set_hop(1e-8, 0, 1, [0])
    mb = pt.tb_model(1, 1, [[1.0]], [[0.0]])
    mb.set_hop(-0.5, 0, 0, [1])
    kw = dict(beta=16.0, nk=[32], n_matsubara=96, n_bath=3, max_iter=25)
    r = dmft.solve(m, 2.0, orb=0, **kw)
    rb = dmft.solve(mb, 2.0, **kw)
    np.testing.assert_allclose(r.sigma, rb.sigma, atol=1e-6)


def test_filling_adjustment():
    m = pt.tb_model(1, 1, [[1.0]], [[0.0]])
    m.set_hop(-0.5, 0, 0, [1])
    r = dmft.solve(m, 2.0, beta=20.0, nk=[48], n_matsubara=128,
                   n_bath=3, filling=0.6, max_iter=25)
    assert r.converged
    assert abs(r.n_imp - 0.6) < 5e-3
    assert r.mu < 1.0  # well below the half-filling U/2 point


def test_filling_tail_correction():
    """Matsubara filling sum with the polygamma tail equals the exact
    Fermi-function filling of a noninteracting band."""
    beta, mu = 20.0, 0.3
    wn = dmft.matsubara(beta, 512)
    eps = -np.cos(2 * np.pi * np.arange(64) / 64.0)
    g = np.mean(1.0 / (1j * wn[:, None] + mu - eps[None, :]), axis=1)
    n_mats = dmft._filling_from_g(g, wn, beta)
    n_exact = np.mean(1.0 / (1.0 + np.exp(beta * (eps - mu))))
    assert abs(n_mats - n_exact) < 1e-6


def test_bath_fit_gradient():
    """Analytic chi^2 gradient against finite differences."""
    rng = np.random.default_rng(3)
    wn = dmft.matsubara(10.0, 40)
    target = (0.2 + 0.7 ** 2 / (1j * wn + 0.4)
              + 0.5 ** 2 / (1j * wn - 0.8))
    from scipy.optimize import check_grad, minimize  # noqa: F401

    w = 1.0 / wn
    wsum = float(np.sum(w))

    def chi2(p):
        f, grad = dmft._delta_fit(p, wn)
        r = f - target
        return (float(np.sum(w * np.abs(r) ** 2)) / wsum,
                2.0 * np.real(grad @ (w * np.conj(r))) / wsum)

    p0 = rng.normal(0, 0.5, 5)
    err = check_grad(lambda p: chi2(p)[0], lambda p: chi2(p)[1], p0)
    assert err < 1e-6


def test_error_paths():
    m = pt.tb_model(1, 1, [[1.0]], [[0.0]], nspin=2)
    m.set_hop(-0.5, 0, 0, [1])
    with pytest.raises(PythtbError, match="spinless"):
        dmft.solve(m, 1.0)
    m0 = pt.tb_model(0, 1, [[1.0]], [[0.0]])
    with pytest.raises(PythtbError, match="periodic"):
        dmft.solve(m0, 1.0)
    m1 = pt.tb_model(1, 1, [[1.0]], [[0.0]])
    m1.set_hop(-0.5, 0, 0, [1])
    with pytest.raises(PythtbError, match="orb"):
        dmft.solve(m1, 1.0, orb=5, nk=[4])
    with pytest.raises(PythtbError, match="bracket"):
        dmft.solve(m1, 1.0, nk=[8], n_matsubara=32, n_bath=1,
                   filling=2.5, max_iter=2)
    with pytest.raises(PythtbError, match="sigma0"):
        dmft.solve(m1, 1.0, nk=[8], n_matsubara=32,
                   sigma0=np.zeros(7, dtype=complex))


def test_sigma0_seeding(bethe_runs):
    """Seeding from a converged Sigma restarts in very few steps --
    the standard hysteresis probe around the Mott transition."""
    r0 = bethe_runs[3.0]
    r = dmft.bethe(3.0, D=2.0, beta=20.0, n_matsubara=128, n_bath=4,
                   max_iter=40, sigma0=r0.sigma)
    assert r.converged
    assert r.iterations <= max(3, r0.iterations // 2)
    assert abs(r.Z - r0.Z) < 5e-3


def test_doped_mu_not_ph_symmetrized():
    """An explicit doped mu with filling=None must NOT trigger the
    particle-hole symmetrization of the bath fit (advisor finding,
    round 4: ph was forced whenever filling was None, silently
    biasing Sigma on doped runs).  Observable: the unsymmetrized fit
    error is an order of magnitude smaller than a wrongly-forced
    ph fit at the same doped mu, and the filling moves off 1."""
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        r_auto = dmft.bethe(2.0, mu=1.6, beta=20.0, n_matsubara=128,
                            n_bath=4, max_iter=40)
        r_forced = dmft.bethe(2.0, mu=1.6, beta=20.0, n_matsubara=128,
                              n_bath=4, max_iter=40, ph_symmetric=True)
        r_half = dmft.bethe(2.0, beta=20.0, n_matsubara=128,
                            n_bath=4, max_iter=40)
    assert r_auto.n_imp > 1.05          # electron-doped
    assert r_auto.fit_err < 0.3 * r_forced.fit_err
    # the default mu = U/2 still auto-detects the ph point
    assert abs(r_half.n_imp - 1.0) < 1e-3
