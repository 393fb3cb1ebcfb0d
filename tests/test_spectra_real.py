"""Real-frequency interacting spectra: oracle tier.

The ED-DMFT real axis is EXACT (the converged AIM is a finite pole
model), which gives this tier unusually sharp pins:

* construction identities: ``Sigma(z)`` evaluated back on the
  Matsubara axis must reproduce the converged ``res.sigma``; the U = 0
  self-energy must vanish identically (both Weiss field and G_imp come
  from the same discretized AIM, so the cancellation is exact, not
  fit-limited);
* the n_bath = 0 atomic limit against the closed form
  ``Sigma(z) = U/2 + (U^2/4)/z`` at half filling;
* the momentum-resolved map (Schur pole reduction, spectator block via
  ``G_vv = R + R H_vo G_oo H_ov R``) against dense host matrix
  inversion at machine precision;
* Pade continuation (``continuation.py``) against exact rationals,
  against ED Lehmann spectra of interacting Anderson clusters, and --
  the within-package differential no continuation code usually has --
  against the exact real-axis results above.

Reference: PythTB 1.8.0 is single-particle; no counterpart exists
(beyond-reference subsystem, SURVEY section 2e).
"""

import warnings

import numpy as np
import pytest

import pythtb_tpu as pt
from pythtb_tpu import continuation, dmft
from pythtb_tpu.model import PythtbError


@pytest.fixture(scope="module")
def bethe_tight():
    """Tightly converged Bethe metal: the consistency-identity testbed."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return dmft.bethe(U=1.5, D=2.0, beta=10.0, n_matsubara=128,
                          n_bath=4, max_iter=120, tol=1e-11)


@pytest.fixture(scope="module")
def lattice_run():
    """1-D chain + detuned spectator orbital (exercises the Schur
    hybridization on the real axis)."""
    lat = [[1.0]]
    orb = [[0.0], [0.5]]
    m = pt.tb_model(1, 1, lat, orb)
    m.set_onsite([0.0, 3.0])
    m.set_hop(-1.0, 0, 0, [1])
    m.set_hop(0.4, 0, 1, [0])
    m.set_hop(0.2, 1, 0, [1])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = dmft.solve(m, U=2.0, orb=0, beta=8.0, nk=24,
                         n_matsubara=96, n_bath=3, max_iter=60,
                         tol=1e-9)
    return m, res


def test_sigma_real_u0_identity():
    """U = 0: Weiss field and G_imp come from the SAME discretized AIM,
    so Sigma(z) = G0^-1 - G_imp^-1 cancels exactly -- pins every term
    of the real-axis construction (eps_d - mu shift, bath hybridization
    poles, Lehmann sum) with no fit error in the way."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = dmft.bethe(U=0.0, D=2.0, beta=20.0, n_matsubara=128,
                       n_bath=4, max_iter=30, tol=1e-9)
    w = np.linspace(-3.0, 3.0, 201)
    s = r.sigma_real(w, eta=0.05)
    assert np.max(np.abs(s)) < 1e-8


def test_sigma_real_matsubara_consistency(bethe_tight):
    """The SAME rational Sigma(z) evaluated at z = i w_n must return
    the converged Matsubara self-energy (limited only by the final
    linear-mixing step, bounded by tol)."""
    r = bethe_tight
    assert r.converged
    s = r._sigma_at(1j * r.wn)
    assert np.max(np.abs(s - r.sigma)) < 1e-8


def test_sigma_real_atomic_limit():
    """n_bath = 0: the AIM is an isolated atom, so Sigma(z) must equal
    the closed-form atomic self-energy built from the result's OWN
    fitted level and thermal filling at machine precision (the fitted
    eps_d carries an O(D^2) lattice shift -- that belongs to the
    self-consistency, not to the real-axis construction under test);
    and it must sit within that O(D^2) correction of the ideal
    half-filled form U/2 + (U^2/4)/z."""
    U = 2.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = dmft.bethe(U=U, D=0.02, beta=20.0, n_matsubara=128,
                       n_bath=0, max_iter=60, tol=1e-10)
    w = np.linspace(-3.0, 3.0, 121)
    z = w + 0.05j
    s = r.sigma_real(w, eta=0.05)
    # exact atomic pin (per-spin filling n, level eps_eff):
    n = 0.5 * r.n_imp
    eps_eff = r.eps_d - r.mu
    g_at = (1.0 - n) / (z - eps_eff) + n / (z - eps_eff - U)
    np.testing.assert_allclose(s, z - eps_eff - 1.0 / g_at, atol=1e-10)
    # physics: near the ideal atomic form up to the lattice correction
    np.testing.assert_allclose(s, 0.5 * U + (0.25 * U ** 2) / z,
                               atol=3e-3)


def test_band_spectral_dense_oracle(lattice_run):
    """resolved band_spectral against dense host inversion of
    (z + mu - H(k) - P Sigma P) at every (k, w) -- machine precision,
    both the correlated orbital and the spectator block."""
    m, res = lattice_run
    kp = np.linspace(0.0, 1.0, 13)[:, None]
    om = np.linspace(-4.0, 6.0, 31)
    eta = 0.08
    A = dmft.band_spectral(res, kp, om, eta=eta, resolved=True)
    Aoo = dmft.band_spectral(res, kp, om, eta=eta)
    np.testing.assert_allclose(A[:, :, 0], Aoo, atol=1e-13)

    sig = res._sigma_at(om + 1j * eta)
    evals, evecs = m.solve_all(kp.T[0][:, None] if kp.shape[1] == 1
                               else kp, eig_vectors=True)
    # dense oracle straight from H(k)
    from pythtb_tpu.dmft import _assemble_ri_jit
    from pythtb_tpu.utils.xfer import host_unpack
    import jax
    import jax.numpy as jnp

    static, data = m._get_finalized()
    hk = np.asarray(host_unpack(np.asarray(jax.device_get(
        _assemble_ri_jit(static, data, jnp.asarray(kp))))), complex)
    err = 0.0
    for ik in range(len(kp)):
        for iw in range(len(om)):
            z = om[iw] + 1j * eta + res.mu
            S = np.zeros((2, 2), complex)
            S[0, 0] = sig[iw]
            G = np.linalg.inv(z * np.eye(2) - hk[ik] - S)
            err = max(err,
                      abs(-G[0, 0].imag / np.pi - A[ik, iw, 0]),
                      abs(-G[1, 1].imag / np.pi - A[ik, iw, 1]))
    assert err < 1e-10


def test_band_spectral_u0_lorentzians():
    """U = 0 on a lattice: A(k, w) must be the orbital-projected sum of
    Lorentzians at the band energies (whole path incl. the Schur
    hybridization, with Sigma ~ 0 by the U = 0 identity)."""
    lat = [[1.0]]
    orb = [[0.0], [0.5]]
    m = pt.tb_model(1, 1, lat, orb)
    m.set_onsite([0.3, -0.4])
    m.set_hop(-1.0, 0, 0, [1])
    m.set_hop(0.5, 0, 1, [0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = dmft.solve(m, U=0.0, orb=0, beta=10.0, nk=16,
                         n_matsubara=64, n_bath=3, max_iter=20,
                         tol=1e-9, mu=0.0, ph_symmetric=False)
    kp = np.linspace(0.0, 1.0, 9)[:, None]
    om = np.linspace(-3.0, 3.0, 41)
    eta = 0.1
    A = dmft.band_spectral(res, kp, om, eta=eta, resolved=True)
    evals, evecs = m.solve_all(kp, eig_vectors=True)  # (band, k), (band, k, orb)
    for ik in range(len(kp)):
        for o in range(2):
            wgt = np.abs(evecs[:, ik, o]) ** 2
            ax = np.sum(wgt[:, None] * (eta / np.pi)
                        / ((om[None, :] + res.mu - evals[:, ik][:, None]) ** 2
                           + eta ** 2), axis=0)
            np.testing.assert_allclose(A[ik, :, o], ax, atol=2e-6)


def test_local_spectral_sum_rule(bethe_tight):
    """int A_loc dw = 1 up to Lorentzian tails; finite weight at the
    Fermi level in the metal.  (A real-axis quasiparticle-slope Z is
    NOT pinned here: with a 4-level discretized bath, Sigma(w) between
    the Lehmann poles is spiky at small eta -- the standard ED-DMFT
    artifact documented in sigma_real -- so a tiny-eta slope at w = 0
    is not comparable to the Matsubara estimate.)"""
    r = bethe_tight
    om = np.linspace(-8.0, 8.0, 1601)
    A = r.local_spectral(om, eta=0.05)
    assert abs(np.trapezoid(A, om) - 1.0) < 2e-2
    assert A[800] > 0.1  # metallic weight at w = 0


def test_bethe_mott_hubbard_bands():
    """Deep Mott insulator: the lattice A_loc(w) shows the gap at the
    Fermi level and upper/lower Hubbard bands near +-U/2."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = dmft.bethe(U=6.0, D=2.0, beta=20.0, n_matsubara=128,
                       n_bath=4, max_iter=60, tol=1e-7)
    om = np.linspace(-6.0, 6.0, 801)
    A = r.local_spectral(om, eta=0.1)
    assert A[400] < 0.02  # Mott gap at w = 0
    lower = A[(om > -4.5) & (om < -1.5)]
    upper = A[(om > 1.5) & (om < 4.5)]
    assert lower.max() > 0.1 and upper.max() > 0.1
    # particle-hole symmetry of the half-filled solution
    np.testing.assert_allclose(A, A[::-1], atol=5e-3)


def test_band_spectral_bethe_raises(bethe_tight):
    with pytest.raises(PythtbError):
        dmft.band_spectral(bethe_tight, np.zeros((3, 1)),
                           np.linspace(-1, 1, 5))


# ---------------------------------------------------------------------------
# Pade continuation


def test_pade_exact_rational():
    """A 4-pole rational sampled on 64 Matsubara points is recovered
    everywhere on the real axis to ~1e-11 (extended-precision Thiele);
    diagnostics report interpolation-grade residual and causality."""
    E = np.array([-2.0, -0.5, 0.7, 2.2])
    A = np.array([0.3, 0.2, 0.35, 0.15])
    wn = dmft.matsubara(20.0, 64)
    g = np.sum(A[None, :] / (1j * wn[:, None] - E[None, :]), axis=1)
    om = np.linspace(-4.0, 4.0, 301)
    gp, info = continuation.pade(wn, g, om, eta=0.05, diagnostics=True)
    gx = np.sum(A[None, :] / ((om[:, None] + 0.05j) - E[None, :]), axis=1)
    np.testing.assert_allclose(gp, gx, atol=1e-10)
    assert info["residual"] < 1e-14
    assert info["causality_violation"] < 1e-12


def test_pade_ed_cluster_oracle():
    """Interacting Anderson cluster (U != 0, 2 bath sites): Pade of the
    exact Matsubara G_imp against the exact Lehmann real-axis spectrum
    -- the ED-exact small-cluster oracle."""
    wn = dmft.matsubara(12.0, 96)
    eps_b = np.array([-0.8, 0.9])
    v_b = np.array([0.5, 0.4])
    g, info = dmft._aim_solve(-1.0, 2.0, eps_b, v_b, 12.0, wn)
    om = np.linspace(-4.0, 4.0, 401)
    eta = 0.3
    ap = continuation.pade_spectral(wn, g, om, eta=eta)
    gx = np.sum(info["amps"][None, :]
                / ((om[:, None] + 1j * eta) - info["poles"][None, :]),
                axis=1)
    ax = -np.imag(gx) / np.pi
    # sharp isolated cluster poles are the hard case for a
    # smooth-envelope continuation: 10% of the peak at worst, with a
    # mean error two orders below it
    assert np.max(np.abs(ap - ax)) < 0.10 * np.max(ax)
    assert np.mean(np.abs(ap - ax)) < 0.01 * np.max(ax)


def test_pade_dmft_differential(bethe_tight):
    """The within-package differential: Pade of the Matsubara data vs
    the package's EXACT real-axis results, for both G_imp and Sigma.
    Pade is a smooth-envelope method -- pin at moderate broadening."""
    r = bethe_tight
    om = np.linspace(-4.0, 4.0, 301)
    ap = continuation.pade_spectral(r.wn, r.g_imp, om, eta=0.3)
    ax = r.spectral(om, eta=0.3)
    assert np.max(np.abs(ap - ax)) < 0.03 * np.max(ax)
    ap5 = continuation.pade_spectral(r.wn, r.g_imp, om, eta=0.5)
    ax5 = r.spectral(om, eta=0.5)
    assert np.max(np.abs(ap5 - ax5)) < 0.01 * np.max(ax5)
    sp = continuation.pade(r.wn, r.sigma, om, eta=0.5)
    sx = r.sigma_real(om, eta=0.5)
    scale = np.max(np.abs(sx))
    assert np.max(np.abs(sp - sx)) < 0.05 * scale


def test_pade_input_validation():
    wn = dmft.matsubara(10.0, 8)
    g = 1.0 / (1j * wn)
    with pytest.raises(PythtbError):
        continuation.pade(wn, g[:4], [0.0])
    with pytest.raises(PythtbError):
        continuation.pade(-wn, g, [0.0])
    with pytest.raises(PythtbError):
        continuation.pade(wn[:1], g[:1], [0.0])
    with pytest.raises(PythtbError):
        continuation.pade(wn, g, [0.0], n_points=1)


def test_pade_degenerate_truncation():
    """A one-pole input evaluates exactly through the full recursion
    (roundoff keeps the higher reciprocal differences finite); an
    exactly CONSTANT input degenerates at order 1 and must truncate
    rather than divide by zero."""
    wn = dmft.matsubara(10.0, 32)
    g = 1.0 / (1j * wn - 0.7)
    om = np.linspace(-2.0, 2.0, 101)
    gp = continuation.pade(wn, g, om, eta=0.1)
    gx = 1.0 / (om + 0.1j - 0.7)
    np.testing.assert_allclose(gp, gx, atol=1e-9)
    gc, info = continuation.pade(wn, np.full(32, 0.3 - 0.1j), om,
                                 eta=0.1, diagnostics=True)
    assert info["order"] == 1
    np.testing.assert_allclose(gc, np.full(101, 0.3 - 0.1j), atol=1e-15)
