"""Localization toolkit oracles.

Tiers:

* exact transfer-matrix pins: clean chain ``gamma = arccosh(|E|/2)``,
  clean-strip channel decoupling, symplectic ``+-gamma`` pairing;
* the Thouless determinant identity on a FROZEN disorder realization
  (differential oracle: transfer-matrix product vs the dense
  eigenvalues of the same open chain -- no statistics involved);
* Aubry-Andre: exact ``gamma = ln(lambda/2)`` in the localized phase,
  ``gamma ~ 0`` in the extended phase, and the localization length
  against the exact duality value;
* random-matrix pins for the level-spacing ratio (Poisson / GOE / GUE)
  and analytic participation-ratio values;
* error paths.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import localization as loc
from pythtb_tpu.model import PythtbError


def _chain(t=-1.0):
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    m.set_hop(t, 0, 0, [1])
    return m


# ---------------------------------------------------------------- TM


def test_clean_chain_exact_gamma():
    Es = np.array([2.5, 3.5, 5.0])
    ly = loc.lyapunov_spectrum(_chain(), Es, 100000)
    assert ly.shape == (1, 3, 2)
    np.testing.assert_allclose(ly[0, :, 0], np.arccosh(Es / 2),
                               atol=2e-5)
    # symplectic pairing: exponents come in +- pairs
    np.testing.assert_allclose(ly[0, :, 0], -ly[0, :, 1], atol=2e-6)


def test_clean_chain_inside_band_extended():
    xi = loc.localization_length(_chain(), [0.3, 1.1], 20000)
    # gamma fluctuates around 0 at machine scale -> xi huge / inf
    assert np.all((xi > 1e4) | np.isinf(xi))


def test_clean_strip_channel_decoupling():
    """Transverse channels of a clean 4-leg strip decouple: every
    positive exponent matches a shifted-chain arccosh exactly."""
    sq = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]])
    sq.set_hop(-1.0, 0, 0, [1, 0])
    sq.set_hop(-1.0, 0, 0, [0, 1])
    strip = sq.cut_piece(4, 1)
    eps_c = np.linalg.eigvalsh(-np.eye(4, k=1) - np.eye(4, k=-1))
    E = 4.6
    ly = loc.lyapunov_spectrum(strip, [E], 100000)
    exact = np.sort(np.arccosh(np.abs(E - eps_c) / 2.0))[::-1]
    np.testing.assert_allclose(ly[0, 0, :4], exact, atol=1e-4)
    # the localization length reads the SMALLEST positive exponent
    xi = loc.localization_length(strip, [E], 100000)
    np.testing.assert_allclose(xi[0], 1.0 / exact[-1], rtol=1e-3)


def test_thouless_identity_frozen_realization():
    """gamma_max = (1/L) sum_j ln|E - eps_j| - ln|t| for the SAME
    open chain (algebraic identity up to O(ln L / L) boundary
    terms) -- pins the disordered transfer matrix against the dense
    eigensolver with zero statistical tolerance.  L = 4096 keeps the
    host eigvalsh inside the gate budget; the boundary term is
    O(ln L / L) ~ 1e-3 against the 5e-3 gate."""
    L = 4096
    rng = np.random.default_rng(5)
    w = rng.uniform(-1.0, 1.0, L)
    E = 0.8
    ly = loc.lyapunov_spectrum(_chain(), [E], L, potential=w)
    H = np.diag(w) - np.eye(L, k=1) - np.eye(L, k=-1)
    eps = np.linalg.eigvalsh(H)
    thouless = float(np.log(np.abs(E - eps)).sum() / L)
    assert abs(float(ly[0, 0, 0]) - thouless) < 5e-3


def test_random_disorder_matches_potential_route():
    """disorder=W (in-program draws) and an equivalent host-drawn
    potential agree statistically: same mean gamma within combined
    error bars."""
    L, W, E = 60000, 1.5, 0.8
    xi_a = loc.localization_length(_chain(), [E], L, disorder=W,
                                   realizations=4, seed=3)
    rng = np.random.default_rng(17)
    xi_b = np.mean([
        1.0 / loc.lyapunov_spectrum(
            _chain(), [E], L,
            potential=rng.uniform(-W / 2, W / 2, L))[0, 0, 0]
        for _ in range(4)])
    assert abs(xi_a[0] - xi_b) / xi_b < 0.1


# ---------------------------------------------------------- Aubry-Andre


def test_aubry_andre_exact_lyapunov():
    """In the localized phase gamma(E) = ln(lambda/2) exactly for E in
    the spectrum (Aubry); in the extended phase gamma = 0."""
    beta = (np.sqrt(5) - 1) / 2
    L = 120000
    for lam, expect in [(3.0, np.log(1.5)), (4.0, np.log(2.0))]:
        pot = lam * np.cos(2 * np.pi * beta * np.arange(L) + 0.3)
        # probe at an actual eigenenergy of a golden-mean approximant
        Lf = 610
        pf = lam * np.cos(2 * np.pi * (377 / 610) * np.arange(Lf) + 0.3)
        Hf = np.diag(pf) - np.eye(Lf, k=1) - np.eye(Lf, k=-1)
        Hf[0, -1] = Hf[-1, 0] = -1.0
        E0 = np.linalg.eigvalsh(Hf)[Lf // 2]
        ly = loc.lyapunov_spectrum(_chain(), [E0], L, potential=pot)
        assert abs(float(ly[0, 0, 0]) - expect) < 0.01
    # extended phase: gamma ~ 0
    lam = 1.2
    pot = lam * np.cos(2 * np.pi * beta * np.arange(L) + 0.3)
    Lf = 610
    pf = lam * np.cos(2 * np.pi * (377 / 610) * np.arange(Lf) + 0.3)
    Hf = np.diag(pf) - np.eye(Lf, k=1) - np.eye(Lf, k=-1)
    Hf[0, -1] = Hf[-1, 0] = -1.0
    E0 = np.linalg.eigvalsh(Hf)[Lf // 2]
    ly = loc.lyapunov_spectrum(_chain(), [E0], L, potential=pot)
    assert abs(float(ly[0, 0, 0])) < 5e-3


def test_aubry_andre_localization_length():
    """xi = 1/ln(lambda/2) -- the quantitative duality value, through
    the localization_length wrapper and the models.aubry_andre
    generator's convention (lam cos(2 pi beta i + phi))."""
    beta = (np.sqrt(5) - 1) / 2
    lam, L = 3.0, 200000
    pot = lam * np.cos(2 * np.pi * beta * np.arange(L) + 0.3)
    Lf = 987
    pf = lam * np.cos(2 * np.pi * (610 / 987) * np.arange(Lf) + 0.3)
    Hf = np.diag(pf) - np.eye(Lf, k=1) - np.eye(Lf, k=-1)
    Hf[0, -1] = Hf[-1, 0] = -1.0
    E0 = np.linalg.eigvalsh(Hf)[Lf // 2]
    xi = loc.localization_length(_chain(), [E0], L, potential=pot)
    np.testing.assert_allclose(xi[0], 1.0 / np.log(lam / 2.0),
                               rtol=2e-3)


# ------------------------------------------------------ PR / r-ratio


def test_participation_ratio_analytic():
    L = 100
    # plane wave on a ring: PR = L (normalization-free)
    psi = np.exp(2j * np.pi * 3 * np.arange(L) / L) / 7.0
    np.testing.assert_allclose(loc.participation_ratio(psi), L,
                               rtol=1e-12)
    # single-site state: PR = 1
    e0 = np.zeros(L)
    e0[4] = 2.0
    np.testing.assert_allclose(loc.participation_ratio(e0), 1.0)
    # open-chain standing wave sin(pi q x / (L+1)): PR -> 2(L+1)/3
    x = np.arange(1, L + 1)
    psi = np.sin(np.pi * 7 * x / (L + 1))
    np.testing.assert_allclose(loc.participation_ratio(psi),
                               2.0 * (L + 1) / 3.0, rtol=2e-2)
    # spinful layout: spin collapsed into the site weight
    sp = np.zeros((L, 2))
    sp[10, 0] = sp[10, 1] = 1.0
    np.testing.assert_allclose(
        loc.participation_ratio(sp, spinful=True), 1.0)
    # batch shape passes through
    batch = np.random.default_rng(0).normal(size=(5, 4, L))
    assert loc.participation_ratio(batch).shape == (5, 4)


def test_level_spacing_ratio_random_matrix_pins():
    rng = np.random.default_rng(1)
    # Poisson: iid exponential spacings -> <r> = 2 ln 2 - 1
    pois = np.cumsum(rng.exponential(size=(300, 400)), axis=1)
    assert abs(loc.level_spacing_ratio(pois) - 0.386294) < 5e-3
    # GUE pin: average several matrices (the r-ratio needs no
    # unfolding but carries an O(1/N)-ish finite-size bias -- a single
    # 600x600 draw sits ~0.015 LOW of 0.59975, measured)
    rs = []
    for _ in range(6):
        A = rng.normal(size=(500, 500)) + 1j * rng.normal(size=(500, 500))
        ev = np.linalg.eigvalsh((A + A.conj().T) / 2)
        rs.append(loc.level_spacing_ratio(ev[80:-80]))
    assert abs(np.mean(rs) - 0.59975) < 0.025
    # GOE pin
    rs = []
    for _ in range(6):
        B = rng.normal(size=(500, 500))
        ev = np.linalg.eigvalsh((B + B.T) / np.sqrt(2))
        rs.append(loc.level_spacing_ratio(ev[80:-80]))
    assert abs(np.mean(rs) - 0.53070) < 0.025


def test_anderson_localized_spectrum_poisson():
    """Physics composition: a strongly disordered chain's spectrum is
    Poisson (localized states do not repel)."""
    L = 600
    rng = np.random.default_rng(9)
    rs = []
    for _ in range(8):
        w = rng.uniform(-3.0, 3.0, L)
        H = np.diag(w) - np.eye(L, k=1) - np.eye(L, k=-1)
        ev = np.linalg.eigvalsh(H)
        rs.append(loc.level_spacing_ratio(ev[100:-100]))
    r = float(np.mean(rs))
    assert abs(r - 0.386294) < 0.03


# ----------------------------------------------------------- errors


def test_error_paths():
    with pytest.raises(PythtbError):
        loc.lyapunov_spectrum(ptt.models.graphene(), [0.0], 100)
    ch = _chain()
    with pytest.raises(PythtbError):
        loc.lyapunov_spectrum(ch, [0.0], 100, disorder=-1.0)
    with pytest.raises(PythtbError):
        loc.lyapunov_spectrum(ch, [0.0], 0)
    with pytest.raises(PythtbError):
        loc.lyapunov_spectrum(ch, [0.0], 100, potential=np.zeros((3, 7)))
    # singular H01: two orbitals, only one couples to the next layer
    m2 = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
    m2.set_hop(-1.0, 0, 0, [1])
    m2.set_hop(-0.7, 0, 1, [0])
    with pytest.raises(PythtbError):
        loc.lyapunov_spectrum(m2, [0.0], 100)
    with pytest.raises(PythtbError):
        loc.participation_ratio(np.ones(4), q=1.0)
    with pytest.raises(PythtbError):
        loc.participation_ratio(np.ones((4, 3)), spinful=True)


def test_quasicrystal_composition():
    """models.aubry_andre chain eigenstates localize above the
    self-dual point: PR saturates; below it PR scales with L --
    composes the quasicrystal generator with the localization tools."""
    from pythtb_tpu.models import aubry_andre

    prs = {}
    for L, lam in [(233, 3.0), (377, 3.0), (233, 1.0), (377, 1.0)]:
        m = aubry_andre(L, lam, t=1.0)
        evals, evecs = m.solve_all(eig_vectors=True)
        prs[(L, lam)] = float(
            np.median(loc.participation_ratio(evecs)))
    # localized: PR independent of L and small
    assert prs[(377, 3.0)] < 10
    assert abs(prs[(377, 3.0)] - prs[(233, 3.0)]) < 2
    # extended: PR grows with L
    assert prs[(377, 1.0)] > 1.4 * prs[(233, 1.0)]
