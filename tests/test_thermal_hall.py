"""Thermal Hall (kappa_xy) oracles.

- the closed-form dilogarithm weight against brute quadrature;
- differential: the c2-weighted curvature sum against the independent
  Smrcka-Streda integral (1/(k_B T)^2) int de (-df/de)(e - mu)^2
  sigma_xy(e) over the anomalous_hall staircase on a fine energy grid;
- physics: quantized (pi^2/3) C plateau in a gap, Wiedemann-Franz law
  at low T inside a band, zero under time reversal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu import flows

from .test_fuzz_new_subsystems import _random_2d


def test_c2_weight_vs_quadrature():
    xs = np.array([-50.0, -31.0, -8.0, -2.0, -0.5, 0.0, 0.7, 3.0, 12.0])
    W = np.asarray(flows._c2_weight(jnp.asarray(xs)))
    for x, w in zip(xs, W):
        y = np.linspace(x, x + 90.0, 200001)
        s = 1.0 / (4.0 * np.cosh(np.clip(y / 2.0, -300, 300)) ** 2)
        ref = np.trapezoid(y**2 * s, y)
        assert abs(w - ref) < 1e-8
    assert abs(W[0] - np.pi**2 / 3.0) < 1e-12
    assert abs(np.asarray(flows._c2_weight(jnp.asarray(0.0)))
               - np.pi**2 / 6.0) < 1e-12


def test_thermal_hall_vs_energy_integral():
    """c2 form == (1/(k_B T)^2) int (-df/de)(e-mu)^2 sigma_xy(e) de,
    the two sides computed by different algorithms (closed-form weight
    vs explicit quadrature over the T=0 staircase)."""
    m = ptt.models.haldane()
    T = 0.15
    mus = np.array([-2.0, -0.5, 0.0, 0.8, 2.2])
    kap = flows.thermal_hall(m, mus, T, nk=(61, 61))
    e_grid = np.linspace(-6.0, 6.0, 2401)
    sig = flows.anomalous_hall(m, e_grid, nk=(61, 61))
    de = e_grid[1] - e_grid[0]
    for i, mu in enumerate(mus):
        x = (e_grid - mu) / T
        mdf = 0.25 / (T * np.cosh(np.clip(x / 2.0, -40, 40)) ** 2)
        ref = np.sum(mdf * (e_grid - mu) ** 2 * sig) * de / T**2
        np.testing.assert_allclose(kap[i], ref, atol=5e-3)


@pytest.mark.parametrize("seed", [2, 9])
def test_thermal_hall_energy_integral_fuzz(seed):
    m = _random_2d(seed, norb=3)
    T = 0.2
    ev = m.solve_all(np.random.default_rng(0).random((64, 2)))
    mu = float(np.median(ev))
    kap = flows.thermal_hall(m, mu, T, nk=(41, 41))
    lo, hi = ev.min() - 8 * T, ev.max() + 8 * T
    e_grid = np.linspace(lo, hi, 3001)
    sig = flows.anomalous_hall(m, e_grid, nk=(41, 41))
    x = (e_grid - mu) / T
    mdf = 0.25 / (T * np.cosh(np.clip(x / 2.0, -40, 40)) ** 2)
    ref = np.sum(mdf * (e_grid - mu) ** 2 * sig) * (e_grid[1] - e_grid[0]) / T**2
    np.testing.assert_allclose(kap, ref, atol=1e-2)


def test_thermal_hall_quantized_in_gap():
    """mu in the Haldane gap, k_B T << gap: kappa_xy = (pi^2/3) C."""
    m = ptt.models.haldane()  # lower-band Chern -1, gap (-0.58, 0.58)
    kap = flows.thermal_hall(m, 0.0, 0.02, nk=(81, 81))
    assert abs(kap - (-np.pi**2 / 3.0)) < 1e-6


def test_thermal_hall_warm_gap_activation_pin():
    """Regression for the round-4 bench-row misdiagnosis: at kT = 0.15
    the quantized plateau does NOT hold -- thermal activation across
    the 0.58 Haldane gap (e^{-gap/kT} ~ 2% carriers) reduces kappa(0)
    7% below pi^2/3.  The x64 value at these exact parameters is
    pinned here so a bench/smoke check can never again assert the
    plateau at a temperature where it is wrong physics (the on-chip
    f32 value -3.04704 agreed with this pin at 5e-5 all along)."""
    m = ptt.models.haldane()
    kap = flows.thermal_hall(m, 0.0, 0.15, nk=(101, 101))
    assert abs(kap - (-3.0470864547520)) < 1e-6
    # and the plateau is restored on cooling (same grid)
    cold = flows.thermal_hall(m, 0.0, 0.02, nk=(101, 101))
    assert abs(cold - (-np.pi**2 / 3.0)) < 1e-6


def test_wiedemann_franz_low_t():
    """Inside a band kappa_xy/(pi^2/3) -> sigma_xy(mu) as T -> 0."""
    m = ptt.models.haldane()
    mu = 2.2
    sig = flows.anomalous_hall(m, mu, nk=(81, 81), temperature=0.01)
    kap = flows.thermal_hall(m, mu, 0.01, nk=(81, 81))
    assert abs(kap / (np.pi**2 / 3.0) - sig) < 0.02 * max(abs(sig), 1.0)
    # and the deviation is O(T^2): doubling T grows it ~4x
    d1 = abs(flows.thermal_hall(m, mu, 0.05, nk=(81, 81))
             / (np.pi**2 / 3.0)
             - flows.anomalous_hall(m, mu, nk=(81, 81), temperature=0.05))
    d2 = abs(flows.thermal_hall(m, mu, 0.10, nk=(81, 81))
             / (np.pi**2 / 3.0)
             - flows.anomalous_hall(m, mu, nk=(81, 81), temperature=0.10))
    assert d2 > 2.0 * d1


def test_trs_zero_and_errors():
    bn = ptt.models.bn(delta=0.7)
    kap = flows.thermal_hall(bn, np.array([-1.0, 0.0, 1.0]), 0.2,
                             nk=(41, 41))
    assert np.abs(kap).max() < 1e-10
    with pytest.raises(ValueError):
        flows.thermal_hall(bn, 0.0, 0.0)
    # mu batch shape contract
    out = flows.thermal_hall(ptt.models.haldane(), [0.0, 0.5], 0.1,
                             nk=(31, 31))
    assert out.shape == (2,)
    assert isinstance(
        flows.thermal_hall(ptt.models.haldane(), 0.0, 0.1, nk=(31, 31)),
        float,
    )
