"""Anomalous Nernst oracles.

- differential: the entropy-weighted curvature sum against the
  independent Mott-type integral (1/T) int de (-df/de)(e - mu)
  sigma_xy(e) over the anomalous_hall staircase on a fine energy grid
  (the two are related by an exact integration by parts);
- physics: Mott relation at low T, exponential suppression in a gap,
  zero for time-reversal-symmetric models.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import flows


def test_nernst_vs_mott_integral():
    """Entropy form == (1/T) int (-df/de)(e - mu) sigma_xy(e) de."""
    m = ptt.models.haldane()
    T = 0.15
    mus = np.array([-2.0, -0.5, 0.0, 0.8, 2.2])
    alpha = flows.anomalous_nernst(m, mus, T, nk=(61, 61))
    # independent route: numerically convolve the T=0 staircase
    e_grid = np.linspace(-4.5, 4.5, 1201)
    sig = flows.anomalous_hall(m, e_grid, nk=(61, 61))
    de = e_grid[1] - e_grid[0]
    for i, mu in enumerate(mus):
        x = (e_grid - mu) / T
        mdf = 0.25 / (T * np.cosh(np.clip(x / 2.0, -40, 40)) ** 2)
        ref = np.sum(mdf * (e_grid - mu) * sig) * de / T
        np.testing.assert_allclose(alpha[i], ref, atol=5e-3)


def test_nernst_mott_relation_low_t():
    """alpha_xy -> (pi^2/3) T dsigma_xy/dmu as T -> 0 (Mott), with the
    derivative taken on a thermally smeared staircase."""
    m = ptt.models.haldane()
    T = 0.05
    mu0 = 2.2  # inside the upper band: smooth sigma_xy(mu)
    alpha = flows.anomalous_nernst(m, mu0, T, nk=(81, 81))
    h = 0.02
    dsig = (
        flows.anomalous_hall(m, mu0 + h, nk=(81, 81), temperature=T)
        - flows.anomalous_hall(m, mu0 - h, nk=(81, 81), temperature=T)
    ) / (2 * h)
    mott = (np.pi**2 / 3.0) * T * dsig
    assert abs(alpha - mott) < 0.15 * max(abs(mott), 0.05)


def test_nernst_gap_suppression_and_trs():
    m = ptt.models.haldane()
    # mid-gap: no states within many k_B T -> exponentially small
    a_gap = flows.anomalous_nernst(m, 0.0, 0.03, nk=(61, 61))
    a_band = flows.anomalous_nernst(m, 2.2, 0.03, nk=(61, 61))
    assert abs(a_gap) < 1e-6
    assert abs(a_band) > 10 * abs(a_gap)
    # TRS model: zero at any mu
    g = ptt.models.bn()
    a_trs = flows.anomalous_nernst(g, np.array([-1.0, 0.0, 1.0]), 0.2,
                                   nk=(41, 41))
    assert np.abs(a_trs).max() < 1e-10


def test_nernst_errors():
    m = ptt.models.haldane()
    with pytest.raises(ValueError):
        flows.anomalous_nernst(m, 0.0, 0.0)
    with pytest.raises(ValueError):
        flows.anomalous_nernst(ptt.models.chain(), 0.0, 0.1)
