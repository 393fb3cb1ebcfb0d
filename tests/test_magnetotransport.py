"""Chambers magnetotransport (boltzmann.magnetotransport): orbit
memory integrals vs closed-form Drude, the independent inverse-mass
RTA machinery, the high-field Hall sum rule, and open-orbit
saturation.

All oracles are differential or closed-form; no reference counterpart
(the reference computes no transport, /root/reference/pythtb.py).
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import boltzmann, fermisurface


def _square(tx=-1.0, ty=-1.0):
    m = ptt.tb_model(2, 2, np.eye(2).tolist(), [[0.0, 0.0]])
    m.set_hop(tx, 0, 0, [1, 0])
    m.set_hop(ty, 0, 0, [0, 1])
    return m


def test_drude_collapse_closed_pocket():
    """A low-filling square-lattice pocket is nearly circular: the
    Chambers tensor must collapse onto the textbook Drude form
    sigma_xx(B) = sigma_0/(1 + (w_c tau)^2),
    sigma_xy(B) = sigma_0 w_c tau/(1 + (w_c tau)^2) * sign factors,
    with w_c = |B|/m* from the package's own cyclotron mass."""
    m = _square()
    ef = -3.6  # shallow electron pocket at Gamma
    tau = 7.0
    mstar = fermisurface.cyclotron_mass(m, ef, 0, nk=301)
    Bs = np.array([0.02, 0.1, 0.3, 1.0]) / tau
    out = boltzmann.magnetotransport(m, ef, Bs, tau=tau, nk=301)
    sig = out["sigma"]
    # zero-field reference from the independent grid machinery
    tc = boltzmann.transport_coefficients(m, [ef], 0.03, 901, tau=tau)
    s0 = tc["sigma"][0, 0, 0]
    wct = Bs / mstar * tau
    np.testing.assert_allclose(sig[:, 0, 0], s0 / (1 + wct ** 2),
                               rtol=2e-2)
    np.testing.assert_allclose(sig[:, 1, 1], s0 / (1 + wct ** 2),
                               rtol=2e-2)
    # Hall ratio: |sigma_xy| / sigma_xx = w_c tau exactly in Drude
    np.testing.assert_allclose(np.abs(sig[:, 0, 1]) / sig[:, 0, 0],
                               wct, rtol=2e-2)
    # antisymmetry
    np.testing.assert_allclose(sig[:, 0, 1], -sig[:, 1, 0], rtol=1e-10)


def test_low_field_hall_matches_inverse_mass_machinery():
    """d sigma_xy / dB at B -> 0 equals transport_coefficients'
    sigma_hall -- two unrelated formulations (orbit memory integral vs
    (-f') v eps v Minv grid sum)."""
    m = _square()
    ef = -3.2
    tau = 3.0
    B = 0.004
    out = boltzmann.magnetotransport(m, ef, [B, -B], tau=tau, nk=301)
    slope = (out["sigma"][0, 0, 1] - out["sigma"][1, 0, 1]) / (2 * B)
    tc = boltzmann.transport_coefficients(m, [ef], 0.03, 901, tau=tau)
    np.testing.assert_allclose(slope, tc["sigma_hall"][0], rtol=3e-2)


def test_high_field_hall_sum_rule():
    """w_c tau >> 1 with only closed electron orbits:
    sigma_xy -> q n / B (tau-independent), sigma_xx ~ 1/B^2."""
    m = _square()
    ef = -3.6
    tau = 5.0
    B = 20.0 / tau  # w_c tau ~ 60 for this pocket (m* ~ 0.5)
    out = boltzmann.magnetotransport(m, ef, [B], tau=tau, nk=301)
    tc = boltzmann.transport_coefficients(m, [ef], 0.03, 901, tau=tau)
    n = tc["n"][0]  # electrons per cell area (V_c = 1)
    q = -1.0
    np.testing.assert_allclose(out["sigma"][0, 0, 1], q * n / B,
                               rtol=3e-2)
    # and tau-independence of the high-field Hall value
    out2 = boltzmann.magnetotransport(m, ef, [B], tau=2.5, nk=301)
    np.testing.assert_allclose(out2["sigma"][0, 0, 1],
                               out["sigma"][0, 0, 1], rtol=2e-2)
    # longitudinal collapse
    assert out["sigma"][0, 0, 0] < 0.01 * tc["sigma"][0, 0, 0]


def test_open_orbit_saturation():
    """Quasi-1D band (t_y << t_x) at half filling: the Fermi surface
    is a pair of OPEN sheets traversing k_y.  The orbit sweeps k_y, so
    v_x oscillates around a NONZERO mean (sigma_xx saturates at high
    B) while v_y averages out (sigma_yy collapses) -- the classic
    open-orbit magnetoresistance anisotropy."""
    m = _square(tx=-1.0, ty=-0.05)
    ef = 0.0
    tau = 4.0
    out = boltzmann.magnetotransport(m, ef, [0.01, 8.0], tau=tau,
                                     nk=301)
    assert out["orbits"][1] >= 2  # open sheets found
    sig_lo, sig_hi = out["sigma"][0], out["sigma"][1]
    # open direction: saturation, not collapse
    assert sig_hi[0, 0] > 0.3 * sig_lo[0, 0]
    # perpendicular: strong collapse
    assert sig_hi[1, 1] < 0.05 * sig_lo[1, 1]


def test_b_zero_rejected_and_insulator_warns():
    m = _square()
    with pytest.raises(Exception):
        boltzmann.magnetotransport(m, -3.6, [0.0])
    with pytest.warns(UserWarning):
        out = boltzmann.magnetotransport(m, -9.0, [0.5])
    assert np.allclose(out["sigma"], 0.0)
