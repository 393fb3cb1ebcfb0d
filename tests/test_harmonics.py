"""Time-domain nonlinear response oracles (optical.harmonic_spectrum).

The engine is nonperturbative and gauge-exact (Peierls substitution is
exact for uniform A in tight binding), so it both validates and is
validated by the frequency-domain machinery:

- linear channel == Kubo optical_conductivity in the transparent
  regime (independent algorithms: real-time midpoint propagation vs
  frequency-domain perturbation theory);
- perturbative field scaling: sigma2 is field-independent over a 2x
  amplitude change;
- inversion symmetry kills even harmonics (SSH), broken inversion
  restores them (Rice-Mele-like dimerized chain);
- the C3v tensor relation sigma^{yyy} = -sigma^{yxx} on h-BN.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, optical


def test_linear_channel_matches_kubo():
    bn = ptt.models.bn(delta=1.0)
    w = 0.6  # w and 2w inside the gap: transparent regime
    r = optical.harmonic_spectrum(bn, w, 1e-3, occ=[0], nk=(36, 36),
                                  cycles=24, ramp_cycles=8,
                                  steps_per_cycle=72)
    ref = optical.optical_conductivity(bn, np.array([w]), occ=[0],
                                       nk=(36, 36), eta=1e-5)[0, 0, 0]
    assert abs(r["sigma1"][0] - ref) < 0.02 * abs(ref)
    assert abs(r["sigma1"][1]) < 1e-6  # no Hall channel (TRS)
    # above the gap the real (absorptive) part must come out positive
    r2 = optical.harmonic_spectrum(bn, 2.6, 1e-3, occ=[0], nk=(24, 24),
                                   cycles=24, ramp_cycles=8,
                                   steps_per_cycle=72)
    assert r2["sigma1"][0].real > 0.1


def test_shg_field_scaling_and_c3():
    bn = ptt.models.bn(delta=1.0)
    w = 0.6
    kw = dict(occ=[0], nk=(36, 36), cycles=24, ramp_cycles=8,
              steps_per_cycle=72)
    rx1 = optical.harmonic_spectrum(bn, w, 1e-3, **kw)
    rx2 = optical.harmonic_spectrum(bn, w, 5e-4, **kw)
    s_yxx_1 = rx1["sigma2"][1]
    s_yxx_2 = rx2["sigma2"][1]
    assert abs(s_yxx_1) > 1e-3
    assert abs(s_yxx_1 - s_yxx_2) < 0.02 * abs(s_yxx_1)  # ~ E0-free
    # C3v (h-BN): sigma^{yyy} = -sigma^{yxx}
    ry = optical.harmonic_spectrum(bn, w, 1e-3, pol=[0.0, 1.0], **kw)
    s_yyy = ry["sigma2"][1]
    assert abs(s_yyy + s_yxx_1) < 0.03 * abs(s_yxx_1)


def test_even_harmonics_vanish_with_inversion():
    ssh = ptt.models.ssh(delta=0.4)  # inversion symmetric
    r = optical.harmonic_spectrum(ssh, 0.5, 1e-2, occ=[0], nk=(64,),
                                  cycles=24, ramp_cycles=8,
                                  steps_per_cycle=72)
    C = r["harmonics"]
    ratio_sym = abs(C[2, 0]) / abs(C[1, 0])
    assert ratio_sym < 1e-4
    assert abs(C[3, 0]) > 1e-7  # odd harmonics survive
    # break inversion (staggered onsite spoils the bond-center parity):
    # the second harmonic returns, orders of magnitude above the
    # symmetric residual
    rm = ptt.models.ssh(delta=0.4)
    rm.set_onsite([0.3, -0.3], mode="reset")
    r2 = optical.harmonic_spectrum(rm, 0.5, 1e-2, occ=[0], nk=(64,),
                                   cycles=24, ramp_cycles=8,
                                   steps_per_cycle=72)
    ratio_broken = (abs(r2["harmonics"][2, 0])
                    / abs(r2["harmonics"][1, 0]))
    assert ratio_broken > 50.0 * ratio_sym


def test_guards():
    bn = ptt.models.bn()
    with pytest.raises(PythtbError):
        optical.harmonic_spectrum(bn, 0.5, 1e-3, occ=[0], cycles=9,
                                  ramp_cycles=8)
    with pytest.raises(PythtbError):
        optical.harmonic_spectrum(bn, 0.5, 1e-3, occ=[0, 0])
    with pytest.raises(PythtbError):
        optical.harmonic_spectrum(bn, 0.5, 1e-3, occ=[0],
                                  pol=[1.0, 0.0, 0.0])
    with pytest.raises(PythtbError):
        optical.harmonic_spectrum(
            bn.cut_piece(3, 0, glue_edgs=False), 0.5, 1e-3, occ=[0])


def test_omega_batch_matches_scalar():
    """An omega batch (one vmapped program) equals per-omega runs."""
    bn = ptt.models.bn(delta=1.0)
    kw = dict(occ=[0], nk=(16, 16), cycles=16, ramp_cycles=6,
              steps_per_cycle=48)
    ws = np.array([0.5, 0.7])
    rb = optical.harmonic_spectrum(bn, ws, 1e-3, **kw)
    for i, w in enumerate(ws):
        rs = optical.harmonic_spectrum(bn, float(w), 1e-3, **kw)
        # vmap reorders the reductions: bit-identity is not expected
        np.testing.assert_allclose(rb["sigma1"][i], rs["sigma1"],
                                   atol=1e-9)
        np.testing.assert_allclose(rb["sigma2"][i], rs["sigma2"],
                                   atol=1e-9)
    assert rb["sigma1"].shape == (2, 2)
