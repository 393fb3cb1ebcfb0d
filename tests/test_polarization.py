"""Electric polarization oracles (flows.polarization)."""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows


def test_ssh_inversion_quantization():
    """Both dimerization classes quantize to bond centers (1/4 and
    3/4 -- half a quantum apart, offset by the inversion center)."""
    p_plus = flows.polarization(ptt.models.ssh(delta=0.3), [0], nk=64)
    p_minus = flows.polarization(ptt.models.ssh(delta=-0.3), [0], nk=64)
    assert abs(p_plus - 0.25) < 1e-10
    assert abs(p_minus - 0.75) < 1e-10


def test_pump_winding_is_chern():
    """p(lambda) winds by exactly the pump Chern number (+1) over one
    three-site cycle."""
    prev, wind = None, 0.0
    for lam in np.linspace(0.0, 1.0, 21):
        p = flows.polarization(ptt.models.three_site_chain(lam), [0],
                               nk=64)
        if prev is not None:
            dp = p - prev
            dp -= round(dp)
            wind += dp
        prev = p
    assert abs(wind - 1.0) < 1e-9


def test_bn_wannier_center_on_anion():
    """C3 pins the h-BN filled-band Wannier center to the anion site,
    p = (1/3, 1/3); grid convergence is O(1/nk^2)."""
    errs = []
    for nk in (31, 61):
        p0 = flows.polarization(ptt.models.bn(delta=0.7), [0], dir=0,
                                nk=nk)
        p1 = flows.polarization(ptt.models.bn(delta=0.7), [0], dir=1,
                                nk=nk)
        assert abs(p0 - p1) < 1e-9  # C3-equivalent directions
        errs.append(abs(p0 - 1.0 / 3.0))
    # regression (review): averaging the pbc-duplicated endpoint row
    # degraded this to O(1/nk) (2e-3-level errors, halving ratio)
    assert errs[1] < 2e-4
    assert errs[1] < 0.35 * errs[0]  # O(1/nk^2)


def test_guards():
    with pytest.raises(PythtbError):
        flows.polarization(ptt.models.ssh(), [0], dir=1)
    with pytest.raises(PythtbError):
        flows.polarization(ptt.models.ssh(), [5])
    with pytest.raises(PythtbError):
        flows.polarization(
            ptt.models.ssh().cut_piece(4, 0, glue_edgs=False), [0])


def test_parity_polarization_matches_berry():
    """Zak: the TRIM parity product picks the quantized branch --
    independent algorithm (2 diagonalizations + parity products) vs
    the Berry-phase grid average, on both SSH phases, a 4-orbital
    symmetric chain (both fillings), and a spinful symmetric chain."""
    for d in (0.3, -0.3):
        m = ptt.models.ssh(delta=d)
        assert abs(flows.parity_polarization(m, [0], center=0.25)
                   - flows.polarization(m, [0], nk=64)) < 1e-9
    m4 = ptt.tb_model(1, 1, lat=[[1.0]],
                      orb=[[0.25], [0.25], [0.75], [0.75]])
    m4.set_onsite([0.3, -0.3, 0.3, -0.3])
    m4.set_hop(1.0, 0, 2, [0])
    m4.set_hop(1.0, 1, 3, [0])
    m4.set_hop(0.7, 2, 0, [1])
    m4.set_hop(0.7, 3, 1, [1])
    for occ in ([0], [0, 1], [0, 1, 2]):
        assert abs(flows.parity_polarization(m4, occ, center=0.5)
                   - flows.polarization(m4, occ, nk=128)) < 1e-9
    # spinful chain (Kramers pairs)
    ms = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]], nspin=2)
    ms.set_hop(1.1, 0, 1, [0])
    ms.set_hop(0.6, 1, 0, [1])
    assert abs(flows.parity_polarization(ms, [0, 1], center=0.25)
               - flows.polarization(ms, [0, 1], nk=64)) < 1e-9
    # asymmetric model raises
    bad = ptt.models.ssh(delta=0.3)
    bad.set_onsite([0.4, -0.1], mode="reset")
    with pytest.raises(PythtbError, match="inversion"):
        flows.parity_polarization(bad, [0], center=0.25)
    with pytest.raises(PythtbError):
        flows.parity_polarization(ptt.models.bn(), [0])
