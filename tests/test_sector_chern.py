"""sector_chern oracles: the generalized Prodan projection engine.

- exact decoupled limit: a layer-graded Haldane bilayer with opposite
  layer Cherns, where the sector Chern numbers must equal the per-layer
  Chern numbers computed INDEPENDENTLY on the single-layer models;
- Prodan robustness: weak grading-breaking interlayer coupling leaves
  the sector invariants pinned while the P O P gap stays open;
- spin_chern equivalence: sector_chern(op=Sz) reproduces spin_chern
  exactly (same engine, so this pins the delegation);
- mirror-even bilayer: [M, H] = 0 exchange mirror, both sectors carry
  the layer Chern, mirror Chern 0, total -2;
- guards: non-Hermitian op, bad split, gapless P O P warning.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import flows

from . import zoo


def _haldane_bilayer(t2_sign=(1.0, -1.0), tperp=0.0, delta=0.2, t=-1.0,
                     t2mag=0.15):
    """Two Haldane layers as one 4-orbital 2-D model; layer L gets
    second-neighbor phase sign t2_sign[L] (opposite signs -> opposite
    layer Cherns).  ``tperp`` couples matching sublattices vertically
    (breaks the layer grading [diag(1,1,-1,-1), H] = 0)."""
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    frac = [1.0 / 3.0, 1.0 / 3.0]
    frac2 = [2.0 / 3.0, 2.0 / 3.0]
    m = ptt.tb_model(2, 2, lat, [frac, frac2, frac, frac2])
    m.set_onsite([-delta, delta, -delta, delta])
    for off in (0, 2):  # layer blocks
        t2 = t2mag * np.exp(1.0j * np.pi / 2.0 * t2_sign[off // 2])
        m.set_hop(t, 0 + off, 1 + off, [0, 0])
        m.set_hop(t, 1 + off, 0 + off, [1, 0])
        m.set_hop(t, 1 + off, 0 + off, [0, 1])
        for lv in ([1, 0], [-1, 1], [0, -1]):
            m.set_hop(t2, 0 + off, 0 + off, lv)
            m.set_hop(np.conj(t2), 1 + off, 1 + off, lv)
    if tperp != 0.0:
        m.set_hop(tperp, 0, 2, [0, 0])
        m.set_hop(tperp, 1, 3, [0, 0])
    return m


LAYER_GRADING = np.array([1.0, 1.0, -1.0, -1.0])


def test_decoupled_limit_matches_per_layer_chern():
    m = _haldane_bilayer(tperp=0.0)
    r = flows.sector_chern(m, (0, 1), LAYER_GRADING, nk=(31, 31))
    c_a = flows.chern_number(zoo.haldane(ptt, phi=np.pi / 2.0),
                             occ=[0], nk=(31, 31))
    c_b = flows.chern_number(zoo.haldane(ptt, phi=-np.pi / 2.0),
                             occ=[0], nk=(31, 31))
    # minus sector = grading eigenvalue -1 = layer B
    assert abs(r["chern_minus"] - c_b) < 1e-8
    assert abs(r["chern_plus"] - c_a) < 1e-8
    assert abs(r["sector_chern"] - 0.5 * (c_a - c_b)) < 1e-8
    assert abs(abs(r["sector_chern"]) - 1.0) < 1e-8
    assert abs(r["chern_plus"] + r["chern_minus"]) < 1e-8  # total C = 0
    assert r["gap"] > 1.9  # exact grading: P O P eigenvalues are +-1


@pytest.mark.parametrize("tperp", [0.15, 0.35])
def test_prodan_robustness_under_grading_breaking(tperp):
    """Interlayer coupling breaks [O, H] = 0, but while P O P stays
    gapped the sector Chern numbers cannot move (they are integers of
    a gapped projection) -- the KM+Rashba story, tested here on an
    operator that is NOT spin."""
    m = _haldane_bilayer(tperp=tperp)
    r = flows.sector_chern(m, (0, 1), LAYER_GRADING, nk=(31, 31))
    assert r["gap"] > 0.3
    assert abs(abs(r["sector_chern"]) - 1.0) < 1e-6
    assert abs(r["chern_plus"] + r["chern_minus"]) < 1e-6


def test_mirror_even_bilayer():
    """Equal layers + interlayer hop: the exchange mirror COMMUTES with
    H; both mirror sectors are Haldane copies shifted by +-tperp, so
    C+ = C- = -1: mirror Chern 0, total Chern -2."""
    m = _haldane_bilayer(t2_sign=(1.0, 1.0), tperp=0.2)
    M = np.zeros((4, 4))
    M[0, 2] = M[2, 0] = M[1, 3] = M[3, 1] = 1.0  # layer exchange, M^2=1
    r = flows.sector_chern(m, (0, 1), M, nk=(31, 31))
    assert abs(r["sector_chern"]) < 1e-8
    assert abs(r["chern_plus"] + 1.0) < 1e-8
    assert abs(r["chern_minus"] + 1.0) < 1e-8
    # cross-check the total against the plaquette engine
    c_tot = flows.chern_number(m, occ=[0, 1], nk=(31, 31))
    assert abs((r["chern_plus"] + r["chern_minus"]) - c_tot) < 1e-8


def test_spin_chern_delegation_exact():
    m = zoo.kane_mele(ptt, topological="odd")
    static, _ = m._get_finalized()
    sz = np.tile([1.0, -1.0], static.norb)
    r_new = flows.sector_chern(m, (0, 1), sz, nk=(21, 21))
    r_old = flows.spin_chern(m, (0, 1), nk=(21, 21))
    assert r_new["sector_chern"] == r_old["spin_chern"]
    assert r_new["chern_plus"] == r_old["chern_plus"]
    assert r_new["chern_minus"] == r_old["chern_minus"]
    assert r_new["gap"] == r_old["sz_gap"]
    assert abs(abs(r_old["spin_chern"]) - 1.0) < 1e-6


def test_guards():
    m = _haldane_bilayer()
    with pytest.raises(ValueError, match="Hermitian"):
        flows.sector_chern(m, (0, 1), np.diag([1.0, 1j, 1.0, 1.0]))
    with pytest.raises(ValueError, match="split"):
        flows.sector_chern(m, (0, 1), LAYER_GRADING, split=2)
    with pytest.raises(ValueError, match="op must be"):
        flows.sector_chern(m, (0, 1), np.eye(3))
    with pytest.raises(ValueError, match="at least two"):
        flows.sector_chern(m, (0,), LAYER_GRADING)
    with pytest.raises(IndexError):
        flows.sector_chern(m, (0, 9), LAYER_GRADING)
    # identity grading: P O P spectrum has no gap at the split
    with pytest.warns(UserWarning, match="gapless"):
        flows.sector_chern(m, (0, 1), np.ones(4), nk=(15, 15))
    # straddle warning: shift the grading so both sectors sit positive
    with pytest.warns(UserWarning, match="straddle"):
        flows.sector_chern(m, (0, 1), LAYER_GRADING + 5.0, nk=(15, 15))
