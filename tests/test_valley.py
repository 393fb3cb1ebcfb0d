"""Valley Chern oracles (flows.valley_chern).

- exact sum rule: the valley basins partition the SAME plaquette
  fluxes, so sum_v C_v equals the plaquette Chern number to round-off;
- Dirac limit: gapped graphene carries C_K = -C_K' -> +-1/2 as the gap
  shrinks (the valley Hall half-integers), antisymmetric to 1e-9 by
  the mirror that exchanges the valleys;
- Haldane: same-sign halves summing to the Chern number;
- sign reversal under gap inversion (delta -> -delta).
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import flows

K_PTS = [[1.0 / 3.0, 2.0 / 3.0], [2.0 / 3.0, 1.0 / 3.0]]


def test_sum_rule_and_antisymmetry():
    bn = ptt.models.bn(delta=0.3)
    cv = flows.valley_chern(bn, [0], K_PTS, nk=(81, 81))
    assert abs(cv.sum()) < 1e-12
    assert abs(cv[0] + cv[1]) < 1e-9
    C = flows.chern_number(bn, [0], nk=(81, 81))
    assert abs(cv.sum() - C) < 1e-9

    h = ptt.models.haldane()
    cvh = flows.valley_chern(h, [0], K_PTS, nk=(81, 81))
    Ch = flows.chern_number(h, [0], nk=(81, 81))
    assert abs(cvh.sum() - Ch) < 1e-9  # exact partition of the fluxes
    assert cvh[0] < 0 and cvh[1] < 0  # same-sign halves (Chern phase)


def test_dirac_limit_half_integers():
    vals = []
    for delta in (0.4, 0.2, 0.05):
        cv = flows.valley_chern(ptt.models.bn(delta=delta), [0], K_PTS,
                                nk=(121, 121))
        vals.append(abs(cv[0]))
    assert vals[0] < vals[1] < vals[2] < 0.5  # curvature concentrates
    assert vals[2] > 0.45  # -> 1/2 in the Dirac limit
    # gap inversion flips the valley Hall sign
    cp = flows.valley_chern(ptt.models.bn(delta=0.2), [0], K_PTS,
                            nk=(81, 81))
    cm = flows.valley_chern(ptt.models.bn(delta=-0.2), [0], K_PTS,
                            nk=(81, 81))
    np.testing.assert_allclose(cp, -cm, atol=1e-9)


def test_guards():
    bn = ptt.models.bn()
    with pytest.raises(ValueError):
        flows.valley_chern(bn, [0], [[0.5]], nk=(21, 21))
    with pytest.raises(ValueError):
        flows.valley_chern(bn, [5], K_PTS, nk=(21, 21))
    with pytest.raises(ValueError):
        flows.valley_chern(ptt.models.ssh(), [0], K_PTS)


def test_embedded_3d_lattice():
    """Regression (review): the valley metric must come from the
    PERIODIC lattice vectors (a 2-D layer embedded in 3-D used to hit
    a singular 2x2 Cartesian block)."""
    lat3 = [[1.0, 0.0, 0.0], [0.5, 0.0, np.sqrt(3.0) / 2.0],
            [0.0, -1.0, 0.0]]
    orb3 = [[1 / 3, 1 / 3, 0.0], [2 / 3, 2 / 3, 0.0]]
    m = ptt.tb_model(2, 3, lat3, orb3, per=[0, 1])
    m.set_onsite([-0.3, 0.3])
    m.set_hop(-1.0, 0, 1, [0, 0, 0])
    m.set_hop(-1.0, 1, 0, [1, 0, 0])
    m.set_hop(-1.0, 1, 0, [0, 1, 0])
    cv = flows.valley_chern(m, [0], K_PTS, nk=(61, 61))
    assert abs(cv.sum()) < 1e-9
    assert abs(cv[0] + cv[1]) < 1e-9
    ref = flows.valley_chern(ptt.models.bn(delta=0.3), [0], K_PTS,
                             nk=(61, 61))
    np.testing.assert_allclose(np.abs(cv), np.abs(ref), atol=1e-6)
