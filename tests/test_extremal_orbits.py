"""Extremal dHvA orbits (fermisurface.extremal_orbits): belly/neck
cross sections of 3-D Fermi surfaces against closed-form and
differential oracles (sphere-pocket area; corrugated-cylinder
belly-neck splitting vs the package's own 2-D cyclotron mass)."""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import fermisurface


def _cubic(tz=-1.0):
    m = ptt.tb_model(3, 3, np.eye(3).tolist(), [[0.0, 0.0, 0.0]])
    m.set_hop(-1.0, 0, 0, [1, 0, 0])
    m.set_hop(-1.0, 0, 0, [0, 1, 0])
    m.set_hop(tz, 0, 0, [0, 0, 1])
    return m


def test_sphere_pocket_belly():
    """Shallow cubic pocket: one belly extremum at k_z = 0 with area
    pi k_F^2 (k_F^2 = ef + 6 to quartic corrections)."""
    ef = -5.7
    out = fermisurface.extremal_orbits(_cubic(), ef, 0, n_slices=48,
                                       nk=151)
    assert len(out) == 1
    ex = out[0]
    assert ex["kind"] == "max"
    assert min(ex["k_slice"], 1.0 - ex["k_slice"]) < 1e-6
    np.testing.assert_allclose(ex["area"], np.pi * (ef + 6.0),
                               rtol=3e-2)


def test_corrugated_cylinder_belly_neck():
    """Weak t_z makes an open corrugated cylinder: exactly one belly
    (k_z = 0) and one neck (k_z = 1/2), split by
    dA = (dA/dE) * 4|t_z| = 2 pi m*_2D * 4|t_z| -- the 2-D cyclotron
    mass of the in-plane band is an independent package oracle."""
    tz = -0.15
    ef = -2.0
    m = _cubic(tz=tz)
    out = fermisurface.extremal_orbits(m, ef, 0, n_slices=48, nk=201)
    kinds = sorted(ex["kind"] for ex in out)
    assert kinds == ["max", "min"]
    belly = next(ex for ex in out if ex["kind"] == "max")
    neck = next(ex for ex in out if ex["kind"] == "min")
    assert min(belly["k_slice"], 1.0 - belly["k_slice"]) < 1e-6
    np.testing.assert_allclose(neck["k_slice"], 0.5, atol=1e-6)
    # independent oracle: in-plane 2-D model at the same ef
    sq = ptt.tb_model(2, 2, np.eye(2).tolist(), [[0.0, 0.0]])
    sq.set_hop(-1.0, 0, 0, [1, 0])
    sq.set_hop(-1.0, 0, 0, [0, 1])
    mstar = fermisurface.cyclotron_mass(sq, ef, 0, nk=301)
    dA = belly["area"] - neck["area"]
    np.testing.assert_allclose(dA, 2.0 * np.pi * mstar * 4.0 * abs(tz),
                               rtol=5e-2)


def test_empty_and_validation():
    m = _cubic()
    assert fermisurface.extremal_orbits(m, -9.0, 0) == []
    sq = ptt.tb_model(2, 2, np.eye(2).tolist(), [[0.0, 0.0]])
    with pytest.raises(Exception):
        fermisurface.extremal_orbits(sq, 0.0, 0)
    tric = ptt.tb_model(3, 3, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                               [0.3, 0.0, 1.0]], [[0.0, 0.0, 0.0]])
    tric.set_hop(-1.0, 0, 0, [1, 0, 0])
    tric.set_hop(-1.0, 0, 0, [0, 1, 0])
    tric.set_hop(-1.0, 0, 0, [0, 0, 1])
    with pytest.raises(Exception):
        fermisurface.extremal_orbits(tric, -5.7, 0)
