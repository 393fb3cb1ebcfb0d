"""Spin texture oracles (flows.spin_texture)."""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows


def test_sz_conserving_exact():
    km = ptt.models.kane_mele(esite=1.0, rashba=0.0)
    ks = np.random.default_rng(0).random((12, 2))
    st = flows.spin_texture(km, [0, 1, 2, 3], ks)
    assert np.abs(np.abs(st[..., 2]) - 1.0).max() < 1e-10
    assert np.abs(st[..., :2]).max() < 1e-10
    # Kramers partners at the same k carry opposite Sz
    assert np.abs(st[..., 2].sum(axis=1)).max() < 1e-10


def test_rashba_inplane_winding():
    """The in-plane Rashba texture winds once around the zone center
    and |<S>| <= 1 everywhere."""
    km = ptt.models.kane_mele(esite=1.0, rashba=0.35)
    th = np.linspace(0.0, 2.0 * np.pi, 121)[:-1]
    circle = 0.08 * np.stack([np.cos(th), np.sin(th)], axis=-1)
    st = flows.spin_texture(km, [0], circle)[:, 0, :]
    ang = np.unwrap(np.arctan2(st[:, 1], st[:, 0]))
    wind = (ang[-1] - ang[0] + (ang[1] - ang[0])) / (2.0 * np.pi)
    assert abs(abs(round(wind)) - 1) < 1e-9
    assert abs(wind - round(wind)) < 0.05
    norms = np.linalg.norm(st, axis=-1)
    assert norms.max() < 1.0 + 1e-9


def test_guards():
    with pytest.raises(PythtbError):
        flows.spin_texture(ptt.models.haldane(), [0], np.zeros((1, 2)))
    with pytest.raises(PythtbError):
        flows.spin_texture(ptt.models.kane_mele(), [9], np.zeros((1, 2)))
    with pytest.raises(PythtbError):
        flows.spin_texture(ptt.models.kane_mele(), [0], np.zeros((1, 3)))


def test_degeneracy_warning():
    """Regression (review): per-band spin at a Kramers point is
    basis-arbitrary -- a warning must fire when the batch contains a
    (near-)degenerate k."""
    km = ptt.models.kane_mele(esite=1.0, rashba=0.35)
    with pytest.warns(UserWarning, match="basis-arbitrary"):
        flows.spin_texture(km, [0], np.zeros((1, 2)))  # Gamma: Kramers
