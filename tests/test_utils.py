"""Serialization round-trips and profiling helpers."""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu.utils.profiling import benchmark, timed

from . import zoo


def _assert_same_physics(m1, m2, kpts):
    np.testing.assert_allclose(m1.solve_all(kpts), m2.solve_all(kpts), atol=1e-13)


def test_save_load_haldane(tmp_path):
    m = zoo.haldane(ptt)
    path = tmp_path / "haldane.npz"
    m.save(path)
    m2 = ptt.tb_model.load(path)
    _assert_same_physics(m, m2, m.k_uniform_mesh([5, 5]))
    # loaded model remains fully editable
    m2.set_hop(0.1, 0, 1, [2, 0])
    m2.set_onsite([1.0, -1.0], mode="add")


def test_save_load_spinful(tmp_path):
    m = zoo.kane_mele(ptt, "odd")
    path = tmp_path / "km.npz"
    m.save(path)
    m2 = ptt.tb_model.load(path)
    _assert_same_physics(m, m2, m.k_uniform_mesh([4, 4]))


def test_save_load_molecule(tmp_path):
    m = zoo.molecule(ptt)
    path = tmp_path / "mol.npz"
    m.save(path)
    m2 = ptt.tb_model.load(path)
    np.testing.assert_allclose(m.solve_all(), m2.solve_all(), atol=1e-13)


def test_save_load_preserves_w90_guard(tmp_path):
    m = zoo.haldane(ptt)
    m._assume_position_operator_diagonal = False
    path = tmp_path / "w90ish.npz"
    m.save(path)
    m2 = ptt.tb_model.load(path)
    assert m2._assume_position_operator_diagonal is False


def test_benchmark_and_timed():
    m = zoo.graphene(ptt)
    k = m.k_uniform_mesh([4, 4])
    best, result = benchmark(lambda: m.solve_all(k), warmup=1, iters=2)
    assert best > 0 and result.shape == (2, 16)
    out = []
    with timed("solve", out=out):
        m.solve_all(k)
    assert len(out) == 1 and out[0] > 0


def test_wf_array_save_load_roundtrip(tmp_path):
    """wf_array checkpointing: states, energies, model, and all Berry
    quantities survive the round trip."""
    import pythtb_tpu as ptt
    from pythtb_tpu.models import library as zoo

    m = zoo.haldane()
    wf = ptt.wf_array(m, [9, 9])
    wf.solve_on_grid([-0.5, -0.5])
    flux = wf.berry_flux([0])
    path = str(tmp_path / "ckpt")
    wf.save(path)

    wf2 = ptt.wf_array.load(path)
    assert tuple(wf2._mesh_arr) == (9, 9)
    np.testing.assert_allclose(np.asarray(wf2._wfs), np.asarray(wf._wfs), atol=0)
    np.testing.assert_allclose(wf2.energies, wf.energies, atol=0)
    np.testing.assert_allclose(wf2.berry_flux([0]), flux, atol=1e-12)
    # the embedded model solves identically
    k = np.array([[0.1, 0.2]])
    np.testing.assert_allclose(wf2._model.solve_all(k), m.solve_all(k), atol=1e-12)
    # wrong-kind file detection
    m.save(str(tmp_path / "model_only"))
    with pytest.raises(ValueError):
        ptt.wf_array.load(str(tmp_path / "model_only"))


def test_wf_array_save_load_spinful_subset(tmp_path):
    import pythtb_tpu as ptt
    from pythtb_tpu.models import library as zoo

    km = zoo.kane_mele()
    wf = ptt.wf_array(km, [5, 5])
    wf.solve_on_grid([0.0, 0.0])
    sub = wf.choose_states([0, 1])
    path = str(tmp_path / "sub")
    sub.save(path)
    back = ptt.wf_array.load(path)
    assert back._nsta_arr == 2 and back._nspin == 2
    np.testing.assert_allclose(np.asarray(back._wfs), np.asarray(sub._wfs), atol=0)
    np.testing.assert_allclose(
        back.berry_phase([0, 1], dir=0, contin=False),
        sub.berry_phase([0, 1], dir=0, contin=False), atol=1e-12)


def test_load_model_rejects_wf_array_checkpoint(tmp_path):
    """load_model must not silently unwrap a wf_array checkpoint's
    embedded model (advisor round-2 finding)."""
    from pythtb_tpu.utils import serialization

    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [4, 4])
    wf.solve_on_grid([0.0, 0.0])
    path = tmp_path / "wf.npz"
    serialization.save_wf_array(wf, path)
    with pytest.raises(ValueError, match="wf_array"):
        serialization.load_model(path)
    # the matching loader still works
    wf2 = serialization.load_wf_array(path)
    np.testing.assert_allclose(
        wf.berry_phase([0], 0), wf2.berry_phase([0], 0), atol=1e-12
    )
