"""Serialization round-trips and profiling helpers."""

import numpy as np

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
