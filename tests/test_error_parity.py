"""Misuse-pattern parity: every construction/usage error the reference
rejects must also be rejected here (and valid patterns accepted).

SURVEY.md hard-part #8: the reference raises on ~40 misuse patterns and
examples/tests rely on several; messages may differ but the raise/accept
decision must match.
"""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import pythtb_tpu as ptt


def _haldane(M):
    m = M.tb_model(2, 2, [[1, 0], [0.5, np.sqrt(3) / 2]],
                   [[1 / 3.0, 1 / 3.0], [2 / 3.0, 2 / 3.0]])
    m.set_onsite([-0.2, 0.2])
    m.set_hop(-1.0, 0, 1, [0, 0])
    return m


def _ribbon(M):
    return M.tb_model(1, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]], per=[0])


CASES = {
    "ctor_dim_k_gt_4": lambda M: M.tb_model(5, 5),
    "ctor_dim_r_lt_dim_k": lambda M: M.tb_model(2, 1),
    "ctor_bad_nspin": lambda M: M.tb_model(1, 1, [[1.0]], [[0.0]], nspin=3),
    "ctor_bad_lat_shape": lambda M: M.tb_model(2, 2, [[1.0, 0.0]], [[0.0, 0.0]]),
    "ctor_bad_orb_shape": lambda M: M.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0]]),
    "ctor_bad_per_len": lambda M: M.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]], per=[0]),
    "ctor_left_handed": lambda M: M.tb_model(2, 2, [[0.0, 1.0], [1.0, 0.0]], [[0.0, 0.0]]),
    "ctor_singular_lat": lambda M: M.tb_model(2, 2, [[1.0, 0.0], [2.0, 0.0]], [[0.0, 0.0]]),
    "onsite_wrong_count": lambda M: _haldane(M).set_onsite([1.0], mode="reset"),
    "onsite_ind_i_range": lambda M: _haldane(M).set_onsite(1.0, 5, mode="reset"),
    "onsite_imag": lambda M: M.tb_model(0, 1, [[1.0]], [[0.0]]).set_onsite([1j]),
    "onsite_double_set": lambda M: _haldane(M).set_onsite([1.0, 2.0]),
    "hop_missing_R": lambda M: _haldane(M).set_hop(1.0, 0, 1),
    "hop_wrong_R_len": lambda M: _haldane(M).set_hop(1.0, 0, 1, [1]),
    "hop_i_range": lambda M: _haldane(M).set_hop(1.0, 7, 1, [0, 0]),
    "hop_onsite": lambda M: _haldane(M).set_hop(1.0, 0, 0, [0, 0]),
    "hop_conj_pair": lambda M: _haldane(M).set_hop(1.0, 1, 0, [0, 0]),
    "hop_double_set": lambda M: _haldane(M).set_hop(1.0, 0, 1, [0, 0]),
    "cut_dim0": lambda M: M.tb_model(0, 1, [[1.0]], [[0.0]]).cut_piece(2, 0),
    "cut_num_lt_1": lambda M: _haldane(M).cut_piece(0, 0),
    "cut_num1_glue": lambda M: _haldane(M).cut_piece(1, 0, glue_edgs=True),
    "cut_bad_dir": lambda M: _ribbon(M).cut_piece(2, 1),
    "reduce_dim0": lambda M: M.tb_model(0, 1, [[1.0]], [[0.0]]).reduce_dim(0, 0.0),
    "reduce_bad_k": lambda M: _ribbon(M).reduce_dim(1, 0.0),
    "sc_float_matrix": lambda M: _haldane(M).make_supercell([[2.0, 0.0], [0.0, 1.0]]),
    "sc_left_handed": lambda M: _haldane(M).make_supercell([[0, 1], [1, 0]]),
    "sc_singular": lambda M: _haldane(M).make_supercell([[1, 1], [1, 1]]),
    "rm_orb_range": lambda M: _haldane(M).remove_orb([5]),
    "rm_orb_dup": lambda M: _haldane(M).remove_orb([0, 0]),
    "cnv_periodic_dir": lambda M: _haldane(M).change_nonperiodic_vector(0),
    "kpath_nk_lt_nodes": lambda M: _haldane(M).k_path([[0, 0], [0.5, 0], [0, 0.5]], 2, report=False),
    "kpath_wrong_dim": lambda M: _haldane(M).k_path([[0, 0, 0], [1, 1, 1]], 10, report=False),
    "kmesh_wrong_size": lambda M: _haldane(M).k_uniform_mesh([3]),
    "posmat_periodic_dir": lambda M: (
        lambda m: m.position_matrix(m.solve_one([0.1, 0.2], eig_vectors=True)[1], 0)
    )(_haldane(M)),
    "wf_mesh_1": lambda M: M.wf_array(_haldane(M), [1, 4]),
    "wf_grid_dim_mismatch": lambda M: M.wf_array(_haldane(M), [4, 4, 4]).solve_on_grid([0.0, 0.0, 0.0]),
    "wf_pbc_nonperiodic": lambda M: (lambda w: w.impose_pbc(0, 1))(M.wf_array(_ribbon(M), [4])),
    "flux_same_dirs": lambda M: (
        lambda w: (w.solve_on_grid([0.0, 0.0]), w.berry_flux([0], dirs=[0, 0]))
    )(M.wf_array(_haldane(M), [4, 4])),
    "berry_phase_bad_dir": lambda M: (
        lambda w: (w.solve_on_grid([0.0, 0.0]), w.berry_phase([0], 5))
    )(M.wf_array(_haldane(M), [4, 4])),
}


def _outcome(module, fn):
    try:
        with redirect_stdout(io.StringIO()):
            fn(module)
        return "ok"
    except Exception:
        return "raise"


@pytest.mark.parametrize("name", sorted(CASES.keys()))
def test_error_behavior_matches_reference(name, ref):
    fn = CASES[name]
    assert _outcome(ref, fn) == _outcome(ptt, fn)


@pytest.mark.parametrize("name", sorted(CASES.keys()))
def test_misuse_always_raises(name):
    """Even without the reference available, each misuse must raise."""
    assert _outcome(ptt, CASES[name]) == "raise"
