"""Unit tests of the builder API: validation, mode algebra, determinism.

Mirrors the reference's smoke tests (/root/reference/tests/test_pythtb.py)
and mode-equivalence tests (tests/test_tbmodel/test_different_modes.py),
written independently against the public API.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError

from . import zoo


def test_version():
    assert isinstance(ptt.__version__, str)
    assert ptt.PYTHTB_COMPAT_VERSION == "1.8.0"


def test_zero_dim_single_orbital():
    m = ptt.tb_model(0, 1, lat=[[1.0]], orb=[[0.0]])
    m.set_onsite([-1.4])
    evals = m.solve_all()
    assert evals.shape == (1,)
    np.testing.assert_allclose(evals[0], -1.4, atol=1e-12)


def test_two_orbital_hopping_eigenvalues():
    m = ptt.tb_model(0, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
    m.set_hop(0.37, 0, 1)
    evals = m.solve_all()
    np.testing.assert_allclose(evals, [-0.37, 0.37], atol=1e-12)


def test_k_path_shapes():
    m = zoo.graphene(ptt)
    k_vec, k_dist, k_node = m.k_path([[0, 0], [0.5, 0], [0.5, 0.5]], 100, report=False)
    assert k_vec.shape == (100, 2)
    assert k_dist.shape == (100,)
    assert k_node.shape == (3,)
    assert k_dist[0] == 0.0
    assert np.all(np.diff(k_dist) >= 0)


def test_solve_deterministic():
    m = zoo.haldane(ptt)
    k = m.k_uniform_mesh([5, 5])
    e1 = m.solve_all(k)
    e2 = m.solve_all(k)
    np.testing.assert_array_equal(e1, e2)


def test_eigenvalues_sorted_and_vectors_normalized():
    m = zoo.kane_mele(ptt, "odd")
    k = m.k_uniform_mesh([4, 4])
    evals, evecs = m.solve_all(k, eig_vectors=True)
    assert np.all(np.diff(evals, axis=0) >= -1e-12)
    # evec layout [band, kpt, orb, spin]
    nrm = np.einsum("bkos,bkos->bk", evecs.conj(), evecs)
    np.testing.assert_allclose(nrm, np.ones_like(nrm.real), atol=1e-12)
    # eigen-equation residual against dense H
    H = m.gen_ham(k)  # (nkp, 4, 4)
    v = evecs.reshape(evals.shape[0], k.shape[0], 4)
    resid = np.einsum("kij,bkj->bki", H, v) - evals[:, :, None] * v
    assert np.abs(resid).max() < 1e-10


def test_onsite_double_set_raises():
    m = zoo.graphene(ptt)
    with pytest.raises(PythtbError):
        m.set_onsite([1.0, 2.0])  # already set in factory
    m.set_onsite([1.0, 2.0], mode="reset")  # fine


def test_onsite_imaginary_raises():
    m = ptt.tb_model(0, 1, lat=[[1.0]], orb=[[0.0]])
    with pytest.raises(PythtbError):
        m.set_onsite([1.0 + 0.5j])


def test_hop_onsite_forbidden():
    m = zoo.graphene(ptt)
    with pytest.raises(PythtbError):
        m.set_hop(1.0, 0, 0, [0, 0])


def test_conjugate_pair_detection():
    m = zoo.graphene(ptt)
    # factory set (0,1,[0,0]); the conjugate (1,0,[0,0]) must be rejected
    with pytest.raises(PythtbError):
        m.set_hop(0.5, 1, 0, [0, 0])
    # but allowed explicitly
    m.set_hop(0.5, 1, 0, [0, 0], allow_conjugate_pair=True)


def test_hop_double_set_raises_and_reset_add():
    m = zoo.graphene(ptt)
    with pytest.raises(PythtbError):
        m.set_hop(0.1, 0, 1, [0, 0])  # mode=set twice
    m.set_hop(0.25, 0, 1, [0, 0], mode="reset")
    m.set_hop(0.25, 0, 1, [0, 0], mode="add")
    # find stored amplitude
    amp = [h[0] for h in m._hoppings if h[1] == 0 and h[2] == 1 and np.all(h[3] == 0)][0]
    np.testing.assert_allclose(amp, 0.5)


def test_mode_add_equals_split_amplitudes():
    """t = t/2 (set) + t/2 (add) must give identical bands."""
    m1 = zoo.checkerboard(ptt)

    m2 = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0], [0.5, 0.5]])
    m2.set_onsite([-1.1, 1.1])
    for lv in ([0, 0], [1, 0], [0, 1], [1, 1]):
        m2.set_hop(0.3, 1, 0, lv)
        m2.set_hop(0.3, 1, 0, lv, mode="add")
    k = m1.k_uniform_mesh([6, 6])
    np.testing.assert_allclose(m1.solve_all(k), m2.solve_all(k), atol=1e-12)


def test_conjugate_split_equivalence():
    """Specifying half the bond in each direction (allow_conjugate_pair)
    equals one full bond (reference tests/test_tbmodel/test_different_modes.py)."""
    lat = [[1.0, 0.0], [0.0, 1.0]]
    orb = [[0.0, 0.0], [0.5, 0.5]]
    m1 = ptt.tb_model(2, 2, lat, orb)
    m1.set_hop(0.4 + 0.1j, 0, 1, [1, 0])
    m2 = ptt.tb_model(2, 2, lat, orb)
    m2.set_hop((0.4 + 0.1j) / 2.0, 0, 1, [1, 0])
    m2.set_hop(np.conj(0.4 + 0.1j) / 2.0, 1, 0, [-1, 0], allow_conjugate_pair=True)
    k = m1.k_uniform_mesh([5, 5])
    np.testing.assert_allclose(m1.solve_all(k), m2.solve_all(k), atol=1e-12)


def test_invalid_dimensions():
    with pytest.raises(PythtbError):
        ptt.tb_model(5, 5)
    with pytest.raises(PythtbError):
        ptt.tb_model(2, 1)
    with pytest.raises(PythtbError):
        ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0]], nspin=3)


def test_left_handed_lattice_rejected():
    with pytest.raises(PythtbError):
        ptt.tb_model(2, 2, lat=[[0.0, 1.0], [1.0, 0.0]], orb=[[0.0, 0.0]])


def test_spinor_pauli_decomposition():
    """[a, bx, by, bz] -> a*I + b.sigma (reference pythtb.py:517-560)."""
    m = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0]], nspin=2)
    blk = m._val_to_block(np.array([1.0, 0.25, 0.5, 0.75]))
    want = np.array([[1.75, 0.25 - 0.5j], [0.25 + 0.5j, 0.25]])
    np.testing.assert_allclose(blk, want, atol=1e-15)


def test_spin_vs_doubled_model():
    """nspin=2 model == hand-doubled nspin=1 model with explicit blocks
    (reference tests/test_tbmodel/test_spin.py idea)."""
    # spinful chain with Zeeman + spin-flip hop
    ms = ptt.tb_model(1, 1, [[1.0]], [[0.0]], nspin=2)
    ms.set_onsite([np.array([0.3, 0.0, 0.0, 0.8])])
    hop = np.array([1.0, 0.2, -0.1, 0.05])
    ms.set_hop(hop, 0, 0, [1])

    # doubled: two orbitals = (up, down)
    md = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.0]])
    md.set_onsite([0.3 + 0.8, 0.3 - 0.8])
    blk = ms._val_to_block(hop)
    md.set_hop(blk[0, 0], 0, 0, [1])
    md.set_hop(blk[1, 1], 1, 1, [1])
    md.set_hop(blk[0, 1], 0, 1, [1])
    md.set_hop(blk[1, 0], 1, 0, [1], allow_conjugate_pair=True)
    k = np.linspace(0, 1, 17)[:, None]
    np.testing.assert_allclose(ms.solve_all(k), md.solve_all(k), atol=1e-12)


def test_dimr_dimk_equivalence():
    """Same physics encoded with (dim_k=2, dim_r=3, per=[0,2]) and
    (dim_k=2, dim_r=2) must give identical spectra and Berry phases
    (reference tests/test_tbmodel/test_dimr_dimk_different.py idea)."""
    t = -1.1

    m2 = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0], [0.5, 0.5]])
    m2.set_onsite([-0.4, 0.4])
    for lv in ([0, 0], [1, 0], [0, 1], [1, 1]):
        m2.set_hop(t, 1, 0, lv)

    m3 = ptt.tb_model(
        2, 3,
        [[1.0, 0.0, 0.0], [0.0, 7.0, 0.0], [0.0, 0.0, 1.0]],
        [[0.0, 0.25, 0.0], [0.5, 0.25, 0.5]],
        per=[0, 2],
    )
    m3.set_onsite([-0.4, 0.4])
    for lv in ([0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]):
        m3.set_hop(t, 1, 0, lv)

    k = np.array([[0.12, 0.34], [0.5, 0.5], [0.9, 0.1]])
    np.testing.assert_allclose(m2.solve_all(k), m3.solve_all(k), atol=1e-12)

    w2 = ptt.wf_array(m2, [9, 9])
    w2.solve_on_grid([0.0, 0.0])
    w3 = ptt.wf_array(m3, [9, 9])
    w3.solve_on_grid([0.0, 0.0])
    np.testing.assert_allclose(
        w2.berry_phase([0], 1), w3.berry_phase([0], 1), atol=1e-10
    )


def test_wf_array_key_checks():
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [4, 4])
    with pytest.raises(TypeError):
        wf[0]
    with pytest.raises(IndexError):
        wf[0, 7]
    with pytest.raises(PythtbError):
        ptt.wf_array(m, [1, 4])


def test_w90_position_guard():
    """Berry routines must refuse w90-derived models until the user
    opts in (reference pythtb.py:3952-3974)."""
    m = zoo.haldane(ptt)
    m._assume_position_operator_diagonal = False
    wf = ptt.wf_array(m, [4, 4])
    wf.solve_on_grid([0.0, 0.0])
    with pytest.raises(PythtbError):
        wf.berry_phase([0], 0)
    m2 = zoo.haldane(ptt)
    m2._assume_position_operator_diagonal = False
    m2.ignore_position_operator_offdiagonal()
    wf2 = ptt.wf_array(m2, [4, 4])
    wf2.solve_on_grid([0.0, 0.0])
    wf2.berry_phase([0], 0)  # now fine


def test_position_along_periodic_raises():
    m = zoo.haldane(ptt)
    _, v = m.solve_one([0.1, 0.2], eig_vectors=True)
    with pytest.raises(PythtbError):
        m.position_matrix(v, 0)


def test_display_and_visualize_run():
    import matplotlib

    matplotlib.use("Agg")
    m = zoo.haldane(ptt)
    m.display()
    _, v = m.solve_one([0.0, 0.0], eig_vectors=True)
    fig, ax = m.visualize(0, 1, eig_dr=v[0], ph_color="wheel")
    assert fig is not None
    fig2, ax2 = m.visualize(0, 1, draw_hoppings=True)
    assert ax2 is not None


def test_k_uniform_mesh_matches_reference_layout(ref):
    """Mesh ordering/values identical to the reference for 1-3D."""
    import io
    from contextlib import redirect_stdout

    for dims, mesh in [((1, 1), [5]), ((2, 2), [4, 3]), ((3, 3), [3, 2, 4])]:
        with redirect_stdout(io.StringIO()):
            mr = ref.tb_model(dims[0], dims[1])
            mt = ptt.tb_model(dims[0], dims[1])
        np.testing.assert_array_equal(
            mr.k_uniform_mesh(mesh), mt.k_uniform_mesh(mesh)
        )


def test_validate_passes_and_catches_corruption():
    m = zoo.haldane(ptt)
    assert m.validate() is m
    zoo.molecule(ptt).validate()
    # corrupt an amplitude behind the API's back
    m._hoppings[0][0] = np.nan + 0j
    m._invalidate()
    with pytest.raises(PythtbError):
        m.validate()


def test_view_mutation_after_device_op_is_honored():
    """Writes through a wf[key] view that outlives a device-consuming
    op must affect subsequent Berry quantities (code-review finding)."""
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [7, 7])
    wf.solve_on_grid([0.0, 0.0])
    view = wf[3, 3]                    # live view escapes
    p0 = wf.berry_flux([0], individual_phases=True)  # device op caches?
    tmp = np.array(view)
    view[0, :] = tmp[1, :]             # swap bands through the old view
    view[1, :] = tmp[0, :]
    p1 = wf.berry_flux([0], individual_phases=True)
    assert np.abs(p1 - p0).max() > 0.1


def test_dim0_model_rejects_k_list():
    m = zoo.molecule(ptt)
    with pytest.raises(PythtbError):
        m.solve_all([[0.0, 0.0, 0.0]])
    with pytest.raises(PythtbError):
        m.gen_ham([[0.0, 0.0, 0.0]])


def test_gen_ham_requires_k_for_periodic():
    m = zoo.haldane(ptt)
    with pytest.raises(PythtbError):
        m.gen_ham(None)


def test_deepcopy_drops_finalized_cache():
    import copy

    m = zoo.haldane(ptt)
    m.solve_one([0.1, 0.2])            # populate the cache
    assert m._finalized is not None
    m2 = copy.deepcopy(m)
    assert m2._finalized is None
    np.testing.assert_allclose(
        m.solve_one([0.3, 0.4]), m2.solve_one([0.3, 0.4]), atol=1e-13
    )


def test_impose_loop_copies_first_slice():
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [5, 4])
    wf.solve_on_grid([0.0, 0.0])
    before_first = np.array(wf[0, 1])
    wf.impose_loop(0)
    np.testing.assert_array_equal(wf[4, 1], before_first)
    # along the second direction too
    wf.impose_loop(1)
    np.testing.assert_array_equal(wf[2, 3], wf[2, 0])


def test_singular_link_warning():
    """Berry quantities warn when neighboring occupied subspaces are
    orthogonal (link-overlap det = 0) -- there the discretized phase is
    mathematically undefined and the reference silently returns noise."""
    import warnings

    m = zoo.haldane(ptt)
    e0 = np.eye(2, dtype=complex)
    e1 = e0[::-1].copy()  # occupied state [0,1]: orthogonal to [1,0]
    wf = ptt.wf_array(m, [3])
    wf[0] = e0
    wf[1] = e1
    wf[2] = e0
    with pytest.warns(UserWarning, match="orthogonal"):
        wf.berry_phase([0], 0)
    with pytest.warns(UserWarning, match="orthogonal"):
        wf.berry_phase([0], 0, berry_evals=True)
    wf2 = ptt.wf_array(m, [3, 3])
    for i in range(3):
        for j in range(3):
            wf2[(i, j)] = e1 if (i + j) % 2 else e0
    with pytest.warns(UserWarning, match="orthogonal"):
        wf2.berry_flux([0])
    # healthy grids stay silent
    wf3 = ptt.wf_array(m, [5, 5])
    wf3.solve_on_grid([0.0, 0.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        wf3.berry_phase([0], 0)
        wf3.berry_phase([0], 1, berry_evals=True)
        wf3.berry_flux([0])


def test_wf_array_position_matrix_wrapper():
    m = zoo.haldane(ptt).cut_piece(4, 1, glue_edgs=False)
    wf = ptt.wf_array(m, [5])
    wf.solve_on_grid([0.0])
    X = wf.position_matrix(2, [0, 1, 2], 1)
    assert X.shape == (3, 3)
    np.testing.assert_allclose(X, X.conj().T, atol=1e-9)
    np.testing.assert_allclose(
        np.real(np.diag(X)), wf.position_expectation(2, [0, 1, 2], 1), atol=1e-12
    )


def test_set_mesh_global_default():
    import jax

    from pythtb_tpu.parallel import auto_mesh, current_mesh, set_mesh

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs multiple devices")
    m = zoo.haldane(ptt)
    k = m.k_uniform_mesh([4, 4])
    base = m.solve_all(k)
    set_mesh(auto_mesh(2))
    try:
        assert current_mesh() is not None
        np.testing.assert_allclose(m.solve_all(k), base, atol=1e-13)
    finally:
        set_mesh(None)
    assert current_mesh() is None


def test_profiler_trace_writes_files(tmp_path):
    from pythtb_tpu.utils.profiling import trace

    m = zoo.haldane(ptt)
    with trace(str(tmp_path)):
        m.solve_all(m.k_uniform_mesh([4, 4]))
    import os

    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert files, "no trace output written"


def test_occ_out_of_range_raises():
    """Out-of-range band indices must raise, not clamp (jit gathers
    would silently clamp; reference raises IndexError)."""
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [5, 5])
    wf.solve_on_grid([0.0, 0.0])
    with pytest.raises(IndexError):
        wf.berry_phase([0, 5], 0)
    with pytest.raises(IndexError):
        wf.berry_flux([2])
    ribbon = m.cut_piece(3, 1, glue_edgs=False)
    wfr = ptt.wf_array(ribbon, [4])
    wfr.solve_on_grid([0.0])
    with pytest.raises(IndexError):
        wfr.position_expectation_all([ribbon._nsta], 1)
    from pythtb_tpu import flows

    with pytest.raises(IndexError):
        flows.chern_number(m, [7], nk=(5, 5))
    # negative indices within range behave like NumPy
    np.testing.assert_allclose(
        wf.berry_phase([-1], 0), wf.berry_phase([1], 0), atol=1e-13
    )


def test_view_taken_before_solve_stays_live():
    """A view handed out BEFORE solve_on_grid must alias the solved data
    (the reference solves into the same buffer)."""
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [5, 5])
    v = wf[2, 2]                      # all-zeros view, pre-solve
    wf.solve_on_grid([0.0, 0.0])
    assert np.abs(v).max() > 0.1, "old view did not observe solved data"
    # writes through the pre-solve view must be honored by later ops
    p0 = wf.berry_flux([0], individual_phases=True)
    tmp = np.array(v)
    v[0, :] = tmp[1, :]
    v[1, :] = tmp[0, :]
    p1 = wf.berry_flux([0], individual_phases=True)
    assert np.abs(p1 - p0).max() > 0.1


def test_save_load_suffixless_path(tmp_path):
    m = zoo.haldane(ptt)
    p = str(tmp_path / "model_no_suffix")
    m.save(p)  # numpy appends .npz
    m2 = ptt.tb_model.load(p)  # must find it anyway
    k = m.k_uniform_mesh([3, 3])
    np.testing.assert_allclose(m.solve_all(k), m2.solve_all(k), atol=1e-13)


def test_empty_occ_matches_reference_semantics():
    """occ=[] is degenerate but legal in the reference (returns zeros);
    the jit indexer must not crash on it."""
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [5, 5])
    wf.solve_on_grid([0.0, 0.0])
    np.testing.assert_allclose(wf.berry_flux([]), 0.0, atol=1e-15)
    pha = wf.berry_phase([], 1, contin=False)
    np.testing.assert_allclose(pha, np.zeros(5), atol=1e-15)


def test_k_path_degenerate_segment_clear_error():
    m = zoo.haldane(ptt)
    with pytest.raises(ValueError):
        m.k_path([[0, 0], [0.001, 0], [0.5, 0.5]], 20, report=False)
    with pytest.raises(ValueError):
        m.k_path([[0, 0], [0, 0], [0.5, 0.5]], 50, report=False)
