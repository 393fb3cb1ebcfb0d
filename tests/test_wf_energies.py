"""wf_array energy storage + automatic band-separation checks
(upstream wish-list, /root/reference/notes/TODO:50-54: "Automatic check
in wf_array which checks that bands are well separated ... Something
like wf.energies[i,j]=eval on top of wf[i,j]=evec")."""

import warnings

import numpy as np
import pytest

from pythtb_tpu import tb_model, wf_array
from pythtb_tpu.models import library as zoo


def test_solve_on_grid_fills_energies():
    m = zoo.haldane()
    wf = wf_array(m, [7, 5])
    gaps = wf.solve_on_grid([-0.5, -0.5])
    E = wf.energies
    assert E.shape == (7, 5, 2)
    # spot-check against solve_all at an interior grid point
    k = [-0.5 + 2.0 / 6.0, -0.5 + 3.0 / 4.0]
    np.testing.assert_allclose(E[2, 3], m.solve_all([k])[:, 0], atol=1e-12)
    # boundary slices are periodic copies of the first
    np.testing.assert_allclose(E[-1], E[0], atol=1e-15)
    np.testing.assert_allclose(E[:, -1], E[:, 0], atol=1e-15)
    # min over the grid of the direct gap equals the returned summary
    np.testing.assert_allclose((E[:-1, :-1, 1] - E[:-1, :-1, 0]).min(), gaps[0], atol=1e-12)


def test_band_separation_matches_energies():
    m = zoo.kane_mele()
    wf = wf_array(m, [9, 9])
    gaps = wf.solve_on_grid([0.0, 0.0])
    # fast path (min_gaps) vs explicit energies path must agree
    sep_fast = wf.band_separation([0, 1])
    wf2 = wf_array(m, [9, 9])
    wf2.solve_on_grid([0.0, 0.0])
    wf2._min_gaps = None  # force the energies path
    sep_full = wf2.band_separation([0, 1])
    np.testing.assert_allclose(sep_fast, gaps[1], atol=1e-12)
    np.testing.assert_allclose(sep_fast, sep_full, atol=1e-12)
    assert wf.band_separation("All") == np.inf


def test_manual_energy_assignment():
    m = zoo.haldane()
    wf = wf_array(m, [4])
    E = wf.energies
    assert np.isnan(E).all()
    for i, k in enumerate(np.linspace(0, 1, 4)):
        evals, evec = m.solve_all([[k, 0.0]], eig_vectors=True)
        wf[i] = evec[:, 0]
        wf.energies[i] = evals[:, 0]
    assert not np.isnan(wf.energies).any()
    sep = wf.band_separation([0])
    assert sep > 0
    with pytest.raises(Exception):
        wf.energies = np.zeros((3, 2))  # wrong shape


def test_degenerate_choice_warns():
    # two identical uncoupled chains: bands exactly doubly degenerate,
    # so occ=[0] is degenerate with its complement everywhere
    m = tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
    m.set_hop(1.0, 0, 0, [1])
    m.set_hop(1.0, 1, 1, [1])
    wf = wf_array(m, [6])
    wf.solve_on_grid([0.0])
    with pytest.warns(UserWarning, match="degenerate with their complement"):
        wf.berry_phase([0], dir=0)
    # the closed pair does not warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        wf.berry_phase([0, 1], dir=0)


def test_gapped_choice_does_not_warn():
    m = zoo.haldane()
    wf = wf_array(m, [9, 9])
    wf.solve_on_grid([-0.5, -0.5])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        wf.berry_flux([0])
        wf.berry_phase([0], dir=0)


def test_manual_fill_without_energies_silent():
    # manually filled wf_array with no energies: Berry methods must not
    # attempt the separation check
    m = zoo.haldane()
    wf = wf_array(m, [5, 5])
    for i in range(5):
        for j in range(5):
            _, evec = m.solve_all([[i / 4.0, j / 4.0]], eig_vectors=True)
            wf[i, j] = evec[:, 0]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        wf.berry_flux([0])


def test_choose_states_slices_energies():
    m = zoo.kane_mele()
    wf = wf_array(m, [5, 5])
    wf.solve_on_grid([0.0, 0.0])
    sub = wf.choose_states([0, 1])
    assert sub.energies.shape == (5, 5, 2)
    np.testing.assert_allclose(sub.energies, wf.energies[..., :2], atol=1e-15)
    assert sub._min_gaps is None


def test_state_write_invalidates_min_gaps():
    """Mutating states through wf[key]=... (or any host view) drops the
    solve-derived _min_gaps fast path, so band_separation falls back to
    the stored energies instead of reporting a stale earlier solve
    (advisor round-2 finding)."""
    m = zoo.haldane()
    wf = wf_array(m, [5, 5])
    wf.solve_on_grid([0.0, 0.0])
    assert wf._min_gaps is not None
    sep0 = wf.band_separation([0])
    wf[2, 2] = wf[1, 1]  # manual rewrite of one grid point
    assert wf._min_gaps is None
    # energies still describe the last solve (documented) -> fallback
    # path still returns the solve's separation
    np.testing.assert_allclose(wf.band_separation([0]), sep0, atol=1e-12)
