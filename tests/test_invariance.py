"""Physics-equivalence property tests.

Modeled on the reference's strongest oracle (tests/test_tbmodel/,
SURVEY.md section 4): physically equivalent encodings of the same
system must give identical gauge-invariant quantities.
"""

import numpy as np

import pythtb_tpu as ptt

from . import zoo


def test_supercell_band_folding():
    """A glued finite ring of N cells has exactly the spectrum of the
    primitive model on an N-point k-mesh (band folding)."""
    m = zoo.haldane(ptt)
    N = 5
    ring = m.cut_piece(N, 0, glue_edgs=True)  # still periodic along dir 1
    kres = 0.3
    ring_evals = np.sort(ring.solve_all(np.array([[kres]]))[:, 0])
    folded = []
    for j in range(N):
        folded.append(m.solve_all(np.array([[j / N, kres]]))[:, 0])
    folded = np.sort(np.concatenate(folded))
    np.testing.assert_allclose(ring_evals, folded, atol=1e-10)


def test_supercell_chern_invariance():
    """Doubling the unit cell folds bands but preserves the Chern number
    of the occupied manifold."""
    m = zoo.haldane(ptt)
    sc = m.make_supercell([[2, 0], [0, 1]], to_home=True, to_home_suppress_warning=True)
    wf = ptt.wf_array(m, [13, 13])
    wf.solve_on_grid([0.0, 0.0])
    c_prim = wf.berry_flux([0]) / (2.0 * np.pi)
    wf_sc = ptt.wf_array(sc, [13, 13])
    wf_sc.solve_on_grid([0.0, 0.0])
    c_sc = wf_sc.berry_flux([0, 1]) / (2.0 * np.pi)
    np.testing.assert_allclose(c_prim, c_sc, atol=1e-6)


def test_nonperiodic_vector_mirror_symmetry():
    """BN ribbon: Berry phase at half filling must be 0 (mod 2 pi) once
    the nonperiodic vector is perpendicular to the ribbon (M_x mirror),
    while the tilted-frame phase is 'contaminated'
    (examples/bn_ribbon_berry.py physics)."""
    bn = zoo.graphene(ptt, delta=0.4)
    ribbon = bn.cut_piece(3, 1, glue_edgs=False)
    perp = ribbon.change_nonperiodic_vector(1, to_home_suppress_warning=True)

    def half_filling_phase(model):
        numk = 31
        wf = ptt.wf_array(model, [numk])
        wf.solve_on_grid([0.0])
        n_occ = model._nsta // 2
        return wf.berry_phase(list(range(n_occ)), dir=0)

    # identical spectra
    k = np.linspace(-0.5, 0.5, 11)[:, None]
    np.testing.assert_allclose(ribbon.solve_all(k), perp.solve_all(k), atol=1e-10)
    phase_perp = half_filling_phase(perp)
    # mirror symmetry pins the phase to 0 or pi; here it is 0
    assert min(abs(phase_perp), abs(abs(phase_perp) - 2 * np.pi)) < 1e-6
    # the tilted frame gives a different (nonzero) phase
    phase_orig = half_filling_phase(ribbon)
    assert abs(np.angle(np.exp(1j * (phase_orig - phase_perp)))) > 0.05


def test_cartesian_center_invariance_under_nonperiodic_change():
    """Cartesian positions of orbitals (and hence position expectations
    in Cartesian frame) are unchanged by change_nonperiodic_vector."""
    bn = zoo.graphene(ptt, delta=0.4)
    ribbon = bn.cut_piece(4, 1, glue_edgs=False)
    perp = ribbon.change_nonperiodic_vector(1, to_home=False)
    _, v1 = ribbon.solve_one([0.2], eig_vectors=True)
    _, v2 = perp.solve_one([0.2], eig_vectors=True)
    occ = list(range(ribbon._nsta // 2))
    # reduced position expectations differ frame to frame, but the
    # Cartesian y-center of the occupied manifold must agree
    p1 = ribbon.position_expectation(v1[occ], 1)
    p2 = perp.position_expectation(v2[occ], 1)
    cart1 = np.sum(p1) * ribbon._lat[1][1]
    cart2 = np.sum(p2) * perp._lat[1][1]
    np.testing.assert_allclose(cart1, cart2, atol=1e-8)


def test_reduce_dim_slice_consistency():
    """reduce_dim(k0 fixed) reproduces the 2-D model solved on the
    corresponding k-line."""
    m = zoo.haldane(ptt)
    for frozen in (0.0, 0.25, 0.7):
        red = m.reduce_dim(0, frozen)
        k1 = np.linspace(0.0, 1.0, 9)
        e2d = m.solve_all(np.stack([np.full(9, frozen), k1], axis=-1))
        e1d = red.solve_all(k1[:, None])
        np.testing.assert_allclose(e2d, e1d, atol=1e-12)


def test_remove_orb_decoupled_orbital():
    """Removing an orbital that is completely decoupled leaves the rest
    of the spectrum untouched."""
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.3], [0.7]])
    m.set_onsite([0.1, -0.4, 5.0])  # orbital 2 decoupled, far away
    m.set_hop(0.8, 0, 1, [0])
    m.set_hop(0.5, 1, 0, [1])
    small = m.remove_orb(2)
    k = np.linspace(0, 1, 7)[:, None]
    np.testing.assert_allclose(m.solve_all(k)[:2], small.solve_all(k), atol=1e-12)


def test_choose_states_consistency():
    """choose_states([0]) berry_phase equals berry_phase([0]) of the full
    array."""
    m = zoo.haldane(ptt)
    wf = ptt.wf_array(m, [9, 9])
    wf.solve_on_grid([0.0, 0.0])
    sub = wf.choose_states([0])
    np.testing.assert_allclose(
        wf.berry_phase([0], 1), sub.berry_phase("All", 1), atol=1e-12
    )
    np.testing.assert_allclose(
        wf.berry_flux([0]), sub.berry_flux("All"), atol=1e-12
    )


def test_shift_to_home_documented_intent():
    """pythtb_tpu implements make_supercell's documented to_home behavior
    (reference docstring pythtb.py:1448-1451): ALL orbitals end up with
    reduced coordinates in [0, 1) along periodic directions, with hop
    R-vectors refolded so the spectrum is exactly unchanged.  (The
    reference snapshot's implementation has an indentation bug and does
    not actually do this; see SURVEY.md hard-part #3.)"""
    m = ptt.tb_model(
        2, 2, [[1.0, 0.0], [0.0, 1.0]],
        [[0.1, 0.2], [1.3, -0.4], [0.6, 2.2]],  # two orbitals out of cell
    )
    m.set_onsite([0.0, 0.3, -0.3])
    m.set_hop(0.5, 0, 1, [1, 0])
    m.set_hop(0.25 + 0.1j, 1, 2, [0, 1])
    m.set_hop(-0.4, 2, 0, [1, 1])
    sc_home = m.make_supercell([[2, 0], [0, 1]], to_home=True, to_home_suppress_warning=True)
    sc_raw = m.make_supercell([[2, 0], [0, 1]], to_home=False)
    # documented: all reduced coords in [0, 1) along periodic dirs
    assert np.all(sc_home._orb >= 0.0 - 1e-12)
    assert np.all(sc_home._orb < 1.0 + 1e-12)
    # physics identical either way
    k = np.random.RandomState(3).rand(6, 2)
    np.testing.assert_allclose(sc_home.solve_all(k), sc_raw.solve_all(k), atol=1e-12)


def test_fused_chern_equals_wf_array_route():
    """flows.chern_number / berry_flux_grid (one fused dispatch) equals
    the wf_array route (solve_on_grid + berry_flux) to float precision,
    for single bands and multiband sets at several grid sizes/origins."""
    import pythtb_tpu as ptt
    from pythtb_tpu import flows
    from pythtb_tpu.models import library as zoo

    cases = [
        (zoo.haldane(), [0], (31, 31), (-0.5, -0.5)),
        (zoo.haldane(), [0, 1], (12, 17), (0.0, 0.0)),
        (zoo.kane_mele(esite=1.0), [0, 1], (15, 15), (-0.5, -0.5)),
    ]
    for m, occ, nk, start in cases:
        wf = ptt.wf_array(m, list(nk))
        wf.solve_on_grid(list(start))
        ref = wf.berry_flux(occ)
        fused = flows.berry_flux_grid(m, occ, nk=nk, start_k=start)
        np.testing.assert_allclose(fused, ref, atol=1e-10)
