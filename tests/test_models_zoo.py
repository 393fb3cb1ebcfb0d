"""The packaged model zoo produces the expected physics."""

import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import models


def test_chain_bandwidth():
    m = models.chain(t=-1.0)
    k = np.linspace(0, 1, 33)[:, None]
    ev = m.solve_all(k)
    np.testing.assert_allclose(ev.min(), -2.0, atol=1e-10)
    np.testing.assert_allclose(ev.max(), 2.0, atol=1e-2)


def test_molecule_levels_count():
    ev = models.molecule_nh3().solve_all()
    assert ev.shape == (4,)


def test_graphene_dirac_point():
    m = models.graphene()
    ev = m.solve_one([2.0 / 3.0, 1.0 / 3.0])  # K point
    np.testing.assert_allclose(ev, [0.0, 0.0], atol=1e-12)


def test_haldane_chern():
    from pythtb_tpu import flows

    c = flows.chern_number(models.haldane(), [0], nk=(31, 31))
    np.testing.assert_allclose(c, -1.0, atol=1e-8)


def test_kane_mele_z2():
    """Topological phase: Wannier flow winds (partner switching);
    trivial phase: it does not."""

    def z2_windings(m):
        wf = ptt.wf_array(m, [25, 25])
        wf.solve_on_grid([-0.5, -0.5])
        flow = wf.berry_phase([0, 1], dir=1, contin=False, berry_evals=True)
        # count jumps of individual centers across half the BZ
        half = flow[: flow.shape[0] // 2 + 1]
        gap_cross = np.abs(np.diff(np.sort(half, axis=1), axis=0)).max()
        return gap_cross

    topo = models.kane_mele(esite=1.0)
    triv = models.kane_mele(esite=2.5)
    # in the topological phase the two Wilson centers must exchange
    # partners: the maximal center movement between adjacent ky is large
    assert z2_windings(topo) > 0.5
    assert z2_windings(triv) < 2.0  # sanity (finite)


def test_three_site_pump_chern():
    nk, nl = 21, 16
    wf = ptt.wf_array(models.three_site_chain(0.0), [nk, nl])
    for il, lmbd in enumerate(np.linspace(0.0, 1.0, nl)):
        m = models.three_site_chain(lmbd)
        _, evec = m.solve_all(np.linspace(0, 1, nk)[:, None], eig_vectors=True)
        for ik in range(nk):
            wf[ik, il] = evec[:, ik]
    wf.impose_pbc(0, 0)
    pump = wf.berry_flux([0]) / (2.0 * np.pi)
    np.testing.assert_allclose(abs(pump), 1.0, atol=1e-2)


def test_cscl_insulating():
    m = models.cscl()
    ev = m.solve_all(m.k_uniform_mesh([6, 6, 6]))
    assert ev[0].max() < ev[1].min()  # direct gap everywhere sampled


def test_fu_kane_mele_strong_ti():
    """Default parameters give the strong topological phase:
    plane-resolved Z2 invariants differ between the k3=0 and k3=1/2
    time-reversal-invariant planes; the trivial distortion sign gives
    equal plane invariants."""
    from pythtb_tpu import flows

    m = models.fu_kane_mele()  # dt < 0: strong TI
    ev = m.solve_all(m.k_uniform_mesh([5, 5, 5]))
    assert ev[1].max() < ev[2].min() - 0.05
    z = [flows.z2_invariant(m.reduce_dim(2, k3), (0, 1), nk=(25, 25))
         for k3 in (0.0, 0.5)]
    assert z[0] != z[1], z

    triv = models.fu_kane_mele(m=0.5)  # dt > 0: trivial
    z = [flows.z2_invariant(triv.reduce_dim(2, k3), (0, 1), nk=(25, 25))
         for k3 in (0.0, 0.5)]
    assert z[0] == z[1] == 0.0, z


def test_ssh_zak_phases():
    from pythtb_tpu import wf_array

    ph = {}
    for d in (0.4, -0.4):
        wf = wf_array(models.ssh(d), [31])
        wf.solve_on_grid([0.0])
        ph[d] = float(wf.berry_phase([0], dir=0))
    # the two dimerizations differ by a Zak phase of pi
    assert abs(abs(np.angle(np.exp(1j * (ph[0.4] - ph[-0.4])))) - np.pi) < 1e-8


def test_lieb_flat_band():
    m = models.lieb()
    ev = m.solve_all(m.k_uniform_mesh([13, 13]))
    flat = ev[1]  # middle band
    assert np.abs(flat).max() < 1e-10  # exactly flat at E = 0
    assert np.ptp(ev[2]) > 0.5  # dispersive neighbors


def test_kagome_flat_band():
    t = -1.0
    m = models.kagome(t)
    ev = m.solve_all(m.k_uniform_mesh([13, 13]))
    assert np.abs(ev[2] - (-2.0 * t)).max() < 1e-10  # flat at -2t = 2
    assert np.ptp(ev[0]) > 0.5


def test_bhz_z2():
    from pythtb_tpu import flows

    assert flows.z2_invariant(models.bhz(m=-1.0), (0, 1), nk=(31, 31)) == 1.0
    assert flows.z2_invariant(models.bhz(m=0.5), (0, 1), nk=(31, 31)) == 0.0
    # band inversion at the Gamma point only in the topological phase
    ev_top = models.bhz(m=-1.0).solve_all([[0.0, 0.0]])
    assert ev_top.shape == (4, 1)


def test_weyl_slice_cherns():
    from pythtb_tpu import flows

    m = models.weyl()  # nodes at kz = +-0.25 (reduced)
    # slices on the inverted arc (through kz = 1/2) carry Chern -1;
    # slices on the arc through kz = 0 are trivial
    inverted = flows.chern_number(m.reduce_dim(2, 0.5), occ=[0], nk=(41, 41))
    trivial = flows.chern_number(m.reduce_dim(2, 0.0), occ=[0], nk=(41, 41))
    assert abs(inverted - (-1.0)) < 1e-4 and abs(trivial) < 1e-4


def test_cut_piece_edge_trimming():
    """cut_piece trim_first/trim_last (upstream wish-list,
    /root/reference/notes/TODO:69-70) == cut + remove_orb by hand."""
    g = models.graphene()
    rib = g.cut_piece(4, 1, trim_first=[0], trim_last=[1])
    manual = g.cut_piece(4, 1).remove_orb([0, 1 + 2 * 3])
    assert rib.get_num_orbitals() == 6
    k = np.linspace(0, 1, 7)[:, None]
    np.testing.assert_allclose(rib.solve_all(k), manual.solve_all(k), atol=1e-12)
    np.testing.assert_allclose(rib.get_orb(), manual.get_orb(), atol=1e-15)
    import pytest

    with pytest.raises(Exception):
        g.cut_piece(4, 1, glue_edgs=True, trim_first=[0])
    with pytest.raises(Exception):
        g.cut_piece(4, 1, trim_first=[5])  # out of original-cell range


def test_cut_piece_trim_scalar_and_index_zero():
    """Regression: scalar trim indices (including the falsy 0) are
    honored, not silently ignored."""
    g = models.graphene()
    rib = g.cut_piece(4, 1, trim_first=0)
    assert rib.get_num_orbitals() == 7
    manual = g.cut_piece(4, 1).remove_orb([0])
    k = np.linspace(0, 1, 5)[:, None]
    np.testing.assert_allclose(rib.solve_all(k), manual.solve_all(k), atol=1e-12)
    rib2 = g.cut_piece(4, 1, trim_last=1)
    assert rib2.get_num_orbitals() == 7


def test_bbh_corner_modes():
    """BBH flake: exactly four near-zero corner modes in the quadrupole
    phase, none in the trivial phase."""
    flake = models.bbh(0.5, 1.0).cut_piece(8, 0).cut_piece(8, 1)
    ev = np.sort(flake.solve_all())
    assert np.sum(np.abs(ev) < 0.05) == 4
    # the four-mode subspace is corner-localized (individual eigvecs
    # mix arbitrarily within the degenerate quartet, so test the
    # projector weight, not per-state centers)
    evals2, evecs2 = flake.solve_all(eig_vectors=True)
    zero_idx = np.nonzero(np.abs(evals2) < 0.05)[0]
    pos = flake.get_orb()
    w = (np.abs(evecs2[zero_idx]) ** 2).sum(0)  # (norb,) subspace weight
    corner_dist = np.minimum(pos, 7.0 - pos).max(axis=1)  # Chebyshev-to-corner
    assert w[corner_dist <= 2.0].sum() > 0.9 * w.sum()
    triv = models.bbh(1.5, 1.0).cut_piece(8, 0).cut_piece(8, 1)
    assert np.sum(np.abs(np.sort(triv.solve_all())) < 0.05) == 0
