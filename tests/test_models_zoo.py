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
