"""Grid-batched position operations must equal the per-point loops."""

import numpy as np

import pythtb_tpu as ptt

from . import zoo


def _slab():
    bulk = ptt.tb_model(3, 3, np.eye(3).tolist(),
                        [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    bulk.set_onsite([-1.0, 1.0])
    for lv in ([-1, 0, 0], [0, 0, -1], [-1, -1, 0], [0, -1, -1]):
        bulk.set_hop(0.4, 0, 1, lv)
    for lv in ([0, 0, 0], [0, -1, 0], [-1, -1, -1], [-1, 0, -1]):
        bulk.set_hop(0.7, 0, 1, lv)
    return bulk.cut_piece(4, 2, glue_edgs=False)


def test_position_expectation_all():
    slab = _slab()
    nk = 5
    wf = ptt.wf_array(slab, [nk, nk])
    wf.solve_on_grid([0.0, 0.0])
    occ = [0, 1, 2, 3]
    batched = wf.position_expectation_all(occ, 2)
    assert batched.shape == (nk, nk, len(occ))
    for i in range(nk):
        for j in range(nk):
            loop = wf.position_expectation([i, j], occ, 2)
            np.testing.assert_allclose(batched[i, j], loop, atol=1e-12)


def test_position_hwf_all_orbital_basis():
    slab = _slab()
    nk = 4
    wf = ptt.wf_array(slab, [nk, nk])
    wf.solve_on_grid([0.0, 0.0])
    occ = [0, 1, 2]
    hwfc_b, hwf_b = wf.position_hwf_all(occ, 2, hwf_evec=True, basis="orbital")
    assert hwfc_b.shape == (nk, nk, 3)
    assert hwf_b.shape == (nk, nk, 3, slab._norb)
    for i in range(nk):
        for j in range(nk):
            val, vec = wf.position_hwf([i, j], occ, 2, hwf_evec=True, basis="orbital")
            np.testing.assert_allclose(hwfc_b[i, j], val, atol=1e-12)
            # gauge-invariant comparison of the HWF subspace
            Pb = np.einsum("hf,hg->fg", hwf_b[i, j].conj(), hwf_b[i, j])
            Pl = np.einsum("hf,hg->fg", vec.conj(), vec)
            np.testing.assert_allclose(Pb, Pl, atol=1e-10)


def test_position_hwf_all_spinful():
    m = zoo.kane_mele(ptt, "odd").cut_piece(3, 1, glue_edgs=False)
    nk = 4
    wf = ptt.wf_array(m, [nk])
    wf.solve_on_grid([0.0])
    occ = list(range(4))
    hwfc = wf.position_hwf_all(occ, 1)
    assert hwfc.shape == (nk, 4)
    for i in range(nk):
        np.testing.assert_allclose(
            hwfc[i], wf.position_hwf(i, occ, 1), atol=1e-12
        )
