"""Structural parameter sweeps: padded model families (pythtb_tpu.family).

The reference sweeps structural parameters (ribbon width, supercell
matrix) by rebuilding the model and re-running the pipeline per point
(/root/reference/pythtb.py:1105, :1440 driven from user loops); these
tests pin the round-2 one-program replacement, comparing member-by-
member against the per-point reference runs.
"""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu.family import family

from . import zoo


def _haldane(mod):
    with redirect_stdout(io.StringIO()):
        return zoo.haldane(mod)


def test_family_supercell_chern_series():
    """Chern of the occupied manifold is invariant under supercell
    folding; a family over supercell matrices (norb 2/4/6, different
    hopping graphs, different nocc) must give -1 for every member in
    one program."""
    hal = _haldane(ptt)
    with redirect_stdout(io.StringIO()):
        m2 = hal.make_supercell([[2, 0], [0, 1]], to_home=False)
        m3 = hal.make_supercell([[2, 1], [-1, 1]], to_home=False)
    fam = family([hal, m2, m3])
    c = fam.chern(nocc=[1, 2, 3], nk=(31, 31))
    np.testing.assert_allclose(c, [-1.0, -1.0, -1.0], atol=1e-9)


def test_family_chern_matches_wf_array_per_member():
    """Masked-determinant family Chern == the wf_array pipeline run
    per member (bit-level agreement of the discretized flux)."""
    hal = _haldane(ptt)
    with redirect_stdout(io.StringIO()):
        m2 = hal.make_supercell([[2, 0], [0, 1]], to_home=False)
    fam = family([hal, m2])
    c = fam.chern(nocc=[1, 2], nk=(17, 17))
    for m, no, ci in zip((hal, m2), (1, 2), c):
        wf = ptt.wf_array(m, [17, 17])
        wf.solve_on_grid([-0.5, -0.5])
        ref = wf.berry_flux(list(range(no))) / (2.0 * np.pi)
        np.testing.assert_allclose(ci, ref, atol=1e-12)


def test_family_ribbon_energies_match_reference(ref):
    """Ribbon-width family energies vs per-point reference solve_all."""
    widths = (2, 3, 5)
    with redirect_stdout(io.StringIO()):
        ribs_t = [_haldane(ptt).cut_piece(w, 1, glue_edgs=False) for w in widths]
        ribs_r = [_haldane(ref).cut_piece(w, 1, glue_edgs=False) for w in widths]
    fam = family(ribs_t)
    ks = np.linspace(0.0, 1.0, 9)[:, None]
    ev = fam.energies(ks)  # (P, B, nsta_max)
    assert ev.shape == (3, 9, 10)
    for p, (rib_r, w) in enumerate(zip(ribs_r, widths)):
        direct = rib_r.solve_all(ks)  # (nsta, B) reference layout
        nsta = direct.shape[0]
        np.testing.assert_allclose(
            ev[p][:, :nsta], np.sort(direct.T, axis=1), atol=1e-10
        )
        # padding sits strictly above every physical band
        if nsta < ev.shape[2]:
            assert ev[p][:, nsta:].min() > direct.max() + 0.5


def test_family_per_member_kpts():
    hal = _haldane(ptt)
    with redirect_stdout(io.StringIO()):
        m2 = hal.make_supercell([[2, 0], [0, 1]], to_home=False)
    fam = family([hal, m2])
    rng = np.random.RandomState(0)
    kpts = rng.rand(2, 5, 2)
    ev = fam.energies(kpts)
    assert ev.shape == (2, 5, 4)
    for p, m in enumerate((hal, m2)):
        direct = m.solve_all(kpts[p])
        np.testing.assert_allclose(
            ev[p][:, : direct.shape[0]], np.sort(direct.T, axis=1), atol=1e-10
        )


def test_family_spinful():
    """nspin=2 members with different graphs (Kane-Mele + its 2x1
    supercell): Z2-protected band structure energies must match the
    per-member solves, and family Chern of the Kramers-paired occupied
    manifold is 0."""
    km = zoo.kane_mele(ptt, "odd")
    with redirect_stdout(io.StringIO()):
        km2 = km.make_supercell([[2, 0], [0, 1]], to_home=False)
    fam = family([km, km2])
    ks = np.array([[0.1, 0.2], [0.35, 0.6]])
    ev = fam.energies(ks)
    for p, (m, no) in enumerate(((km, 2), (km2, 4))):
        direct = m.solve_all(ks)
        np.testing.assert_allclose(
            ev[p][:, : direct.shape[0]], np.sort(direct.T, axis=1), atol=1e-10
        )
    c = fam.chern(nocc=[2, 4], nk=(19, 19))
    np.testing.assert_allclose(c, [0.0, 0.0], atol=1e-9)


def test_family_validation():
    hal = _haldane(ptt)
    with pytest.raises(ptt.PythtbError):
        family([])
    with redirect_stdout(io.StringIO()):
        chain = ptt.models.chain()
    with pytest.raises(ptt.PythtbError):
        family([hal, chain])  # different dim_k/dim_r
    fam = family([hal])
    with pytest.raises(ptt.PythtbError):
        fam.chern(nocc=[5])  # nocc > nsta


@pytest.mark.parametrize("seed", range(6))
def test_family_fuzz_supercell_series(seed, ref):
    """Random 2D models: a family over supercell matrices must
    reproduce per-member reference energies exactly, and per-member
    wf_array fluxes where the occupied boundary is gapped."""
    from .test_fuzz_reference import _build_random

    with redirect_stdout(io.StringIO()):
        m_tpu, _ = _build_random(ptt, 700 + seed, force_2d=True)
        m_ref, _ = _build_random(ref, 700 + seed, force_2d=True)
        mats = [[[1, 0], [0, 1]], [[1, 1], [-1, 1]], [[2, 0], [0, 1]]]
        mem_t, mem_r = [], []
        for M in mats:
            mem_t.append(m_tpu.make_supercell(M, to_home=False))
            mem_r.append(m_ref.make_supercell(M, to_home=False))
    fam = family(mem_t)

    rng = np.random.RandomState(seed)
    kpts = rng.rand(4, 2)
    ev = fam.energies(kpts)
    for p, mr in enumerate(mem_r):
        direct = mr.solve_all(kpts)
        np.testing.assert_allclose(
            ev[p][:, : direct.shape[0]], np.sort(direct.T, axis=1), atol=1e-9
        )

    # flux of the lower half manifold, vs our wf_array per member, on
    # members whose occupied boundary is gapped everywhere
    nocc = [max(1, m._nsta // 2) for m in mem_t]
    probe = fam.energies(m_tpu.k_uniform_mesh([7, 7]))
    ok = [
        probe[p][:, nocc[p]].min() - probe[p][:, nocc[p] - 1].max() > 1e-4
        if nocc[p] < mem_t[p]._nsta else True
        for p in range(len(mem_t))
    ]
    if not any(ok):
        pytest.skip("no gapped member in this draw")
    c = fam.chern(nocc=nocc, nk=(13, 13))
    for p, m in enumerate(mem_t):
        if not ok[p]:
            continue
        wf = ptt.wf_array(m, [13, 13])
        wf.solve_on_grid([0.0, 0.0])
        refc = wf.berry_flux(list(range(nocc[p]))) / (2.0 * np.pi)
        np.testing.assert_allclose(c[p], refc, atol=1e-8)
