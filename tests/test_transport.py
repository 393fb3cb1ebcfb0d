"""Smooth-gauge (MV1997 parallel transport) and adiabatic-evolution
tests (upstream wish-list features, /root/reference/notes/TODO:17-20
and :46-48; no reference implementation exists, so the oracles here are
the mathematical definitions themselves)."""

import numpy as np
import pytest

from pythtb_tpu import tb_model, wf_array
from pythtb_tpu.models import library as zoo


class TestSmoothGauge:
    def _haldane_loop(self, nk=13):
        m = zoo.haldane()
        wf = wf_array(m, [nk, nk])
        wf.solve_on_grid([-0.5, -0.5])
        return wf

    def test_parallel_transport_links_hermitian_positive(self):
        wf = self._haldane_loop()
        occ = [0]
        wf.smooth_gauge(occ, dir=0, closed=False)
        w = np.asarray(wf._wfs)[:, :, 0, :]  # (n0, n1, orb)
        ovr = np.einsum("kjf,kjf->kj", w[:-1].conj(), w[1:])
        # single band: parallel transport makes every link overlap real
        # and positive
        assert np.all(ovr.real > 0)
        np.testing.assert_allclose(ovr.imag, 0.0, atol=1e-12)

    def test_twisted_links_share_the_loop_phase(self):
        wf = self._haldane_loop()
        wf.impose_pbc(0, 0)
        wf.impose_pbc(1, 1)
        phases_before = wf.berry_phase([0], dir=0, contin=False)
        wf.smooth_gauge([0], dir=0, closed=True)
        w = np.asarray(wf._wfs)[:, :, 0, :]
        ovr = np.einsum("kjf,kjf->kj", w[:-1].conj(), w[1:])
        ang = np.angle(ovr)
        # every link along each string carries the same twist phi/N
        assert np.abs(ang - ang[0][None, :]).max() < 1e-10
        # and N * twist recovers the Berry phase (mod 2pi)
        n_links = w.shape[0] - 1
        total = -np.angle(np.exp(1j * n_links * ang[0]))
        np.testing.assert_allclose(
            np.angle(np.exp(1j * (total - phases_before))), 0.0, atol=1e-8
        )

    def test_gauge_invariants_and_subspace_unchanged(self):
        wf = self._haldane_loop()
        wf.impose_pbc(0, 0)
        wf.impose_pbc(1, 1)
        flux_before = wf.berry_flux([0])
        proj_before = np.einsum(
            "kjf,kjg->kjfg",
            np.asarray(wf._wfs)[:, :, 0, :].conj(),
            np.asarray(wf._wfs)[:, :, 0, :],
        )
        wf.smooth_gauge([0], dir=1, closed=True)
        flux_after = wf.berry_flux([0])
        proj_after = np.einsum(
            "kjf,kjg->kjfg",
            np.asarray(wf._wfs)[:, :, 0, :].conj(),
            np.asarray(wf._wfs)[:, :, 0, :],
        )
        np.testing.assert_allclose(flux_before, flux_after, atol=1e-10)
        np.testing.assert_allclose(proj_before, proj_after, atol=1e-10)

    def test_endpoints_preserved_closed(self):
        wf = self._haldane_loop()
        wf.impose_pbc(0, 0)
        before_first = np.copy(np.asarray(wf._wfs)[0])
        before_last = np.copy(np.asarray(wf._wfs)[-1])
        wf.smooth_gauge("All", dir=0, closed=True)
        np.testing.assert_allclose(np.asarray(wf._wfs)[0], before_first, atol=1e-12)
        np.testing.assert_allclose(np.asarray(wf._wfs)[-1], before_last, atol=1e-10)

    def test_multiband_spinful(self):
        km = zoo.kane_mele()
        wf = wf_array(km, [9, 9])
        wf.solve_on_grid([0.0, 0.0])
        wf.impose_pbc(0, 0)
        evals_before = wf.berry_phase([0, 1], dir=0, contin=False, berry_evals=True)
        wf.smooth_gauge([0, 1], dir=0, closed=True)
        evals_after = wf.berry_phase([0, 1], dir=0, contin=False, berry_evals=True)
        np.testing.assert_allclose(evals_before, evals_after, atol=1e-9)
        # multiband twisted transport: the PARTIAL Wilson products
        # C_M = W''_0 ... W''_{M-1} of the smoothed gauge are similar to
        # Lambda^{M/N} -- their eigenphases grow exactly linearly along
        # the string (the multiband form of "the twist is distributed
        # evenly"; individual links carry conjugated twists instead)
        w = wf._wfs[:, :, :2].reshape(9, 9, 2, -1)
        ovr = np.einsum("kjnf,kjmf->kjnm", w[:-1].conj(), w[1:])
        U, _, Vh = np.linalg.svd(ovr)
        Wl = U @ Vh  # (8, 9, 2, 2) unitarized links
        theta = None
        prod = np.broadcast_to(np.eye(2), Wl.shape[1:]).copy()
        partial = []
        for m in range(8):
            prod = prod @ Wl[m]
            partial.append(np.sort(np.angle(np.linalg.eigvals(prod)), axis=-1))
        theta = partial[-1]  # full holonomy eigenphases (9, 2)
        for m in range(8):
            expect = np.sort((m + 1) / 8.0 * theta, axis=-1)
            np.testing.assert_allclose(partial[m], expect, atol=1e-8)


class TestAdiabaticEvolve:
    def _crossing_array(self, eps, nl=21):
        """Two-level dim_k=0 model family crossing at lambda=0.5 with
        coupling eps; wf_array filled along the lambda axis."""
        models = []
        for lam in np.linspace(0.0, 1.0, nl):
            m = tb_model(0, 1, lat=[[1.0]], orb=[[0.0], [0.0]])
            m.set_onsite([lam - 0.5, 0.5 - lam])
            if eps != 0.0:
                m.set_hop(eps, 0, 1, mode="set", allow_conjugate_pair=True)
            models.append(m)
        wf = wf_array(models[0], [nl])
        for i, m in enumerate(models):
            _, evec = m.solve_all(eig_vectors=True)
            wf[i] = evec
        return wf

    def test_exact_crossing_follows_the_state(self):
        # eps=0: levels cross; the adiabatic state KEEPS its character,
        # so its energy-ordered index flips 0 -> 1 across the crossing
        wf = self._crossing_array(0.0)
        idx, fid = wf.adiabatic_evolve([0], dir=0)
        assert idx.shape == (21, 1)
        assert idx[0, 0] == 0 and idx[-1, 0] == 1
        np.testing.assert_allclose(fid, 1.0, atol=1e-12)

    def test_avoided_crossing_follows_the_band(self):
        # large gap: adiabatic evolution stays in the lowest band
        wf = self._crossing_array(0.4)
        idx, fid = wf.adiabatic_evolve([0], dir=0)
        assert np.all(idx[:, 0] == 0)
        assert fid.min() > 0.99

    def test_diabatic_leakage_flagged(self):
        # a tiny gap crossed in one coarse step: the subspace cannot be
        # fully captured -- fidelity must dip well below 1
        wf = self._crossing_array(1e-3, nl=5)
        idx, fid = wf.adiabatic_evolve([0], dir=0)
        assert fid.min() < 0.9

    def test_charge_pump_returns_home(self):
        # 3-site pump (Chern 1 on the k x lambda torus): following the
        # lowest band around the closed lambda loop returns to itself
        nl = 31
        wf = None
        for i, lam in enumerate(np.linspace(0.0, 1.0, nl)):
            m = zoo.three_site_chain(lam)
            if wf is None:
                wf = wf_array(m, [nl, 9])
            kpts = np.arange(8) / 8.0
            _, evec = m.solve_all(kpts[:, None], eig_vectors=True)
            for j in range(8):
                wf[i, j] = evec[:, j, :]
        wf.impose_pbc(1, 0)
        wf.impose_loop(0)
        idx, fid, followed = wf.adiabatic_evolve([0], dir=0, return_states=True)
        assert np.all(idx[0] == idx[-1])
        assert fid.min() > 0.95
        # followed states at the endpoint span the same subspace as the
        # start (the pump returns the band to itself)
        w = followed._wfs
        p0 = np.einsum("jf,jg->fg", w[0, 0].reshape(1, -1).conj(), w[0, 0].reshape(1, -1))
        p1 = np.einsum("jf,jg->fg", w[-1, 0].reshape(1, -1).conj(), w[-1, 0].reshape(1, -1))
        np.testing.assert_allclose(p0, p1, atol=1e-9)

    def test_subspace_evolution_two_bands(self):
        km = zoo.kane_mele()
        wf = wf_array(km, [13, 5])
        wf.solve_on_grid([0.0, 0.0])
        idx, fid = wf.adiabatic_evolve([0, 1], dir=0)
        assert idx.shape == (13, 5, 2)
        # gapped, but the 13-point axis steps near the K-point minimum
        # gap are coarse; ~0.88 captured there is the honest value
        assert fid.min() > 0.85
        assert np.all(np.sort(idx, axis=-1) == idx)  # indices sorted


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_smooth_gauge_random_states(seed):
    """smooth_gauge on completely random orthonormal frames (not
    eigenstates of anything): subspaces and gauge invariants preserved,
    endpoints fixed, transported links Hermitian-positive."""
    rng = np.random.RandomState(40 + seed)
    norb = rng.randint(2, 5)
    nocc = rng.randint(1, norb + 1)
    L = rng.randint(4, 9)
    m = tb_model(1, 1, lat=[[1.0]], orb=[[i / norb] for i in range(norb)])
    wf = wf_array(m, [L])
    states = rng.randn(L, norb, norb) + 1j * rng.randn(L, norb, norb)
    for i in range(L):
        q, _ = np.linalg.qr(states[i].T)
        wf[i] = q.T  # orthonormal rows
    wf.impose_loop(0)

    occ = list(range(nocc))
    before = np.asarray(wf._wfs).copy()
    ph_before = wf.berry_phase(occ, dir=0, contin=False)
    wf.smooth_gauge(occ, dir=0, closed=True)
    after = np.asarray(wf._wfs)

    # endpoints untouched; unchosen states untouched
    np.testing.assert_allclose(after[0], before[0], atol=1e-12)
    np.testing.assert_allclose(after[-1], before[-1], atol=1e-10)
    np.testing.assert_allclose(after[:, nocc:], before[:, nocc:], atol=0)
    # subspace projectors identical at every point
    pb = np.einsum("lnf,lng->lfg", before[:, :nocc].conj(), before[:, :nocc])
    pa = np.einsum("lnf,lng->lfg", after[:, :nocc].conj(), after[:, :nocc])
    np.testing.assert_allclose(pa, pb, atol=1e-10)
    # orthonormality preserved
    g = np.einsum("lnf,lmf->lnm", after[:, :nocc].conj(), after[:, :nocc])
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(nocc), g.shape), atol=1e-10)
    # Berry phase (gauge invariant) unchanged
    ph_after = wf.berry_phase(occ, dir=0, contin=False)
    assert abs(np.angle(np.exp(1j * (ph_after - ph_before)))) < 1e-8

    # pure parallel transport: every link overlap Hermitian positive
    wf2 = wf_array(m, [L])
    wf2._wfs = before.copy()
    wf2.smooth_gauge(occ, dir=0, closed=False)
    w2 = np.asarray(wf2._wfs)[:, :nocc]
    ovr = np.einsum("lnf,lmf->lnm", w2[:-1].conj(), w2[1:])
    herm = np.abs(ovr - np.swapaxes(ovr.conj(), -1, -2)).max()
    assert herm < 1e-10
    evs = np.linalg.eigvalsh((ovr + np.swapaxes(ovr.conj(), -1, -2)) / 2)
    assert evs.min() > 0.0  # positive definite (random frames overlap)
