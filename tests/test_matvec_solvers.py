"""Matrix-free large-finite-model solvers: hop-table matvec, LOBPCG
lowest states, KPM density of states (upstream wish-list item
/root/reference/notes/TODO:58-59 "Finite sized models are hard to
solve. Maybe use some algorithm for sparse matrices?").

Oracles: the dense path of this package (itself golden-tested against
the reference) on models small enough to diagonalize."""

import numpy as np
import pytest

import jax.numpy as jnp

from pythtb_tpu import flows, magnetic, tb_model
from pythtb_tpu.models import library as zoo
from pythtb_tpu.ops.matvec import gershgorin_window, matvec, sparse_h


def haldane_flake(n1=8, n2=8):
    return zoo.haldane().cut_piece(n1, 0).cut_piece(n2, 1)


def km_flake(n1=4, n2=4):
    return zoo.kane_mele().cut_piece(n1, 0).cut_piece(n2, 1)


def _dense_H(model):
    """Dense Hamiltonian via the library's own gen_ham at no k."""
    return np.asarray(model.gen_ham()).reshape(model._nsta, model._nsta)


class TestMatvec:
    @pytest.mark.parametrize("flake", [haldane_flake(3, 3), km_flake(2, 2)])
    def test_matches_dense(self, flake):
        h = sparse_h(flake)
        H = _dense_H(flake)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(h.nsta, 3)) + 1j * rng.normal(size=(h.nsta, 3))
        shape = (h.norb, 2, 3) if h.nspin == 2 else (h.norb, 3)
        y = np.asarray(matvec(h, jnp.asarray(x.reshape(shape)))).reshape(h.nsta, 3)
        np.testing.assert_allclose(y, H @ x, atol=1e-12)

    def test_gershgorin_contains_spectrum(self):
        for flake in (haldane_flake(3, 3), km_flake(2, 2)):
            lo, hi = gershgorin_window(sparse_h(flake))
            ev = np.linalg.eigvalsh(_dense_H(flake))
            assert lo <= ev.min() and ev.max() <= hi

    def test_requires_finite_model(self):
        from pythtb_tpu import PythtbError

        with pytest.raises(PythtbError):
            sparse_h(zoo.haldane())


class TestSolveLowest:
    def test_haldane_flake_lowest(self):
        flake = haldane_flake()  # 128 orbitals
        dense = np.sort(np.linalg.eigvalsh(_dense_H(flake)))
        evals = flows.solve_lowest(flake, 6, max_iters=400)
        np.testing.assert_allclose(evals, dense[:6], atol=1e-8)

    def test_eigenvectors_and_layout(self):
        flake = haldane_flake(6, 6)
        H = _dense_H(flake)
        evals, evecs = flows.solve_lowest(flake, 4, eig_vectors=True, max_iters=400)
        assert evecs.shape == (4, flake._norb)
        for n in range(4):
            r = H @ evecs[n] - evals[n] * evecs[n]
            assert np.linalg.norm(r) < 1e-7

    def test_spinful_flake(self):
        flake = km_flake()  # 128 states
        dense = np.sort(np.linalg.eigvalsh(_dense_H(flake)))
        evals, evecs = flows.solve_lowest(flake, 5, eig_vectors=True, max_iters=500)
        np.testing.assert_allclose(evals, dense[:5], atol=1e-7)
        assert evecs.shape == (5, flake._norb, 2)

    def test_magnetic_flake_complex_hops(self):
        msc = magnetic.magnetic_supercell(zoo.square(), 1, 5)
        flake = msc.cut_piece(3, 0).cut_piece(15, 1)  # 225 sites
        dense = np.sort(np.linalg.eigvalsh(_dense_H(flake)))
        evals = flows.solve_lowest(flake, 8, max_iters=500)
        np.testing.assert_allclose(evals, dense[:8], atol=1e-7)

    def test_validation(self):
        flake = haldane_flake(2, 2)
        with pytest.raises(ValueError):
            flows.solve_lowest(flake, 1000)
        with pytest.raises(ValueError):
            flows.solve_lowest(flake, 0)


class TestKpmDos:
    def test_integral_and_shape_vs_dense(self):
        flake = haldane_flake(10, 10)  # 200 orbitals
        ev = np.linalg.eigvalsh(_dense_H(flake))
        energies, dos = flows.kpm_dos(
            flake, num_moments=256, num_vectors=16, n_energies=501, seed=1
        )
        de = energies[1] - energies[0]
        # normalization: integrates to the number of states
        assert abs(dos.sum() * de - flake._nsta) / flake._nsta < 0.02
        # shape: compare against a Gaussian-smoothed dense histogram at
        # matched broadening (Jackson kernel ~ Gaussian of width
        # pi*a/M); correlation is the robust check
        a = (energies[-1] - energies[0]) / 2
        sig = np.pi * a / 256
        dense_dos = np.exp(
            -0.5 * ((energies[:, None] - ev[None, :]) / sig) ** 2
        ).sum(axis=1) / (sig * np.sqrt(2 * np.pi))
        corr = np.corrcoef(dos, dense_dos)[0, 1]
        assert corr > 0.98
        # note the open Haldane flake correctly shows nonzero in-gap DOS
        # (chiral edge states); the dense-histogram correlation above
        # covers that structure too

    def test_trivial_gap_is_empty(self):
        # trivial insulator flake (no edge states): in-gap DOS ~ 0
        flake = zoo.bn(t=-1.0, delta=1.2).cut_piece(8, 0).cut_piece(8, 1)
        energies, dos = flows.kpm_dos(
            flake, num_moments=256, num_vectors=16, n_energies=301, seed=2
        )
        ev = np.linalg.eigvalsh(_dense_H(flake))
        gap_lo, gap_hi = ev[ev < 0].max(), ev[ev > 0].min()
        pad = 0.25 * (gap_hi - gap_lo)
        mask = (energies > gap_lo + pad) & (energies < gap_hi - pad)
        assert mask.any()
        assert dos[mask].max() < 0.05 * dos.max()

    def test_custom_energy_grid(self):
        flake = haldane_flake(5, 5)
        egrid = np.linspace(-1.0, 1.0, 51)
        energies, dos = flows.kpm_dos(flake, energies=egrid, num_moments=128)
        assert energies.shape == (51,) and dos.shape == (51,)
        assert np.all(np.isfinite(dos))

    def test_spinful_kpm(self):
        flake = km_flake(3, 3)  # 72 states, spin blocks
        ev = np.linalg.eigvalsh(_dense_H(flake))
        energies, dos = flows.kpm_dos(
            flake, num_moments=192, num_vectors=24, n_energies=301, seed=4
        )
        de = energies[1] - energies[0]
        assert abs(dos.sum() * de - flake._nsta) / flake._nsta < 0.03
        a = (energies[-1] - energies[0]) / 2
        sig = np.pi * a / 192
        dense_dos = np.exp(
            -0.5 * ((energies[:, None] - ev[None, :]) / sig) ** 2
        ).sum(axis=1) / (sig * np.sqrt(2 * np.pi))
        assert np.corrcoef(dos, dense_dos)[0, 1] > 0.97


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_fuzz_random_finite_models(seed):
    """Random finite models (random graphs, complex hops, random onsite,
    both spin sectors): matvec == dense, Gershgorin contains the
    spectrum, solve_lowest matches dense, KPM integrates to nsta."""
    rng = np.random.RandomState(200 + seed)
    nspin = 2 if seed % 3 == 0 else 1
    norb = rng.randint(60, 120)
    m = tb_model(0, 1, lat=[[1.0]], orb=[[i / norb] for i in range(norb)],
                 nspin=nspin)
    if nspin == 1:
        m.set_onsite(rng.randn(norb))
    else:
        # random Hermitian 2x2 onsite blocks, set via the matrix form
        for i in range(norb):
            b = rng.randn(2, 2) + 1j * rng.randn(2, 2)
            m._site_energies[i] = (b + b.conj().T) / 2
            m._site_energies_specified[i] = True
        m._invalidate()
    for _ in range(3 * norb):
        i, j = rng.randint(norb), rng.randint(norb)
        if i >= j:
            continue
        amp = rng.randn() + 1j * rng.randn()
        if nspin == 2:
            amp = rng.randn(2, 2) + 1j * rng.randn(2, 2)
        try:
            m.set_hop(amp, i, j, mode="set")
        except Exception:
            pass
    h = sparse_h(m)
    H = _dense_H(m)
    # matvec == dense
    x = rng.randn(h.nsta, 2) + 1j * rng.randn(h.nsta, 2)
    shape = (h.norb, 2, 2) if nspin == 2 else (h.norb, 2)
    y = np.asarray(matvec(h, jnp.asarray(x.reshape(shape)))).reshape(h.nsta, 2)
    np.testing.assert_allclose(y, H @ x, atol=1e-10)
    # Gershgorin window
    ev = np.linalg.eigvalsh(H)
    lo, hi = gershgorin_window(h)
    assert lo <= ev.min() + 1e-12 and ev.max() <= hi + 1e-12
    # lowest eigenpairs
    k = 4
    low = flows.solve_lowest(m, k, max_iters=600, tol=None)
    np.testing.assert_allclose(low, ev[:k], atol=1e-6)
    # KPM normalization
    e, d = flows.kpm_dos(m, num_moments=128, num_vectors=12, seed=seed)
    assert abs(d.sum() * (e[1] - e[0]) - h.nsta) / h.nsta < 0.05


from pythtb_tpu import PythtbError
from pythtb_tpu.ops.matvec import sparse_h_k as _sparse_h_k, to_dense as _to_dense


class TestSolveWindow:
    """Interior spectrum-slice solver (Chebyshev-filtered subspace
    iteration): differential oracles against dense eigensolvers."""

    def test_finite_interior_slice_matches_dense(self):
        m = (zoo.haldane().cut_piece(6, 0, glue_edgs=False)
             .cut_piece(6, 1, glue_edgs=False))
        h = sparse_h(m)
        ev_all = np.linalg.eigvalsh(_to_dense(h))
        sigma = 0.37
        w, vecs = flows.solve_window(m, 6, sigma, eig_vectors=True, seed=1)
        exact = np.sort(ev_all[np.argsort(np.abs(ev_all - sigma),
                                          kind="stable")[:6]])
        np.testing.assert_allclose(w, exact, atol=1e-10)
        H = _to_dense(h)
        r = np.abs(H @ vecs.T - vecs.T * w[None, :]).max()
        assert r < 1e-6

    def test_sparse_h_k_matches_assemble(self):
        from pythtb_tpu.ops.hamiltonian import assemble

        m = zoo.kane_mele(esite=0.7, rashba=0.3)
        k = np.array([0.31, 0.17])
        static, data = m._get_finalized()
        H_ref = np.asarray(assemble(static, data, np.asarray([k])))[0]
        H_ell = _to_dense(_sparse_h_k(m, k))
        np.testing.assert_allclose(H_ref, H_ell, atol=1e-14)

    def test_periodic_slice_matches_solve_all(self):
        m = zoo.kane_mele(esite=0.7, rashba=0.3).make_supercell(
            [[3, 0], [0, 3]])
        k = np.array([0.31, 0.17])
        ev = np.asarray(m.solve_all(np.array([k])))[:, 0]
        sigma = 0.5
        w, vecs = flows.solve_window(m, 4, sigma, k_point=k,
                                     eig_vectors=True, seed=2)
        exact = np.sort(ev[np.argsort(np.abs(ev - sigma),
                                      kind="stable")[:4]])
        np.testing.assert_allclose(w, exact, atol=1e-10)
        # eigenvector subspace: slice vectors live in the dense span
        assert vecs.shape == (4, m._norb, 2)
        H = _to_dense(_sparse_h_k(m, k))
        _, V = np.linalg.eigh(H)
        idx = np.argsort(np.abs(ev - sigma), kind="stable")[:4]
        Vd = V[:, np.sort(idx)]
        sv = np.linalg.svd(np.conj(Vd.T) @ vecs.reshape(4, -1).T,
                           compute_uv=False)
        np.testing.assert_allclose(sv, 1.0, atol=1e-6)

    @pytest.mark.slow
    def test_tbg_middle_four_matches_dense(self):
        from pythtb_tpu.models import moire

        t4 = moire.tbg(4)
        n = t4._nsta
        K = np.array([1.0 / 3.0, 2.0 / 3.0])
        ev4 = np.asarray(t4.solve_all(np.array([K])))[:, 0]
        sig = 0.5 * (ev4[n // 2 - 1] + ev4[n // 2])
        w4 = flows.solve_window(t4, 4, sig, k_point=K, seed=0)
        exact = np.sort(ev4[np.argsort(np.abs(ev4 - sig),
                                       kind="stable")[:4]])
        np.testing.assert_allclose(w4, exact, atol=1e-9)

    def test_guards(self):
        m = zoo.haldane()
        flake = m.cut_piece(3, 0, glue_edgs=False).cut_piece(
            3, 1, glue_edgs=False)
        with pytest.raises(PythtbError):
            flows.solve_window(m, 2, 0.0)  # periodic without k_point
        with pytest.raises(PythtbError):
            _sparse_h_k(flake, [0.0])  # finite model
        with pytest.raises(ValueError):
            flows.solve_window(flake, 2, 99.0)  # sigma outside window
        with pytest.raises(ValueError):
            flows.solve_window(flake, 12, 0.0)  # block >= nsta


def test_gershgorin_window_contains_spectrum_spinful_selfhops():
    """Review r4 regression: the nspin=2 Gershgorin window must fold
    same-orbital (i == j, R != 0) hop blocks into the diagonal --
    dropping them left the Kane-Mele spectrum outside the window and
    corrupted pinned-width slices."""
    m = zoo.kane_mele(esite=0.7, spin_orb=1.5, rashba=0.3).make_supercell(
        [[2, 0], [0, 2]])
    k = np.array([0.31, 0.17])
    h = _sparse_h_k(m, k)
    ev = np.linalg.eigvalsh(_to_dense(h))
    assert h.window[0] <= ev.min() and h.window[1] >= ev.max()
    w = flows.solve_window(m, 4, 0.5, k_point=k, seed=2)
    exact = np.sort(ev[np.argsort(np.abs(ev - 0.5), kind="stable")[:4]])
    np.testing.assert_allclose(w, exact, atol=1e-10)
    with pytest.raises(ValueError):
        flows.solve_window(m, 4, 0.5, k_point=k, max_rounds=0)


class TestWilsonWindow:
    """Windowed-manifold Wilson loops on solve_window states."""

    def test_matches_wf_array_on_folded_ssh(self):
        m = zoo.ssh(t=1.0, delta=0.4).make_supercell([[6]])
        L = 13
        loop = np.linspace(0, 1, L)[:, None]
        import pythtb_tpu as ptt

        wf = ptt.wf_array(m, [L])
        for j in range(L - 1):
            _ev, vec = m.solve_one(loop[j], eig_vectors=True)
            wf[j] = vec
        wf.impose_pbc(0, 0)
        ref = wf.berry_phase(list(range(6)), dir=0)
        evk = np.asarray(m.solve_all(loop[:1]))[:, 0]
        sigma = float(evk[:6].mean())
        w = flows.wilson_window(m, sigma, 6, loop, block=8, seed=3)
        assert abs(w - ref) < 1e-9
        # eigenphases of the folded chain: the equally spaced Zak
        # ladder (folding by 6 splits the Zak phase into 2 pi / 6 steps)
        we = flows.wilson_window(m, sigma, 6, loop, block=8,
                                 berry_evals=True, seed=3)
        assert abs(we.sum() - ref) < 1e-9
        steps = np.diff(we)
        np.testing.assert_allclose(steps, 2 * np.pi / 6, atol=1e-9)

    def test_singular_link_warning_and_guards(self):
        import pythtb_tpu as ptt

        # two DECOUPLED crossing bands: tracking the single state
        # nearest sigma swaps orbital character at the crossing, so a
        # link determinant is exactly 0 -- the warning must fire
        m = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.25], [0.5], [0.75]])
        m.set_onsite([0.0, 0.1, 3.0, -3.0])
        m.set_hop(1.0, 0, 0, [1])   # e = 2 cos(2 pi k)
        m.set_hop(-1.0, 1, 1, [1])  # e = 0.1 - 2 cos: crosses band 0
        loop = np.linspace(0, 1, 13)[:, None]
        with pytest.warns(UserWarning, match="near-singular link"):
            flows.wilson_window(m, 1.0, 1, loop, block=3, seed=3)
        with pytest.raises(PythtbError):
            flows.wilson_window(m, 0.0, 2, loop[:2], block=3)  # L < 3
        with pytest.raises(PythtbError):
            bad = np.concatenate([loop[:-1], [[0.37]]], axis=0)
            flows.wilson_window(m, 0.0, 2, bad, block=3)  # not closed


def test_chern_window_matches_chern_number():
    """The windowed plaquette Chern number of the folded Haldane lower
    manifold equals the package chern_number (same flux-orientation
    convention), and the upper manifold carries the opposite charge."""
    import pythtb_tpu as ptt

    m = zoo.haldane().make_supercell([[2, 0], [0, 2]])
    evk = np.asarray(m.solve_all(np.array([[0.13, 0.21]])))[:, 0]
    lo = float(evk[:4].mean())
    hi = float(evk[4:].mean())
    cw = flows.chern_window(m, lo, 4, nk=(12, 12), block=6, seed=1)
    ref = flows.chern_number(m, [0, 1, 2, 3], nk=(31, 31))
    assert abs(cw - ref) < 1e-6
    cw_up = flows.chern_window(m, hi, 4, nk=(12, 12), block=6, seed=1)
    assert abs(cw_up + ref) < 1e-6
    with pytest.raises(PythtbError):
        flows.chern_window(zoo.ssh(), 0.0, 1, nk=(8, 8))  # dim_k != 2
