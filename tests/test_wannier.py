"""Projection-based Wannier interpolation (no reference counterpart --
the reference can only import Wannier90 output, it cannot produce
Wannier-interpolated bands itself)."""

import numpy as np
import pytest

from pythtb_tpu import wannier
from pythtb_tpu.models import library as zoo


def _err(model, occ, nk, seed=1, **kw):
    itp = wannier.interpolator(model, occ, nk=nk, **kw)
    rng = np.random.RandomState(seed)
    k = rng.rand(12, model._dim_k)
    return np.abs(itp.bands(k) - model.solve_all(k)[np.array(occ)]).max(), itp


class TestExactness:
    def test_full_space_is_exact(self):
        # projecting onto the FULL state space reproduces H'(k) itself:
        # finite-range hoppings are recovered exactly and interpolation
        # is exact at ALL k, not just grid points
        for m, nk in ((zoo.graphene(delta=0.3), 6), (zoo.trestle(), 8),
                      (zoo.cscl(), 4)):
            err, itp = _err(m, list(range(m._nsta)), nk)
            assert err < 1e-12, type(m)
            assert itp.min_projection_sv > 0.99

    def test_full_space_recovers_hoppings(self):
        # graphene NN model: H(R) nonzero only for the actual bonds.
        # identity trials pin the projected basis to the orbital basis
        # (the auto trials span the same space but in an arbitrary
        # rotation, which conjugates H(R) without changing bands)
        g = zoo.graphene(delta=0.3)
        itp = wannier.interpolator(g, [0, 1], nk=6, trial=np.eye(2))
        hr = itp.hoppings
        Rs = itp.r_vectors()
        far = np.abs(Rs).max(axis=1) > 1
        assert np.abs(hr[far]).max() < 1e-12
        # the R=0 block carries the onsite energies
        i0 = np.nonzero((Rs == 0).all(axis=1))[0][0]
        np.testing.assert_allclose(np.diag(hr[i0]).real, [-0.3, 0.3], atol=1e-12)

    def test_exact_at_coarse_grid_points(self):
        # subset groups: B(k) is similar to diag(E) at every grid point
        m = zoo.bn()
        itp = wannier.interpolator(m, [0], nk=8)
        kgrid = np.array([[i / 8.0, j / 8.0] for i in range(8) for j in range(8)])
        np.testing.assert_allclose(
            itp.bands(kgrid), m.solve_all(kgrid)[:1], atol=1e-10
        )


class TestConvergence:
    def test_isolated_band_error_decays(self):
        errs = [_err(zoo.bn(), [0], nk)[0] for nk in (6, 10, 14)]
        assert errs[1] < errs[0] / 3 and errs[2] < errs[1] / 3
        assert errs[2] < 5e-3

    def test_spinful_kramers_group(self):
        err, itp = _err(zoo.kane_mele(esite=2.5), [0, 1], 10)
        assert err < 5e-3 and itp.min_projection_sv > 0.8

    def test_hoppings_decay(self):
        itp = wannier.interpolator(zoo.bn(), [0], nk=12)
        hr = np.abs(itp.hoppings).ravel()
        Rs = np.abs(itp.r_vectors()).max(axis=1)
        near = hr[Rs <= 1].max()
        far = hr[Rs >= 5].max()
        assert far < 1e-2 * near  # exponential decay of effective hops


class TestObstruction:
    def test_topological_groups_flag_low_projection(self):
        # a Chern band / z2 pair cannot be smoothly Wannierized: the
        # projection singular value dips far below the trivial case
        _, itp_triv = _err(zoo.kane_mele(esite=2.5), [0, 1], 12)
        _, itp_topo = _err(zoo.kane_mele(esite=1.0), [0, 1], 12)
        assert itp_topo.min_projection_sv < 0.5 * itp_triv.min_projection_sv

    def test_custom_trial_vectors(self):
        m = zoo.bn()
        # sublattice-resolved trial for the lower (B-dominated) band
        err, itp = _err(m, [0], 10, trial=np.array([[0.0, 1.0]]))
        k = np.random.RandomState(3).rand(8, 2)
        assert np.isfinite(itp.bands(k)).all() and err < 5e-2

    def test_validation(self):
        from pythtb_tpu import PythtbError

        with pytest.raises(PythtbError):
            wannier.interpolator(zoo.molecule_nh3(), [0], nk=4)  # finite
        with pytest.raises(IndexError):
            wannier.interpolator(zoo.bn(), [7], nk=4)
        with pytest.raises(PythtbError):
            wannier.interpolator(zoo.bn(), [0], nk=(4, 4, 4))  # wrong dim


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_full_space_exactness(seed):
    """Random models (1-D/2-D, random graphs, complex hops, spinless or
    spinful): full-space projection must recover the finite-range model
    exactly, so interpolation is exact at ANY k once the coarse grid
    covers the hopping range."""
    import pythtb_tpu as ptt

    rng = np.random.RandomState(600 + seed)
    dim = rng.randint(1, 3)
    nspin = 2 if seed % 2 else 1
    norb = rng.randint(1, 3)
    m = ptt.tb_model(dim, dim, lat=np.eye(dim).tolist(),
                     orb=rng.rand(norb, dim).tolist(), nspin=nspin)
    if nspin == 1:
        m.set_onsite(rng.randn(norb))
    else:
        m.set_onsite([[rng.randn(), rng.randn(), rng.randn(), rng.randn()]
                      for _ in range(norb)])
    maxR = 2
    added = 0
    for _ in range(10):
        i, j = rng.randint(norb), rng.randint(norb)
        R = [int(rng.randint(-maxR, maxR + 1)) for _ in range(dim)]
        if (tuple(R) < tuple([0] * dim)) or (tuple(R) == tuple([0] * dim) and i >= j):
            continue
        amp = rng.randn() + 1j * rng.randn()
        if nspin == 2:
            amp = rng.randn(2, 2) + 1j * rng.randn(2, 2)
        try:
            m.set_hop(amp, i, j, R, mode="set")
            added += 1
        except Exception:
            pass
    if added == 0:
        m.set_hop(1.0, 0, 0, [1] * dim)
    nsta = norb * nspin
    nk = 2 * maxR + 2  # covers every |R| <= maxR without aliasing
    itp = wannier.interpolator(m, list(range(nsta)), nk=nk, trial=np.eye(nsta))
    k = rng.rand(8, dim)
    np.testing.assert_allclose(itp.bands(k), m.solve_all(k), atol=1e-9)
    assert itp.min_projection_sv > 0.999


# -- MLWF machinery: b-shells, MV localization, SMV disentanglement ---


class TestBShells:
    def test_completeness_across_lattices(self):
        """B1 condition sum_b w_b b b^T = I (in the periodic span) for
        cubic/fcc/hex/chain/anisotropic/slab lattices."""
        from pythtb_tpu.wannier import _bshells, _neighbor_index

        cases = [
            (np.eye(3), [0, 1, 2], (4, 4, 4)),
            ([[0.0, 2.7, 2.7], [2.7, 0.0, 2.7], [2.7, 2.7, 0.0]],
             [0, 1, 2], (6, 6, 6)),
            ([[1.0, 0.0], [0.5, np.sqrt(3) / 2]], [0, 1], (6, 6)),
            ([[1.0]], [0], (8,)),
            ([[1.0, 0.0], [0.0, 2.3]], [0, 1], (6, 4)),
            (np.eye(3), [0, 1], (5, 5)),  # 2 periodic dirs of a 3D lattice
        ]
        for lat, per, nk in cases:
            b_int, b_cart, w_b = _bshells(lat, per, nk)
            A = np.asarray(lat, dtype=float)[per, :]
            G = 2 * np.pi * np.linalg.solve(A @ A.T, A)
            Q = np.linalg.svd(G, full_matrices=False)[2]
            bq = b_cart @ Q.T
            C = np.einsum("b,bi,bj->ij", w_b, bq, bq)
            np.testing.assert_allclose(C, np.eye(len(per)), atol=1e-8)
            # neighbor map: +b then -b returns home
            nbr = _neighbor_index(nk, b_int)
            for bidx in range(len(w_b)):
                mb = np.where((b_int == -b_int[bidx]).all(1))[0]
                assert len(mb) == 1
                assert np.all(
                    nbr[nbr[:, bidx], mb[0]] == np.arange(np.prod(nk))
                )


class TestMaxLocalize:
    def test_gradient_is_descent_direction(self):
        """The MV update direction +G must decrease the spread (the
        committed sign convention, checked against finite differences)."""
        import jax
        import jax.numpy as jnp

        from pythtb_tpu.wannier import (
            _bshells, _expm_antiherm, _gauge_overlaps, _mv_gradient,
            _neighbor_index, _spread_terms,
        )
        from pythtb_tpu.ops.eigh import eigh_batched
        from pythtb_tpu.ops.hamiltonian import assemble
        from pythtb_tpu.ops.solver import device_uniform_grid

        m = zoo.bbh()
        static, data = m._get_finalized()
        nk = (6, 6)
        kpts = device_uniform_grid(nk, jnp.zeros((2,)))
        _, vecs = eigh_batched(assemble(static, data, kpts))
        u = vecs[:, :2, :]
        t = np.asarray(m._orb)[:, m._per].T
        u = u * jnp.exp(
            2j * jnp.pi * jnp.einsum("bd,ds->bs", kpts, jnp.asarray(t))
        )[:, None, :]
        b_int, b_cart, w_b = _bshells(m._lat, m._per, nk)
        nbr = jnp.asarray(_neighbor_index(nk, b_int))
        w_b = jnp.asarray(w_b)
        b_cart = jnp.asarray(b_cart)
        M0 = jnp.einsum("kms,kbns->kbmn", jnp.conj(u), u[nbr])

        def omega(U):
            M = _gauge_overlaps(M0, U, nbr)
            rbar, oi, ot = _spread_terms(M, w_b, b_cart)
            return float(oi + ot), rbar

        B = M0.shape[0]
        U = jnp.broadcast_to(jnp.eye(2, dtype=M0.dtype), (B, 2, 2))
        om0, rbar = omega(U)
        M = _gauge_overlaps(M0, U, nbr)
        G = _mv_gradient(M, w_b, b_cart, rbar)
        for eps in (1e-3, 1e-2):
            om_plus, _ = omega(
                jnp.einsum("kij,kjl->kil", U, _expm_antiherm(eps * G))
            )
            assert om_plus < om0

    def test_localize_reduces_spread_and_error(self):
        """Valence-only silicon at a small grid: MV localization must cut
        both the gauge-dependent spread and the interpolation error vs
        the one-shot projection (the round-2 documented failure mode)."""
        import pathlib
        import warnings

        from pythtb_tpu import w90

        d = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")
        si = w90(d, "silicon").model(min_hopping_norm=0.01)
        kp = si.k_path(
            [[0.5, 0.5, 0.5], [0, 0, 0], [0.5, -0.5, 0.0]], 31, report=False
        )[0]
        direct = si.solve_all(kp)[:4]
        g = np.eye(8)[:4]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            one_shot = wannier.interpolator(si, [0, 1, 2, 3], nk=6, trial=g)
            err0 = np.abs(one_shot.bands(kp) - direct).max()
            loc = wannier.interpolator(
                si, [0, 1, 2, 3], nk=6, trial=g, localize=400
            )
            err1 = np.abs(loc.bands(kp) - direct).max()
        assert loc.spread_history[-1] < loc.spread_history[0]
        assert loc.omega_tilde < 2.0
        assert err1 < 0.7 * err0

    def test_localize_gauge_invariant_at_grid_points(self):
        """Localization changes the gauge only: eigenvalues at the
        coarse-grid points stay exact."""
        import warnings

        m = zoo.checkerboard()
        kg = m.k_uniform_mesh((6, 6))
        direct = m.solve_all(kg)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            itp = wannier.interpolator(m, [0, 1], nk=6, localize=150)
        np.testing.assert_allclose(itp.bands(kg), direct, atol=1e-10)

    def test_multigrid_matches_direct_fine_build(self):
        """coarse_nk refinement: the fine projection onto the coarse
        Wannier vectors is near-unitary (Fourier-inversion consistency)
        and the result interpolates at least as well as the coarse run."""
        import pathlib
        import warnings

        from pythtb_tpu import w90

        d = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")
        si = w90(d, "silicon").model(min_hopping_norm=0.01)
        kp = si.k_path([[0.5, 0.5, 0.5], [0, 0, 0]], 21, report=False)[0]
        direct = si.solve_all(kp)[:4]
        g = np.eye(8)[:4]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            coarse = wannier.interpolator(
                si, [0, 1, 2, 3], nk=6, trial=g, localize=400
            )
            fine = wannier.interpolator(
                si, [0, 1, 2, 3], nk=12, trial=g, localize=400, coarse_nk=6
            )
        assert fine.min_projection_sv > 0.8  # WF trials project cleanly
        errc = np.abs(coarse.bands(kp) - direct).max()
        errf = np.abs(fine.bands(kp) - direct).max()
        assert errf < 0.5 * errc


class TestDisentangle:
    def _union(self, coupled):
        from pythtb_tpu import tb_model

        lat = [[1.0, 0.0], [0.0, 1.0]]
        orb = [[0.0, 0.0], [0.5, 0.5], [0.25, 0.75]]
        m = tb_model(2, 2, lat, orb)
        m.set_onsite([-1.2, 1.2, 0.0])
        m.set_hop(0.4, 0, 1, [0, 0])
        m.set_hop(0.35, 0, 1, [1, 0])
        m.set_hop(0.27, 0, 1, [0, 1])
        m.set_hop(-0.15, 0, 0, [1, 0])
        m.set_hop(0.12, 1, 1, [0, 1])
        m.set_hop(1.3, 2, 2, [1, 0])
        m.set_hop(1.1, 2, 2, [0, 1])
        if coupled:
            m.set_hop(0.2, 1, 2, [0, 0])
            m.set_hop(0.15, 0, 2, [1, 0])
        return m

    def test_decoupled_union_recovers_block_exactly(self):
        """Oracle: a 2-band model A plus an overlapping decoupled
        spectator band.  SMV disentanglement of nw=2 must recover A's
        invariant subspace, and interpolation then reproduces A's bands
        EXACTLY at all k (finite-range block, full-subspace gauge)."""
        from pythtb_tpu import tb_model

        m = self._union(False)
        mA = tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]],
                      [[0.0, 0.0], [0.5, 0.5]])
        mA.set_onsite([-1.2, 1.2])
        mA.set_hop(0.4, 0, 1, [0, 0])
        mA.set_hop(0.35, 0, 1, [1, 0])
        mA.set_hop(0.27, 0, 1, [0, 1])
        mA.set_hop(-0.15, 0, 0, [1, 0])
        mA.set_hop(0.12, 1, 1, [0, 1])
        kf = np.random.default_rng(1).random((40, 2))
        trial = np.zeros((2, 3), complex)
        trial[0, 0] = 1
        trial[1, 1] = 1
        itp = wannier.disentangled_interpolator(
            m, nw=2, nk=8, window=(-10, 10), trial=trial, dis_steps=60,
            localize=100,
        )
        err = np.abs(itp.bands(kf) - mA.solve_all(kf)).max()
        assert err < 1e-10
        assert itp.min_projection_sv > 0.99

    def test_frozen_window_reproduced(self):
        """With genuine hybridization, bands inside the frozen window
        must be reproduced by the disentangled interpolation."""
        import warnings

        m = self._union(True)
        kf = np.random.default_rng(2).random((60, 2))
        direct = m.solve_all(kf)
        frozen = (-2.2, -0.6)
        trial = np.zeros((2, 3), complex)
        trial[0, 0] = 1
        trial[1, 1] = 1
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            itp = wannier.disentangled_interpolator(
                m, nw=2, nk=10, window=(-6, 6), frozen=frozen, trial=trial,
                dis_steps=80, localize=150,
            )
        bands = itp.bands(kf)
        errs = []
        for kidx in range(kf.shape[0]):
            for e in direct[:, kidx]:
                if frozen[0] + 0.1 < e < frozen[1] - 0.1:
                    errs.append(np.abs(bands[:, kidx] - e).min())
        assert len(errs) > 20
        assert max(errs) < 5e-3

    def test_window_validation(self):
        m = self._union(True)
        with pytest.raises(Exception, match="window"):
            wannier.disentangled_interpolator(
                m, nw=2, nk=6, window=(-1.4, -1.2)
            )  # too few bands in window somewhere
        with pytest.raises(Exception, match="frozen"):
            wannier.disentangled_interpolator(
                m, nw=2, nk=6, window=(-6, 6), frozen=(-7, 0)
            )  # frozen outside outer


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_decoupled_union_disentangle(seed):
    """Random decoupled-union oracle: random 2-orbital block A plus a
    random overlapping spectator; disentanglement must recover A's
    bands exactly."""
    from pythtb_tpu import tb_model

    rng = np.random.default_rng(100 + seed)
    lat = [[1.0, 0.0], [0.0, 1.0]]
    orb = [[0.0, 0.0], [0.37, 0.61], [0.21, 0.83]]

    def hop():
        return rng.normal() * 0.5 + 1j * rng.normal() * 0.3

    on = rng.normal(size=2) * 1.5
    hops = [
        (hop(), 0, 1, (0, 0)), (hop(), 0, 1, (1, 0)), (hop(), 0, 1, (0, 1)),
        (hop(), 0, 0, (1, 0)), (hop(), 1, 1, (0, 1)),
    ]
    m = tb_model(2, 2, lat, orb)
    mA = tb_model(2, 2, lat, orb[:2])
    m.set_onsite(list(on) + [rng.normal() * 0.5])
    mA.set_onsite(list(on))
    for amp, i, j, R in hops:
        m.set_hop(amp, i, j, list(R))
        mA.set_hop(amp, i, j, list(R))
    m.set_hop(1.0 + 0.5 * rng.random(), 2, 2, [1, 0])
    m.set_hop(1.0 + 0.5 * rng.random(), 2, 2, [0, 1])
    kf = rng.random((25, 2))
    trial = np.zeros((2, 3), complex)
    trial[0, 0] = 1
    trial[1, 1] = 1
    itp = wannier.disentangled_interpolator(
        m, nw=2, nk=8, window=(-12, 12), trial=trial, dis_steps=60,
        localize=80,
    )
    err = np.abs(itp.bands(kf) - mA.solve_all(kf)).max()
    assert err < 1e-9, err


@pytest.mark.slow
def test_silicon_valence_submev():
    """THE round-2 'What's missing' #1 criterion: valence-only silicon
    interpolates to <= 1e-3 eV against direct diagonalization on a fine
    path through L-Gamma-X-K-Gamma, with a healthy projection singular
    value.  Multigrid MLWF: coarse 8^3 localization -> 28^3 refinement
    by Wannier-vector projection (near-unitary by Fourier inversion)."""
    import pathlib
    import warnings

    from pythtb_tpu import w90

    d = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")
    si = w90(d, "silicon").model(min_hopping_norm=0.01)
    path = [[0.5, 0.5, 0.5], [0, 0, 0], [0.5, -0.5, 0.0],
            [0.375, -0.375, 0.0], [0, 0, 0]]
    kp = si.k_path(path, 101, report=False)[0]
    direct = si.solve_all(kp)[:4]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        itp = wannier.interpolator(
            si, [0, 1, 2, 3], nk=28, trial=np.eye(8)[:4], localize=400,
            coarse_nk=8, polish=0,
        )
    err = np.abs(itp.bands(kp) - direct).max()
    assert err < 1.0e-3, err
    assert itp.min_projection_sv > 0.9


class TestDownfold:
    def test_full_space_model_roundtrip(self):
        """Downfolding the FULL state space reproduces the original
        model's bands exactly at any k (finite-range H recovered)."""
        m = zoo.graphene(delta=0.3)
        kf = np.random.default_rng(0).random((25, 2))
        for nk in (7, 8):  # odd (paired R grid) and even (boundary rows)
            eff = wannier.interpolator(m, [0, 1], nk=nk).model()
            err = np.abs(eff.solve_all(kf) - m.solve_all(kf)).max()
            assert err < 1e-12, (nk, err)

    def test_downfolded_model_matches_bands(self):
        """model() and bands() must agree exactly -- including the
        even-grid boundary R rows, which have no -R partner and enter
        at half amplitude (the Hermitization bands() applies)."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            itp = wannier.interpolator(zoo.bbh(), [0, 1], nk=8, localize=100)
        eff = itp.model()
        kf = np.random.default_rng(1).random((25, 2))
        np.testing.assert_allclose(eff.solve_all(kf), itp.bands(kf),
                                   atol=1e-12)
        # centers became home-cell orbital positions
        assert eff._norb == 2
        assert eff._assume_position_operator_diagonal is False

    def test_downfolded_model_composes_with_surgery(self):
        """The effective model is an ordinary tb_model: cut_piece and
        the surface machinery run on it."""
        import warnings

        from pythtb_tpu import surface

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            itp = wannier.interpolator(zoo.checkerboard(), [0, 1], nk=8,
                                       localize=100)
        eff = itp.model()
        rib = eff.cut_piece(6, 0, glue_edgs=False)
        assert rib.solve_all(rib.k_path("full", 5, report=False)[0]).shape \
            == (12, 5)
        A = surface.spectral_function(eff, 0, k_par=np.array([[0.3]]),
                                      energies=np.array([0.0]), eta=0.1)
        assert np.isfinite(A).all()

    def test_min_hopping_norm_prunes(self):
        # a PROJECTED group has a genuine H(R) tail (unlike full-space
        # downfolds, which recover the finite-range hops exactly)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            itp = wannier.interpolator(zoo.bbh(), [0, 1], nk=8, localize=100)
        full = itp.model(min_hopping_norm=1e-10)
        pruned = itp.model(min_hopping_norm=5e-3)
        assert len(pruned._hoppings) < len(full._hoppings)
        kf = np.random.default_rng(2).random((10, 2))
        dev = np.abs(pruned.solve_all(kf) - full.solve_all(kf)).max()
        assert dev < 0.05  # pruning only trims the exponential tail


def test_spinful_mlwf_localize():
    """MV localization on a spinful Kramers group (nsta = 2*norb path):
    gauge invariance at grid points and finite spread reduction."""
    import warnings

    m = zoo.kane_mele(esite=1.0)
    kg = m.k_uniform_mesh((6, 6))
    direct = m.solve_all(kg)[:2]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        itp = wannier.interpolator(m, [0, 1], nk=6, localize=150)
    np.testing.assert_allclose(itp.bands(kg), direct, atol=1e-9)
    assert itp.spread_history[-1] <= itp.spread_history[0] + 1e-12
    # downfold runs for the spinful-derived (scalar nw-basis) model too
    eff = itp.model()
    kf = np.random.default_rng(3).random((10, 2))
    np.testing.assert_allclose(eff.solve_all(kf), itp.bands(kf), atol=1e-12)


def test_auto_trial_fallback_silicon_valence():
    """DEFAULT trials on silicon valence: the grid-averaged projector is
    ~I/2 (equal sublattice weight), so its eigenvector trials project
    near-singularly -- the automatic anchor fallback (exhaustive
    orbital-subset conditioning search) must recover a healthy
    projection with NO user-supplied trials and NO warning."""
    import pathlib
    import warnings

    from pythtb_tpu import w90

    d = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")
    si = w90(d, "silicon").model(min_hopping_norm=0.01)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        itp = wannier.interpolator(si, [0, 1, 2, 3], nk=8)
    assert itp.min_projection_sv > 0.3
    kp = si.k_path([[0.5, 0.5, 0.5], [0, 0, 0]], 11, report=False)[0]
    assert np.isfinite(itp.bands(kp)).all()


def test_fallback_does_not_mask_topological_obstruction():
    """A Z2 Kramers pair has NO smooth periodic gauge: even after the
    anchor fallback the projection stays far below the trivial case
    (the obstruction is physical, not a trial artifact)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, itp_triv = _err(zoo.kane_mele(esite=2.5), [0, 1], 12)
        _, itp_topo = _err(zoo.kane_mele(esite=1.0), [0, 1], 12)
    assert itp_topo.min_projection_sv < 0.5 * itp_triv.min_projection_sv


def test_spinful_disentangle_decoupled_union():
    """Spinful decoupled-union oracle: a spinful 1-orbital (2-state)
    block A plus an overlapping decoupled spinless-like spectator pair;
    SMV disentanglement of nw=2 recovers A's bands exactly."""
    from pythtb_tpu import tb_model

    lat = [[1.0, 0.0], [0.0, 1.0]]
    rng = np.random.default_rng(77)
    m = tb_model(2, 2, lat, [[0.0, 0.0], [0.31, 0.47]], nspin=2)
    mA = tb_model(2, 2, lat, [[0.0, 0.0]], nspin=2)
    on = [0.0, 0.3, -0.2, 0.4]  # I + Zeeman-ish
    m.set_onsite([on, [5 + 3.0, 0.0, 0.0, 0.0]])  # spectator far... overlap below
    mA.set_onsite([on])
    sig = np.array([0.5, 0.1, -0.2, 0.3])
    m.set_hop(sig, 0, 0, [1, 0])
    mA.set_hop(sig, 0, 0, [1, 0])
    sig2 = np.array([0.4, -0.15, 0.05, 0.2])
    m.set_hop(sig2, 0, 0, [0, 1])
    mA.set_hop(sig2, 0, 0, [0, 1])
    # spectator: wide overlapping band, decoupled (note onsite 8-3=5...)
    m.set_hop(np.array([1.5, 0.0, 0.0, 0.0]), 1, 1, [1, 0])
    m.set_hop(np.array([1.2, 0.0, 0.0, 0.0]), 1, 1, [0, 1])
    kf = rng.random((25, 2))
    trial = np.zeros((2, 4), complex)
    trial[0, 0] = 1.0
    trial[1, 1] = 1.0
    itp = wannier.disentangled_interpolator(
        m, nw=2, nk=8, window=(-30, 30), trial=trial, dis_steps=60,
        localize=80)
    err = np.abs(itp.bands(kf) - mA.solve_all(kf)).max()
    assert err < 1e-9, err
