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
