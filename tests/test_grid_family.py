"""wf_array.solve_on_grid_models: lambda-family grid fills in one
program (upstream wish, /root/reference/notes/TODO:25-37).  Oracle =
the manual per-point fill used by the reference's pump examples."""

import numpy as np
import pytest

from pythtb_tpu import tb_model, wf_array
from pythtb_tpu.models import library as zoo


def _manual_pump(nl, nk):
    """Reference-style fill: loop every (lambda, k) point."""
    lams = np.linspace(0.0, 1.0, nl)
    wf = wf_array(zoo.three_site_chain(0.0), [nl, nk])
    for i, lam in enumerate(lams):
        m = zoo.three_site_chain(lam)
        for j in range(nk - 1):
            _, evec = m.solve_all([[j / (nk - 1.0)]], eig_vectors=True)
            wf[i, j] = evec[:, 0]
    wf.impose_pbc(1, 0)
    return wf, lams


class TestSolveOnGridModels:
    def test_pump_matches_manual_fill(self):
        nl, nk = 11, 9
        wf_m, lams = _manual_pump(nl, nk)
        wf = wf_array(zoo.three_site_chain(0.0), [nl, nk])
        gaps = wf.solve_on_grid_models(
            [zoo.three_site_chain(l) for l in lams], param_dir=0
        )
        # same physics: Berry phases along k agree (gauge may differ)
        ph_m = wf_m.berry_phase([0], dir=1, contin=True)
        ph = wf.berry_phase([0], dir=1, contin=True)
        np.testing.assert_allclose(ph, ph_m, atol=1e-10)
        assert gaps.shape == (2,) and np.all(gaps > 0)
        # energies stored for the whole family
        E = wf.energies
        assert E.shape == (nl, nk, 3) and not np.isnan(E).any()
        m5 = zoo.three_site_chain(lams[5])
        np.testing.assert_allclose(
            E[5, 2], m5.solve_all([[2 / (nk - 1.0)]])[:, 0], atol=1e-12
        )

    def test_pump_chern_via_loop(self):
        # close the lambda axis and integrate the Berry flux over the
        # (k, lambda) torus: the pump carries Chern number 1
        nl, nk = 31, 31
        lams = np.linspace(0.0, 1.0, nl)
        wf = wf_array(zoo.three_site_chain(0.0), [nl, nk])
        wf.solve_on_grid_models([zoo.three_site_chain(l) for l in lams], param_dir=0)
        wf.impose_loop(0)
        chern = wf.berry_flux([0], dirs=[0, 1]) / (2.0 * np.pi)
        assert abs(abs(chern) - 1.0) < 1e-4

    def test_param_dir_last(self):
        nl, nk = 5, 7
        lams = np.linspace(0.0, 1.0, nl)
        wf = wf_array(zoo.three_site_chain(0.0), [nk, nl])
        wf.solve_on_grid_models([zoo.three_site_chain(l) for l in lams], param_dir=1)
        assert wf.energies.shape == (nk, nl, 3)
        m2 = zoo.three_site_chain(lams[2])
        np.testing.assert_allclose(
            wf.energies[3, 2], m2.solve_all([[3 / (nk - 1.0)]])[:, 0], atol=1e-12
        )

    def test_heterogeneous_fallback(self):
        # models with different hop graphs (extra hop on some) take the
        # per-model path and still agree with direct solves
        def chain(lam, long_range):
            m = tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
            m.set_onsite([lam, -lam])
            m.set_hop(1.0, 0, 1, [0])
            m.set_hop(0.7, 1, 0, [1])
            if long_range:
                m.set_hop(0.1, 0, 0, [1])
            return m

        models = [chain(l, i % 2 == 0) for i, l in enumerate(np.linspace(0, 1, 4))]
        wf = wf_array(models[0], [4, 6])
        wf.solve_on_grid_models(models, param_dir=0)
        for i, m in enumerate(models):
            np.testing.assert_allclose(
                wf.energies[i, 1], m.solve_all([[1 / 5.0]])[:, 0], atol=1e-12
            )
        # stored states are actual eigenvectors
        H = np.asarray(models[1].gen_ham([[1 / 5.0]]))[0]
        v = wf._wfs[1, 1]
        r = H @ v.T - wf.energies[1, 1][None, :] * v.T
        assert np.abs(r).max() < 1e-10

    def test_validation(self):
        wf = wf_array(zoo.three_site_chain(0.0), [3, 5])
        with pytest.raises(Exception):
            wf.solve_on_grid_models([zoo.three_site_chain(0.0)] * 4, param_dir=0)
        with pytest.raises(Exception):
            wf.solve_on_grid_models([zoo.haldane()] * 3, param_dir=0)  # wrong dim_k


def test_varying_orbital_positions_fall_back_correctly():
    """Regression: family members with the same hop graph but DIFFERENT
    orbital positions must not share models[0]'s periodic-gauge
    boundary phases (they take the per-model path and match per-model
    solve_on_grid exactly)."""
    def chain_at(x1):
        m = tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [x1]])
        m.set_onsite([0.4, -0.4])
        m.set_hop(1.0, 0, 1, [0])
        m.set_hop(0.6, 1, 0, [1])
        return m

    xs = [0.3, 0.5, 0.7]
    models = [chain_at(x) for x in xs]
    wf = wf_array(models[0], [3, 9])
    wf.solve_on_grid_models(models, param_dir=0)
    for i, m in enumerate(models):
        ref = wf_array(m, [9])
        ref.solve_on_grid([0.0])
        ph_ref = ref.berry_phase([0], dir=0)
        ph = wf.berry_phase([0], dir=1, contin=False)[i]
        np.testing.assert_allclose(ph, ph_ref, atol=1e-10)
