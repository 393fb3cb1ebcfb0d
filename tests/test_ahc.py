"""Anomalous Hall conductivity sigma_xy(E_F) (no reference counterpart;
oracles: TKNN quantization against the package's own golden-tested
Chern numbers, time-reversal symmetry, and Fermi-sea limits)."""

import numpy as np
import pytest

from pythtb_tpu import flows
from pythtb_tpu.models import library as zoo


def test_haldane_plateaus_and_limits():
    m = zoo.haldane()
    ev = m.solve_all(m.k_uniform_mesh([25, 25]))
    gap_lo, gap_hi = ev[0].max(), ev[1].min()
    efs = np.array([
        ev[0].min() - 1.0,                     # below all bands
        0.5 * (gap_lo + gap_hi),               # in the topological gap
        0.45 * gap_lo + 0.55 * gap_hi,         # elsewhere in the gap
        ev[1].max() + 1.0,                     # above all bands
    ])
    sig = flows.anomalous_hall(m, efs, nk=(61, 61))
    c = flows.chern_number(m, [0], nk=(61, 61))
    assert abs(sig[0]) < 1e-10                       # empty: 0
    np.testing.assert_allclose(sig[1], c, atol=1e-8)  # gap: Chern
    np.testing.assert_allclose(sig[2], sig[1], atol=1e-8)  # flat plateau
    assert abs(sig[3]) < 1e-6                        # filled: total Chern 0


def test_metallic_fermi_level_not_quantized():
    m = zoo.haldane()
    ev = m.solve_all(m.k_uniform_mesh([25, 25]))
    ef_mid_band = 0.5 * (ev[0].min() + ev[0].max())  # inside band 0
    s = flows.anomalous_hall(m, ef_mid_band, nk=(61, 61))
    assert isinstance(s, float)
    assert 0.02 < abs(s) < 0.98  # partial Berry flux, not quantized


def test_time_reversal_symmetric_vanishes():
    km = zoo.kane_mele(esite=1.0)
    efs = np.linspace(-2.5, 2.5, 7)
    sig = flows.anomalous_hall(km, efs, nk=(41, 41))
    np.testing.assert_allclose(sig, 0.0, atol=1e-8)


def test_magnetic_subbands_staircase():
    # Hofstadter at flux 1/3: sigma_xy plateaus follow TKNN (1, -2)
    from pythtb_tpu import magnetic
    from pythtb_tpu.models import square

    msc = magnetic.magnetic_supercell(square(), 1, 3)
    ev = msc.solve_all(msc.k_uniform_mesh([31, 31]))
    ef1 = 0.5 * (ev[0].max() + ev[1].min())  # first gap
    ef2 = 0.5 * (ev[1].max() + ev[2].min())  # second gap
    sig = flows.anomalous_hall(msc, np.array([ef1, ef2]), nk=(41, 41))
    np.testing.assert_allclose(sig, [1.0, -1.0], atol=1e-6)


class TestQuadrupole:
    def test_bbh_quadrupole_phase(self):
        q = flows.quadrupole(zoo.bbh(0.5, 1.0), nk=(21, 21))
        np.testing.assert_allclose(q["px"], 0.5, atol=1e-8)
        np.testing.assert_allclose(q["py"], 0.5, atol=1e-8)
        assert abs(q["qxy"] - 0.5) < 1e-8
        assert q["wannier_gap"] > 0.5
        assert q["px_spread"] < 1e-10 and q["py_spread"] < 1e-10

    def test_bbh_trivial_phase(self):
        q = flows.quadrupole(zoo.bbh(1.5, 1.0), nk=(21, 21))
        # polarizations are defined mod 1: distance to 0 on the circle
        for p in np.concatenate([q["px"], q["py"]]):
            assert min(p, 1.0 - p) < 1e-8
        assert q["qxy"] < 1e-8 or q["qxy"] > 1 - 1e-8

    def test_grid_convergence(self):
        a = flows.quadrupole(zoo.bbh(0.7, 1.0), nk=(15, 15))
        b = flows.quadrupole(zoo.bbh(0.7, 1.0), nk=(31, 31))
        np.testing.assert_allclose(a["px"], b["px"], atol=1e-6)
        np.testing.assert_allclose(a["qxy"], b["qxy"], atol=1e-6)


def test_on_grid_degeneracy_warns():
    """Regression: E_F through a band degeneracy sitting ON a grid point
    (graphene Dirac point at K with a K-inclusive grid) is flagged --
    the per-band curvature is basis-arbitrary there."""
    import warnings

    g = zoo.graphene()
    with pytest.warns(UserWarning, match="band degeneracy"):
        flows.anomalous_hall(g, [0.0], nk=(31, 31), start_k=(0.0, 0.0))
    # off-grid Dirac points (61 interior steps: j/61 never hits 5/6):
    # clean zero, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = flows.anomalous_hall(g, 0.0, nk=(62, 62), start_k=(-0.5, -0.5))
    assert abs(s) < 1e-8


def test_scalar_contracts_and_wrong_dim_message():
    m = zoo.haldane()
    s = flows.anomalous_hall(m, np.array(0.0), nk=(31, 31))
    assert isinstance(s, float)
    with pytest.raises(ValueError, match="anomalous_hall"):
        flows.anomalous_hall(zoo.chain(), 0.0)
    with pytest.raises(ValueError, match="quadrupole"):
        flows.quadrupole(zoo.fu_kane_mele())


class TestSpinChern:
    def test_kane_mele_phases(self):
        # Prodan spin Chern: +-1 in the QSH phase -- including WITH
        # Rashba (Sz not conserved, but P Sz P stays gapped) -- and 0
        # in the trivial phase; |Cs| mod 2 equals Z2
        for esite, rashba, expect in ((1.0, 0.0, 1.0), (1.0, 0.25, 1.0),
                                      (2.5, 0.25, 0.0)):
            r = flows.spin_chern(zoo.kane_mele(esite=esite, rashba=rashba),
                                 (0, 1), nk=(31, 31))
            assert abs(abs(r["spin_chern"]) - expect) < 1e-6, (esite, rashba)
            assert r["sz_gap"] > 1.0
            # sector Cherns sum to the (zero) total Chern
            assert abs(r["chern_plus"] + r["chern_minus"]) < 1e-8
            z2 = flows.z2_invariant(zoo.kane_mele(esite=esite, rashba=rashba),
                                    (0, 1), nk=(25, 25))
            assert abs(abs(r["spin_chern"]) % 2 - z2) < 1e-6

    def test_validation(self):
        with pytest.raises(ValueError, match="spinful"):
            flows.spin_chern(zoo.haldane(), (0,) * 2)
        with pytest.raises(ValueError, match="even"):
            flows.spin_chern(zoo.kane_mele(), (0,))
        with pytest.raises(ValueError, match="spin_chern requires"):
            flows.spin_chern(zoo.fu_kane_mele(), (0, 1))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_haldane_family(seed):
    """Random Haldane-family parameters: sigma_xy at mid-gap equals the
    filled-band Chern number (whatever it is), empty/full limits vanish,
    and the value is insensitive to the grid origin."""
    rng = np.random.RandomState(300 + seed)
    m = zoo.haldane(
        delta=rng.uniform(0.0, 1.2),
        t=-1.0,
        t2=rng.uniform(0.05, 0.35) * np.exp(1j * rng.uniform(0.2, np.pi - 0.2)),
    )
    ev = m.solve_all(m.k_uniform_mesh([21, 21]))
    gap = ev[1].min() - ev[0].max()
    if gap < 0.15:
        pytest.skip("near-critical draw: mid-gap ill-defined")
    mid = 0.5 * (ev[0].max() + ev[1].min())
    c = flows.chern_number(m, [0], nk=(41, 41))
    s1 = flows.anomalous_hall(m, mid, nk=(41, 41))
    s2 = flows.anomalous_hall(m, mid, nk=(41, 41), start_k=(0.11, -0.23))
    np.testing.assert_allclose(s1, c, atol=1e-7)
    np.testing.assert_allclose(s2, c, atol=1e-7)
    lims = flows.anomalous_hall(m, np.array([ev.min() - 1, ev.max() + 1]), nk=(41, 41))
    np.testing.assert_allclose(lims, 0.0, atol=1e-7)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_spin_chern_random_kane_mele(seed):
    """Random Kane-Mele parameters: spin Chern is an integer, matches
    Z2 mod 2, and the sector Cherns cancel (TR symmetry)."""
    rng = np.random.RandomState(400 + seed)
    m = zoo.kane_mele(
        esite=rng.uniform(0.3, 3.0),
        spin_orb=rng.uniform(0.15, 0.4),
        rashba=rng.uniform(0.0, 0.3),
    )
    r = flows.spin_chern(m, (0, 1), nk=(31, 31))
    if r["sz_gap"] < 0.3:
        pytest.skip("P.Sz.P nearly gapless for this draw")
    cs = r["spin_chern"]
    assert abs(cs - round(cs)) < 1e-6
    assert abs(r["chern_plus"] + r["chern_minus"]) < 1e-7
    z2 = flows.z2_invariant(m, (0, 1), nk=(25, 25), check=True)
    assert abs(abs(round(cs)) % 2 - z2) < 1e-6


def test_spin_chern_imbalanced_occupation_warns():
    """Regression: an occupied space with no spin-down content has a
    P.Sz.P spectrum entirely above zero; the equal-count sector split is
    then not a sign split and must be flagged."""
    from pythtb_tpu import tb_model

    m = tb_model(2, 2, lat=[[1.0, 0.0], [0.0, 1.0]], orb=[[0.0, 0.0], [0.5, 0.5]],
                 nspin=2)
    # strong Zeeman pushes both lowest bands to net spin-up; DIFFERENT
    # transverse fields make their P.Sz.P eigenvalues distinct (gapped)
    # yet both positive
    m.set_onsite([[-4.0, 0.2, 0.0, -2.0], [-3.5, 1.5, 0.0, -2.0]])
    m.set_hop(0.4, 0, 1, [0, 0])
    m.set_hop(0.4, 1, 0, [1, 0])
    m.set_hop(0.4, 1, 0, [0, 1])
    with pytest.warns(UserWarning, match="does not straddle zero"):
        flows.spin_chern(m, (0, 1), nk=(15, 15))


def test_finite_temperature_occupations():
    m = zoo.haldane()
    ev = m.solve_all(m.k_uniform_mesh([25, 25]))
    mid = 0.5 * (ev[0].max() + ev[1].min())
    s0 = flows.anomalous_hall(m, mid, nk=(41, 41))
    # tiny T: same plateau
    st = flows.anomalous_hall(m, mid, nk=(41, 41), temperature=1e-4)
    np.testing.assert_allclose(st, s0, atol=1e-6)
    # large T: thermal smearing pulls the plateau toward zero
    sT = flows.anomalous_hall(m, mid, nk=(41, 41), temperature=1.0)
    assert abs(sT) < 0.9 * abs(s0)
    # at the band-edge the T=0 staircase step is smoothed
    edge = ev[1].min()
    a = flows.anomalous_hall(m, np.array([edge - 0.05, edge + 0.05]), nk=(41, 41),
                             temperature=0.2)
    assert abs(a[1] - a[0]) < 0.3


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_anisotropic_bbh_phase_diagram(seed):
    """Anisotropic BBH (independent gamma_x, gamma_y): the quadrupole
    phase requires BOTH intracell couplings weak; q_xy = 1/2 iff
    gamma_x < lam and gamma_y < lam, else 0 (reflection symmetries
    keep it quantized)."""
    from pythtb_tpu import tb_model

    rng = np.random.RandomState(700 + seed)
    gx, gy = rng.uniform(0.2, 1.8, 2)
    if min(abs(gx - 1.0), abs(gy - 1.0)) < 0.15:
        pytest.skip("near-critical draw")
    m = tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]] * 4)
    m.set_hop(gx, 0, 1, [0, 0])
    m.set_hop(-gy, 0, 2, [0, 0])
    m.set_hop(gy, 1, 3, [0, 0])
    m.set_hop(gx, 2, 3, [0, 0])
    m.set_hop(1.0, 1, 0, [1, 0])
    m.set_hop(1.0, 3, 2, [1, 0])
    m.set_hop(-1.0, 2, 0, [0, 1])
    m.set_hop(1.0, 3, 1, [0, 1])
    q = flows.quadrupole(m, nk=(21, 21))
    expect = 0.5 if (gx < 1.0 and gy < 1.0) else 0.0
    d = min(q["qxy"], 1.0 - q["qxy"]) if expect == 0.0 else abs(q["qxy"] - 0.5)
    assert d < 1e-6, (gx, gy, q["qxy"])


class TestOrbitalMagnetization:
    def test_flake_dE_dB_oracle(self):
        """Thermodynamic definition: bulk M equals -dE_total/dphi per
        cell of a large Peierls flake (fixed filling; edge corrections
        vanish as 1/L -- the modern-theory statement)."""
        from pythtb_tpu import magnetic

        m = zoo.haldane(delta=0.2, t2=0.15 * np.exp(0.7j))
        e = m.solve_all(m.k_uniform_mesh((41, 41)))
        mu = 0.5 * (e[0].max() + e[1].min())
        M = flows.orbital_magnetization(m, [0], nk=(121, 121), mu=mu)
        L = 16
        flake = m.cut_piece(L, 0, glue_edgs=False).cut_piece(L, 1, glue_edgs=False)
        ev0 = np.sort(np.asarray(flake.solve_all()).ravel())
        nocc = int((ev0 < mu).sum())

        def etot(phi):
            fl = magnetic.peierls_model(flake, phi, dirs=(0, 1))
            ev = np.sort(np.asarray(fl.solve_all()).ravel())
            return ev[:nocc].sum()

        d = 1e-4
        slope = -(etot(d) - etot(-d)) / (2 * d) / (L * L) / (2 * np.pi)
        assert abs(slope / M - 1.0) < 0.02, (M, slope)

    def test_dM_dmu_is_chern_over_2pi(self):
        """Inside a gap, dM/dmu = C / (2 pi) exactly (the mu-dependence
        of the band sum IS the Berry-curvature integral)."""
        m = zoo.haldane()  # C = -1 for band 0 with these signs
        e = m.solve_all(m.k_uniform_mesh((31, 31)))
        mu0 = 0.5 * (e[0].max() + e[1].min())
        d = 0.05
        M1 = flows.orbital_magnetization(m, [0], nk=(101, 101), mu=mu0 - d)
        M2 = flows.orbital_magnetization(m, [0], nk=(101, 101), mu=mu0 + d)
        C = flows.chern_number(m, [0], nk=(101, 101))
        np.testing.assert_allclose((M2 - M1) / (2 * d), C / (2 * np.pi),
                                   atol=1e-6)

    def test_time_reversal_vanishes(self):
        """TR-symmetric insulator: M = 0 identically."""
        M = flows.orbital_magnetization(zoo.bn(), [0], nk=(61, 61))
        assert abs(M) < 1e-12

    def test_out_of_gap_warns(self):
        m = zoo.haldane()
        with pytest.warns(UserWarning, match="not inside the band gap"):
            flows.orbital_magnetization(m, [0], nk=(31, 31), mu=10.0)

    @pytest.mark.parametrize("seed", range(3))
    def test_fuzz_flake_oracle_random_models(self, seed):
        """Random gapped TR-broken 2-band models: bulk M vs the flake
        slope (L=14, 3% -- finite-size edge term)."""
        from pythtb_tpu import magnetic, tb_model

        rng = np.random.default_rng(50 + seed)
        while True:
            lat = [[1.0, 0.0], [0.0, 1.0]]
            m = tb_model(2, 2, lat, [[0.0, 0.0], [0.5, 0.5]])
            m.set_onsite([float(rng.normal()) - 1.5, float(rng.normal()) + 1.5])
            for (i, j, R) in [(0, 1, [0, 0]), (0, 1, [1, 0]), (0, 1, [0, 1]),
                              (0, 0, [1, 0]), (1, 1, [0, 1]), (0, 1, [1, 1])]:
                m.set_hop(0.4 * (rng.normal() + 1j * rng.normal()), i, j, R)
            e = m.solve_all(m.k_uniform_mesh((31, 31)))
            gap = e[1].min() - e[0].max()
            if gap > 0.4:
                break
        mu = 0.5 * (e[0].max() + e[1].min())
        M = flows.orbital_magnetization(m, [0], nk=(101, 101), mu=mu)

        def slope_per_cell(L):
            flake = m.cut_piece(L, 0, glue_edgs=False).cut_piece(
                L, 1, glue_edgs=False
            )
            ev0 = np.sort(np.asarray(flake.solve_all()).ravel())
            nocc = int((ev0 < mu).sum())

            def etot(phi):
                fl = magnetic.peierls_model(flake, phi, dirs=(0, 1))
                ev = np.sort(np.asarray(fl.solve_all()).ravel())
                return ev[:nocc].sum()

            d = 1e-4
            return -(etot(d) - etot(-d)) / (2 * d) / (L * L) / (2 * np.pi)

        # Richardson: the edge term is ~1/L, so 2*s(2L) - s(L) kills it
        s10, s20 = slope_per_cell(10), slope_per_cell(20)
        ext = 2 * s20 - s10
        denom = max(abs(M), 0.02)
        assert abs(ext - M) / denom < 0.05, (M, s10, s20, ext)


class TestAxionSecondChern:
    def test_fkm_beta_loop_second_chern_quantized(self):
        """The FKM TR-breaking beta cycle pumps theta by 2 pi C2 with
        C2 = -1: the gauge-invariant 4D projector-curvature integral
        must land on the integer (Richardson-refined)."""
        L = 16
        loop = [zoo.fu_kane_mele(beta=2 * np.pi * i / L) for i in range(L)]
        c2 = flows.second_chern(loop, (0, 1), nk=(16, 16, 16))
        assert abs(c2 - (-1.0)) < 0.02, c2

    def test_loop_orientation_flips_sign(self):
        L = 12
        loop = [zoo.fu_kane_mele(beta=2 * np.pi * i / L) for i in range(L)]
        c2f = flows.second_chern(loop, (0, 1), nk=(12, 12, 12), refine=False)
        c2r = flows.second_chern(loop[::-1], (0, 1), nk=(12, 12, 12),
                                 refine=False)
        np.testing.assert_allclose(c2f, -c2r, atol=1e-10)

    def test_fkm_strong_theta_is_pi(self):
        """theta = pi on the Fu-Kane-Mele strong TI, via gapped pumping
        to the TR-restored trivial endpoint at beta = pi (never fixes a
        gauge -- the failure mode of direct Chern-Simons integration)."""
        L = 17
        path = [zoo.fu_kane_mele(beta=np.pi * i / (L - 1)) for i in range(L)]
        th = flows.axion_theta(path, (0, 1), nk=(16, 16, 16))
        assert abs(abs(th) - np.pi) < 0.05, th

    def test_trivial_path_theta_is_zero(self):
        """TR-symmetric gapped path from the trivial FKM to a deeper
        atomic limit: every slice is TR-even, the pump density is odd
        under k -> -k, theta = 0."""
        path = [zoo.fu_kane_mele(m=mm, beta=0.0)
                for mm in np.linspace(0.5, 3.0, 9)]
        th = flows.axion_theta(path, (0, 1), nk=(10, 10, 10), refine=False)
        assert abs(th) < 0.02, th

    @pytest.mark.parametrize("seed", range(2))
    def test_fuzz_strong_phase_pump_quantized(self, seed):
        """Random parameters inside the strong phase: the beta-cycle
        second Chern number stays on the SAME integer -1 (adiabatic
        invariance of the pump)."""
        rng = np.random.default_rng(200 + seed)
        soc = 0.1 + 0.1 * rng.random()
        mm = -(0.3 + 0.4 * rng.random())
        L = 14
        loop = [zoo.fu_kane_mele(soc=soc, m=mm, beta=2 * np.pi * i / L)
                for i in range(L)]
        # gapped-loop precondition (the invariant is only defined then)
        for b in (0.0, np.pi / 2, np.pi):
            e = zoo.fu_kane_mele(soc=soc, m=mm, beta=b).solve_all(
                np.random.default_rng(0).random((60, 3)))
            assert (e[2] - e[1]).min() > 0.05
        c2 = flows.second_chern(loop, (0, 1), nk=(14, 14, 14))
        assert abs(c2 - (-1.0)) < 0.1, (soc, mm, c2)

    def test_validation(self):
        m2d = zoo.haldane()
        with pytest.raises(ValueError, match="dim_k"):
            flows.second_chern([m2d] * 6, (0,), nk=(6, 6, 6))
        with pytest.raises(ValueError, match="slices"):
            flows.second_chern([zoo.fu_kane_mele()] * 3, (0, 1))
