"""Oracles for the real-space topology/transport module (realspace.py).

Tier structure (SURVEY section 4 style):

* differential -- the torus tiling is checked against a completely
  independent construction (cut_piece(glue_edgs=True) in model.py) and
  against Bloch theory (torus spectrum == union of H(k) on the
  commensurate k-grid; velocity trace identities vs assemble_dk).
* physics oracles -- Bott index == k-space Chern number; local Chern
  marker plateaus at C in the bulk and obeys the exact trace identity
  sum c = 0; KPM Kubo-Bastin sigma_xy is quantized at C e^2/h in the
  gap (sign pinned against the independently validated
  flows.anomalous_hall) and sigma_xx vanishes in the gap.
* fuzz -- random 2-D models: torus == Bloch union; disorder keeps the
  Bott index quantized below the transition.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pythtb_tpu import flows, realspace, tb_model
from pythtb_tpu.models import library as zoo
from pythtb_tpu.ops.matvec import to_dense

from .zoo import kane_mele
import pythtb_tpu


def _bloch_union(model, L):
    """Eigenvalues of the torus via Bloch theory: union of H(k) on the
    commensurate k-grid (independent of the realspace tiling code)."""
    dim = model._dim_k
    grids = [np.arange(n) / float(n) for n in L]
    kpts = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, dim)
    evals = model.solve_all(kpts)  # (nsta, nk)
    return np.sort(evals.ravel())


class TestTorusSample:
    def test_spectrum_matches_bloch_union(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (6, 5))
        w = np.linalg.eigvalsh(to_dense(s.h))
        np.testing.assert_allclose(w, _bloch_union(m, (6, 5)), atol=1e-10)

    def test_spectrum_matches_glued_cut_piece(self):
        # independent construction through model.py surgery
        m = zoo.haldane()
        glued = m.cut_piece(4, 0, glue_edgs=True).cut_piece(5, 1, glue_edgs=True)
        w_ref = np.sort(glued.solve_all())
        s = realspace.torus_sample(m, (4, 5))
        w = np.linalg.eigvalsh(to_dense(s.h))
        np.testing.assert_allclose(w, w_ref, atol=1e-10)

    def test_tiny_supercell_multiwrap(self):
        # L smaller than twice the hop range: hops wrap onto the same
        # cell repeatedly; Bloch union is still exact
        m = zoo.haldane()
        s = realspace.torus_sample(m, (2, 2))
        w = np.linalg.eigvalsh(to_dense(s.h))
        np.testing.assert_allclose(w, _bloch_union(m, (2, 2)), atol=1e-10)

    def test_spinful_spectrum(self):
        m = kane_mele(pythtb_tpu, topological="odd")
        s = realspace.torus_sample(m, (3, 4))
        assert s.nspin == 2 and s.nsta == 2 * 2 * 12
        w = np.linalg.eigvalsh(to_dense(s.h))
        np.testing.assert_allclose(w, _bloch_union(m, (3, 4)), atol=1e-10)

    def test_velocity_trace_identity(self):
        # Tr[v_a v_b] on the torus == sum_k tr[V_a(k) V_b(k)] with
        # V(k) the Cartesian assemble_dk velocities -- checks the
        # per-hop displacement (incl. boundary wrap) independently
        from pythtb_tpu.ops.hamiltonian import assemble_dk

        m = zoo.haldane()
        L = (4, 3)
        s = realspace.torus_sample(m, L)
        vx, vy = (to_dense(v) for v in s.velocity)
        assert np.allclose(vx, vx.conj().T) and np.allclose(vy, vy.conj().T)
        static, data = m._get_finalized()
        grids = [np.arange(n) / float(n) for n in L]
        kpts = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, 2)
        dH = np.asarray(assemble_dk(static, data, jnp.asarray(kpts)))
        # reduced -> Cartesian: dH/dk_cart_a = (1/2pi) sum_r lat[r,a] dH/dk_red_r
        lat = np.asarray(m._lat)
        Vc = np.einsum("ra,brij->baij", lat, dH) / (2 * np.pi)
        for a, va in enumerate((vx, vy)):
            for b, vb in enumerate((vx, vy)):
                lhs = np.trace(va @ vb)
                rhs = np.einsum("bij,bji->", Vc[:, a], Vc[:, b])
                np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_disorder_array_and_seed(self):
        m = zoo.haldane()
        s1 = realspace.torus_sample(m, (3, 3), onsite_disorder=2.0, seed=7)
        s2 = realspace.torus_sample(m, (3, 3), onsite_disorder=2.0, seed=7)
        np.testing.assert_array_equal(
            np.asarray(s1.h.vals), np.asarray(s2.h.vals)
        )
        w0 = np.linalg.eigvalsh(to_dense(realspace.torus_sample(m, (3, 3)).h))
        delta = np.full(18, 0.25)
        sshift = realspace.torus_sample(m, (3, 3), onsite_disorder=delta)
        w1 = np.linalg.eigvalsh(to_dense(sshift.h))
        np.testing.assert_allclose(w1, w0 + 0.25, atol=1e-10)

    def test_errors(self):
        from pythtb_tpu import PythtbError

        chain = tb_model(1, 1, [[1.0]], [[0.0]])
        chain.set_hop(1.0, 0, 0, [1])
        with pytest.raises(PythtbError):
            realspace.torus_sample(chain.cut_piece(3, 0), (3,))
        with pytest.raises(PythtbError):
            realspace.torus_sample(zoo.haldane(), (4,))
        with pytest.raises(PythtbError):
            realspace.torus_sample(zoo.haldane(), (4, 4), onsite_disorder=np.ones(5))


class TestBottIndex:
    def test_matches_kspace_chern(self):
        m = zoo.haldane()
        C = flows.chern_number(m, occ=[0], nk=(31, 31))
        s = realspace.torus_sample(m, (8, 8))
        b = realspace.bott_index(s, nocc=64)
        assert abs(b - C) < 1e-8

    def test_trivial_phase(self):
        m = zoo.haldane(delta=1.2, t2=0.03j)
        s = realspace.torus_sample(m, (8, 8))
        assert abs(realspace.bott_index(s, nocc=64)) < 1e-8

    def test_fermi_counting(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (6, 6))
        b1 = realspace.bott_index(s, fermi=0.0)
        b2 = realspace.bott_index(s, nocc=36)
        assert b1 == pytest.approx(b2)

    def test_disorder_robust_then_trivial(self):
        m = zoo.haldane()
        sd = realspace.torus_sample(m, (8, 8), onsite_disorder=1.0, seed=11)
        assert abs(realspace.bott_index(sd, nocc=64) + 1.0) < 1e-6
        # far beyond the transition everything localizes
        sw = realspace.torus_sample(m, (8, 8), onsite_disorder=25.0, seed=11)
        assert abs(realspace.bott_index(sw, nocc=64)) < 1e-6

    def test_spinful_qsh_total_is_zero(self):
        m = kane_mele(pythtb_tpu, topological="odd")
        s = realspace.torus_sample(m, (5, 5))
        # QSH: opposite Chern per spin sector, total Bott = 0
        assert abs(realspace.bott_index(s, nocc=2 * 25)) < 1e-8


class TestChernMarker:
    def test_sum_rule_exact(self):
        flake = zoo.haldane().cut_piece(8, 0).cut_piece(8, 1)
        c = realspace.chern_marker(flake, nocc=64)
        assert abs(c.sum()) < 1e-9

    def test_bulk_plateau_topological(self):
        m = zoo.haldane()
        C = flows.chern_number(m, occ=[0], nk=(31, 31))
        flake = m.cut_piece(10, 0).cut_piece(10, 1)
        c = realspace.chern_marker(flake, nocc=100)
        pos = np.asarray(flake._orb) @ np.asarray(flake._lat)
        center = pos.mean(axis=0)
        r = np.linalg.norm(pos - center, axis=1)
        bulk = c[r < 0.3 * r.max()]
        # cell marker = sum over the 2 basis orbitals
        assert abs(2.0 * bulk.mean() - C) < 0.05

    def test_bulk_plateau_trivial(self):
        flake = zoo.haldane(delta=1.2, t2=0.03j).cut_piece(8, 0).cut_piece(8, 1)
        c = realspace.chern_marker(flake, nocc=64)
        pos = np.asarray(flake._orb) @ np.asarray(flake._lat)
        r = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        assert abs(2.0 * c[r < 0.3 * r.max()].mean()) < 0.05

    def test_fermi_equals_nocc(self):
        flake = zoo.haldane().cut_piece(6, 0).cut_piece(6, 1)
        np.testing.assert_allclose(
            realspace.chern_marker(flake, fermi=0.0),
            realspace.chern_marker(flake, nocc=36),
            atol=1e-12,
        )

    def test_spinful_sum_rule(self):
        flake = kane_mele(pythtb_tpu, "odd").cut_piece(5, 0).cut_piece(5, 1)
        c = realspace.chern_marker(flake, nocc=50)
        assert c.shape == (50,)
        assert abs(c.sum()) < 1e-9


class TestKPMConductivity:
    def test_hall_quantized_and_sign(self):
        m = zoo.haldane()
        C = flows.chern_number(m, occ=[0], nk=(31, 31))
        s = realspace.torus_sample(m, (16, 16))
        _, sxy = realspace.kpm_conductivity(
            s, dirs=(0, 1), fermi_levels=np.array([0.0]),
            num_moments=256, num_vectors=8,
        )
        # sign convention pinned against flows.anomalous_hall (== C)
        assert abs(sxy[0] - C) < 0.03

    def test_hall_antisymmetry(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (12, 12))
        kw = dict(fermi_levels=np.array([0.0]), num_moments=192, num_vectors=4)
        _, sxy = realspace.kpm_conductivity(s, dirs=(0, 1), **kw)
        _, syx = realspace.kpm_conductivity(s, dirs=(1, 0), **kw)
        np.testing.assert_allclose(sxy, -syx, atol=1e-10)

    def test_sigma_xx_gap_and_bands(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (16, 16))
        ef, sxx = realspace.kpm_conductivity(
            s, dirs=(0, 0), fermi_levels=np.array([0.0, 2.5]),
            num_moments=256, num_vectors=8,
        )
        assert abs(sxx[0]) < 5e-3  # insulating in the gap
        assert sxx[1] > 0.5  # metallic in the band

    def test_disordered_plateau(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (16, 16), onsite_disorder=1.0, seed=3)
        _, sxy = realspace.kpm_conductivity(
            s, dirs=(0, 1), fermi_levels=np.array([0.0]),
            num_moments=256, num_vectors=8,
        )
        assert abs(sxy[0] + 1.0) < 0.05

    def test_finite_temperature_limit(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (12, 12))
        kw = dict(dirs=(0, 1), fermi_levels=np.array([0.0]),
                  num_moments=192, num_vectors=4)
        _, s0 = realspace.kpm_conductivity(s, **kw)
        _, st = realspace.kpm_conductivity(s, temperature=1e-4, **kw)
        np.testing.assert_allclose(st, s0, atol=2e-3)

    def test_default_fermi_grid_staircase(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (12, 12))
        ef, sxy = realspace.kpm_conductivity(
            s, dirs=(0, 1), num_moments=192, num_vectors=4
        )
        assert ef.shape == sxy.shape == (201,)
        # below and above the whole spectrum the Fermi sea carries no
        # Hall response
        assert abs(sxy[0]) < 5e-3 and abs(sxy[-1]) < 5e-2


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_torus_vs_bloch(seed):
    """Random fully periodic 2-D models: torus spectrum == Bloch union."""
    rng = np.random.default_rng(100 + seed)
    norb = int(rng.integers(1, 4))
    lat = np.eye(2) + 0.2 * rng.standard_normal((2, 2))
    orb = rng.uniform(0, 1, (norb, 2))
    m = tb_model(2, 2, lat, orb)
    m.set_onsite(list(rng.standard_normal(norb)))
    nhop = int(rng.integers(1, 5))
    for _ in range(nhop):
        i, j = rng.integers(0, norb, 2)
        R = rng.integers(-2, 3, 2)
        if i == j and R[0] == 0 and R[1] == 0:
            continue
        amp = rng.standard_normal() + 1j * rng.standard_normal()
        try:
            m.set_hop(amp, int(i), int(j), list(int(x) for x in R))
        except Exception:
            continue
    L = tuple(int(x) for x in rng.integers(2, 5, 2))
    s = realspace.torus_sample(m, L)
    w = np.linalg.eigvalsh(to_dense(s.h))
    np.testing.assert_allclose(w, _bloch_union(m, L), atol=1e-9)


class TestKpmLdos:
    def test_moments_match_dense_spectral_decomposition(self):
        """Exact algebraic oracle: the Chebyshev recursion's per-site
        moments equal sum_n |psi_n(i)|^2 T_m(E~_n) from a dense eigh --
        no kernel, no broadening, just two routes to the same number."""
        m = zoo.haldane()
        s = realspace.torus_sample(m, (4, 4))
        H = to_dense(s.h)
        w, v = np.linalg.eigh(H)
        from pythtb_tpu.ops.matvec import gershgorin_window
        from pythtb_tpu.realspace import _ldos_moments_jit
        from pythtb_tpu import config

        lo, hi = gershgorin_window(s.h)
        a = 0.5 * (hi - lo) / 0.98 + 1e-12
        b = 0.5 * (hi + lo)
        sites = np.array([0, 3, 17])
        M = 64
        mu = np.asarray(_ldos_moments_jit(
            s.h, jnp.asarray([a, b], config.float_dtype()),
            jnp.asarray(sites), M))
        et = (w - b) / a
        tm = np.cos(np.arange(M)[:, None] * np.arccos(et)[None, :])
        ref = tm @ (np.abs(v[sites]) ** 2).T  # (M, nsites)
        np.testing.assert_allclose(mu, ref, atol=1e-10)

    def test_ldos_sums_to_total_dos_and_parseval(self):
        m = zoo.haldane()
        s = realspace.torus_sample(m, (5, 5))
        e, ld = realspace.kpm_ldos(s, np.arange(s.norb), num_moments=128,
                                   n_energies=801)
        de = e[1] - e[0]
        # each site integrates to ~1 state (Jackson kernel leaks a
        # little weight past the window edges)
        np.testing.assert_allclose(np.sum(ld, axis=1) * de,
                                   np.ones(s.norb), atol=0.02)
        # translationally invariant torus: every A site identical
        np.testing.assert_allclose(ld[0], ld[2], atol=1e-9)

    def test_ssh_edge_state_localization(self):
        """Open SSH chain in the topological phase: midgap LDOS lives
        on the edge, not the bulk."""
        sshm = zoo.ssh(delta=-0.4)  # topological for delta < 0
        chain = sshm.cut_piece(30, 0, glue_edgs=False)
        e, ld = realspace.kpm_ldos(chain, [0, 29], num_moments=512,
                                   n_energies=601)
        mid = np.argmin(np.abs(e))
        assert ld[0, mid] > 20.0 * ld[1, mid]
        # trivial phase: no midgap weight anywhere
        triv = zoo.ssh(delta=0.4).cut_piece(30, 0, glue_edgs=False)
        e2, ld2 = realspace.kpm_ldos(triv, [0, 29], num_moments=512,
                                     n_energies=601)
        mid2 = np.argmin(np.abs(e2))
        assert ld2[:, mid2].max() < 0.05

    def test_spinful_sum_and_errors(self):
        km = kane_mele(pythtb_tpu, topological="odd")
        s = realspace.torus_sample(km, (3, 3))
        e, ld = realspace.kpm_ldos(s, [0, 1], num_moments=96,
                                   n_energies=501)
        de = e[1] - e[0]
        # spin summed: ~2 states per site
        np.testing.assert_allclose(np.sum(ld, axis=1) * de,
                                   np.full(2, 2.0), atol=0.05)
        with pytest.raises(Exception):
            realspace.kpm_ldos(s, [])
        with pytest.raises(Exception):
            realspace.kpm_ldos(s, [s.norb])


def test_ldos_zero_outside_spectrum():
    """Regression (code review): energies outside the Gershgorin
    window must return LDOS 0, not the clipped-edge 1/sqrt(1-et^2)
    spike."""
    m = zoo.haldane()
    s = realspace.torus_sample(m, (4, 4))
    from pythtb_tpu.ops.matvec import gershgorin_window

    lo, hi = gershgorin_window(s.h)
    e, ld = realspace.kpm_ldos(s, [0], energies=np.array([lo - 2.0, 0.0,
                                                          hi + 2.0]),
                               num_moments=64)
    assert ld[0, 0] == 0.0 and ld[0, 2] == 0.0
    # same contract for the global KPM DOS
    e2, dos = flows.kpm_dos(m.cut_piece(3, 0, glue_edgs=True).cut_piece(
        3, 1, glue_edgs=True), energies=np.array([lo - 2.0, hi + 2.0]),
        num_moments=32, num_vectors=2)
    assert dos[0] == 0.0 and dos[1] == 0.0


class TestSectorMarker:
    """Real-space QSH diagnostics: Prodan sectors x Bianco-Resta."""

    def test_km_matches_kspace_spin_chern(self):
        # ORACLE: bulk sector markers == flows.spin_chern sector Chern
        # numbers of the periodic parent, INCLUDING signs (with Rashba,
        # so Sz is not conserved and the construction is nontrivial)
        km = zoo.kane_mele(rashba=0.25)
        ref = flows.spin_chern(km, occ=(0, 1), nk=(31, 31))
        fl = km.cut_piece(14, 0).cut_piece(14, 1)
        nocc = fl._norb * fl._nspin // 2
        out = realspace.spin_chern_marker(fl, nocc=nocc)
        pos = np.asarray(fl._orb, float) @ np.asarray(fl._lat, float)
        r = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        bulk = r < 0.3 * r.max()
        # cell marker = sum over the 2 basis orbitals
        cp = 2.0 * out["c_plus"][bulk].mean()
        cm = 2.0 * out["c_minus"][bulk].mean()
        assert abs(cp - ref["chern_plus"]) < 0.03
        assert abs(cm - ref["chern_minus"]) < 0.03
        assert abs(out["gap"]) > 0.5

    def test_trivial_phase_zero(self):
        fl = zoo.kane_mele(esite=2.5).cut_piece(10, 0).cut_piece(10, 1)
        nocc = fl._norb * fl._nspin // 2
        out = realspace.spin_chern_marker(fl, nocc=nocc)
        pos = np.asarray(fl._orb, float) @ np.asarray(fl._lat, float)
        r = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        bulk = r < 0.3 * r.max()
        assert abs(2.0 * out["sector_marker"][bulk].mean()) < 0.05

    def test_sector_sum_rules_exact(self):
        # each sector marker obeys the same exact trace identity as the
        # total: sum over the whole sample == 0
        fl = zoo.kane_mele(rashba=0.25).cut_piece(8, 0).cut_piece(8, 1)
        nocc = fl._norb * fl._nspin // 2
        out = realspace.spin_chern_marker(fl, nocc=nocc)
        assert abs(out["c_plus"].sum()) < 1e-9
        assert abs(out["c_minus"].sum()) < 1e-9

    def test_disorder_robust(self):
        # TRS-preserving (spin-independent) onsite disorder keeps the
        # bulk spin marker quantized -- the point of a real-space Z2
        km = zoo.kane_mele(rashba=0.25)
        fl = km.cut_piece(12, 0).cut_piece(12, 1)
        rng = np.random.default_rng(7)
        fl.set_onsite(rng.uniform(-0.4, 0.4, fl._norb).tolist(),
                      mode="add")
        nocc = fl._norb * fl._nspin // 2
        out = realspace.spin_chern_marker(fl, nocc=nocc)
        pos = np.asarray(fl._orb, float) @ np.asarray(fl._lat, float)
        r = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        bulk = r < 0.3 * r.max()
        assert abs(2.0 * out["sector_marker"][bulk].mean() + 1.0) < 0.1

    def test_fermi_equals_nocc_and_validation(self):
        fl = zoo.kane_mele().cut_piece(5, 0).cut_piece(5, 1)
        nocc = fl._norb * fl._nspin // 2
        a = realspace.spin_chern_marker(fl, nocc=nocc)
        b = realspace.spin_chern_marker(fl, fermi=0.0)
        np.testing.assert_allclose(a["sector_marker"], b["sector_marker"],
                                   atol=1e-12)
        with pytest.raises(Exception):
            realspace.spin_chern_marker(
                zoo.haldane().cut_piece(4, 0).cut_piece(4, 1), nocc=8)
        with pytest.raises(Exception):
            realspace.sector_marker(fl, np.ones(3), nocc=nocc)
        with pytest.raises(Exception):
            realspace.spin_chern_marker(fl, nocc=nocc, fermi=0.0)

    def test_gapless_split_warns(self):
        # a grading whose projected spectrum does not straddle zero at
        # the default split must warn
        fl = zoo.kane_mele().cut_piece(4, 0).cut_piece(4, 1)
        nocc = fl._norb * fl._nspin // 2
        op = np.ones(fl._norb * fl._nspin)  # P O P == identity: gapless
        with pytest.warns(UserWarning):
            realspace.sector_marker(fl, op, nocc=nocc)


def test_marker_host_eigensolver_matches_device():
    """eigensolver="host" (float64 host eigh feeding the device
    contraction) agrees with the one-program device path on every
    marker API.  The host path is the f32-backend default because the
    axon TPU's f32 eigh deviated by 0.181 (3% of ||H||) on a 354-state
    Penrose+flux spectrum while its assembly was exact to 4e-8
    (measured 2026-08-20); CPU f32/x64 agree, which is what this pins.
    """
    m = zoo.haldane(delta=0.3, t=-1.0, t2=0.15j)
    fl = m.cut_piece(5, 0).cut_piece(5, 1)
    rng = np.random.default_rng(3)
    fl.set_onsite(rng.uniform(-0.3, 0.3, fl._norb).tolist(), mode="add")
    cd = realspace.chern_marker(fl, nocc=25, eigensolver="device")
    ch = realspace.chern_marker(fl, nocc=25, eigensolver="host")
    np.testing.assert_allclose(ch, cd, atol=1e-8)

    km = zoo.kane_mele(rashba=0.2).cut_piece(4, 0).cut_piece(4, 1)
    nocc = km._norb * km._nspin // 2
    sd = realspace.spin_chern_marker(km, nocc=nocc, eigensolver="device")
    sh = realspace.spin_chern_marker(km, nocc=nocc, eigensolver="host")
    np.testing.assert_allclose(sh["c_plus"], sd["c_plus"], atol=1e-8)
    np.testing.assert_allclose(sh["c_minus"], sd["c_minus"], atol=1e-8)
    assert abs(sh["gap"] - sd["gap"]) < 1e-8

    sample = realspace.torus_sample(m, (4, 4), onsite_disorder=0.5,
                                    seed=2)
    bd = realspace.bott_index(sample, nocc=16, eigensolver="device")
    bh = realspace.bott_index(sample, nocc=16, eigensolver="host")
    np.testing.assert_allclose(bh, bd, atol=1e-8)

    with pytest.raises(pythtb_tpu.PythtbError):
        realspace.chern_marker(fl, nocc=25, eigensolver="gpu")
