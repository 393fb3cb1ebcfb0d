"""Multi-device sharding tests on a virtual 8-device CPU mesh.

conftest.py sets --xla_force_host_platform_device_count=8, so these run
anywhere.  They validate that sharding the k-batch over a
jax.sharding.Mesh produces bit-identical physics to the single-device
path (pure data parallelism over k; see pythtb_tpu/parallel/mesh.py).
"""

import numpy as np
import jax
import pytest

import pythtb_tpu as ptt
from pythtb_tpu.parallel import auto_mesh, use_mesh

from . import zoo


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return auto_mesh(8)


def test_solve_all_sharded_matches(mesh8):
    m = zoo.haldane(ptt)
    k = m.k_uniform_mesh([13, 11])  # 143 points: not divisible by 8 -> padding
    base = m.solve_all(k)
    with use_mesh(mesh8):
        sharded = m.solve_all(k)
    np.testing.assert_allclose(base, sharded, atol=1e-13)


def test_solve_all_vectors_sharded(mesh8):
    m = zoo.kane_mele(ptt, "odd")
    k = m.k_uniform_mesh([5, 5])
    e0, v0 = m.solve_all(k, eig_vectors=True)
    with use_mesh(mesh8):
        e1, v1 = m.solve_all(k, eig_vectors=True)
    np.testing.assert_allclose(e0, e1, atol=1e-13)
    # gauge-invariant check on vectors: band projectors
    P0 = np.einsum("bko,bkp->kop", v0.reshape(4, 25, 4).conj(), v0.reshape(4, 25, 4))
    P1 = np.einsum("bko,bkp->kop", v1.reshape(4, 25, 4).conj(), v1.reshape(4, 25, 4))
    np.testing.assert_allclose(P0, P1, atol=1e-12)


@pytest.mark.parametrize("nk", [(17, 17), (14, 11)])  # divisible and not
def test_chern_sharded(mesh8, nk):
    m = zoo.haldane(ptt)
    wf0 = ptt.wf_array(m, list(nk))
    gaps0 = wf0.solve_on_grid([-0.5, -0.5])
    c0 = wf0.berry_flux([0]) / (2.0 * np.pi)
    with use_mesh(mesh8):
        wf1 = ptt.wf_array(m, list(nk))
        gaps1 = wf1.solve_on_grid([-0.5, -0.5])
        c1 = wf1.berry_flux([0]) / (2.0 * np.pi)
    np.testing.assert_allclose(gaps0, gaps1, atol=1e-13)
    np.testing.assert_allclose(c0, c1, atol=1e-12)
    np.testing.assert_allclose(abs(c1), 1.0, atol=1e-4)


@pytest.mark.parametrize("nk", [(17, 17), (14, 12)])  # divisible and not
def test_berry_flux_grid_sharded(mesh8, nk):
    """The fused flux pipeline shards in-program for ANY grid size (no
    divisibility requirement -- GSPMD handles uneven shards)."""
    from pythtb_tpu import flows

    m = zoo.haldane(ptt)
    f0 = flows.berry_flux_grid(m, [0], nk=nk)
    f1 = flows.berry_flux_grid(m, [0], nk=nk, mesh=mesh8)
    np.testing.assert_allclose(f0, f1, atol=1e-12)
    np.testing.assert_allclose(abs(f1) / (2 * np.pi), 1.0, atol=1e-4)


def test_graft_entry_dryrun():
    """The driver's multi-chip dry-run must compile and execute."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def _lower_sharded_chern(mesh8, nk):
    from pythtb_tpu import flows
    from pythtb_tpu.utils.xfer import host_pack

    m = zoo.haldane(ptt)
    static, data, (n0, n1), (p0, p1) = flows._grid_inputs(m, nk, (-0.5, -0.5))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    start = np.array([-0.5, -0.5])
    return flows._chern_jit.lower(
        static, data, (0,), n0, n1, start, phases_ri, mesh8
    )


def test_sharded_chern_hlo_contains_collectives(mesh8):
    """The compiled sharded Chern program must actually communicate:
    halo exchange (collective-permute) for neighbor overlaps and a psum
    (all-reduce) for the flux sum are inserted by GSPMD."""
    import re

    txt = _lower_sharded_chern(mesh8, (17, 17)).compile().as_text()
    colls = set(re.findall(
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)", txt
    ))
    assert "all-reduce" in colls, colls          # flux psum
    assert "collective-permute" in colls, colls  # neighbor halo exchange


def test_sharded_chern_transfers_only_scalars(mesh8):
    """The sharded pipeline builds its k-grid on device: every program
    input is model-table-sized (hopping table, phases, start scalars) --
    nothing proportional to the 256-point k-batch crosses the host
    boundary."""
    lowered = _lower_sharded_chern(mesh8, (17, 17))
    in_sizes = [
        int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(lowered.in_avals)
    ]
    assert in_sizes, "expected nonempty input avals"
    assert max(in_sizes) < 256, in_sizes  # B = 16*16 = 256 never appears


def test_kpm_dos_shards_random_vectors(mesh8):
    """kpm_dos under an active mesh shards the stochastic-trace vectors
    (pure data parallelism) and returns the same DOS as unsharded for
    the same seed and vector count."""
    from pythtb_tpu import flows
    from pythtb_tpu.models import library as zoo2

    flake = zoo2.haldane().cut_piece(6, 0).cut_piece(6, 1)
    e0, d0 = flows.kpm_dos(flake, num_moments=64, num_vectors=8, seed=3)
    with use_mesh(mesh8):
        e1, d1 = flows.kpm_dos(flake, num_moments=64, num_vectors=8, seed=3)
    np.testing.assert_allclose(e0, e1, atol=0)
    np.testing.assert_allclose(d0, d1, atol=1e-8)
    # non-divisible vector counts are rounded up, not rejected
    with use_mesh(mesh8):
        _, d2 = flows.kpm_dos(flake, num_moments=64, num_vectors=5, seed=3)
    assert np.all(np.isfinite(d2))


def test_hofstadter_fn_shards_flux_axis(mesh8):
    """hofstadter_fn under a mesh shards the flux axis; spectra equal
    the unsharded run, and the mesh is resolved at call time (no stale
    executable after entering use_mesh)."""
    from pythtb_tpu import magnetic
    from pythtb_tpu.models import library as zoo2

    fn, _ = magnetic.hofstadter_fn(zoo2.square(), 8)
    pv = np.arange(8, dtype=float)
    kg = np.array([[0.0, 0.0], [0.25, 0.5]])
    base = np.asarray(fn(pv, kg))  # first call unsharded
    with use_mesh(mesh8):
        sharded = np.asarray(fn(pv, kg))
    np.testing.assert_allclose(base, sharded, atol=1e-10)


def test_second_chern_shards_family_solve(mesh8):
    """second_chern under a mesh: the per-slice grid solve carries the
    batch-axis sharding annotation; values match the unsharded run."""
    from pythtb_tpu import flows
    from pythtb_tpu.models import library as zoo2

    L = 6
    loop = [zoo2.fu_kane_mele(beta=2 * np.pi * i / L) for i in range(L)]
    base = flows.second_chern(loop, (0, 1), nk=(8, 8, 8), refine=False)
    with use_mesh(mesh8):
        sharded = flows.second_chern(loop, (0, 1), nk=(8, 8, 8), refine=False)
    np.testing.assert_allclose(base, sharded, atol=1e-10)


def test_floquet_chern_sharded_matches(mesh8):
    """floquet.chern with an active mesh shards the propagator's
    k-batch; the Chern number is unchanged vs the single-device path."""
    from pythtb_tpu import floquet

    m = zoo.haldane(ptt)
    circ = {"A": [0.5, 0.5], "phase": [0.0, np.pi / 2]}
    c0 = floquet.chern(m, 8.0, circ, band=0, nk=(9, 9), nt=16)
    with use_mesh(mesh8):
        c1 = floquet.chern(m, 8.0, circ, band=0, nk=(9, 9), nt=16)
    np.testing.assert_allclose(c0, c1, atol=1e-9)
    assert abs(abs(c0) - 1.0) < 0.1


def test_integrated_metric_sharded_matches(mesh8):
    """geometry.integrated_metric under a mesh shards the k-grid; the
    integrated QGT is unchanged vs the single-device path."""
    from pythtb_tpu import geometry

    m = zoo.haldane(ptt)
    base = geometry.integrated_metric(m, occ=[0], nk=(24, 24))
    with use_mesh(mesh8):
        sharded = geometry.integrated_metric(m, occ=[0], nk=(24, 24))
    np.testing.assert_allclose(base["metric"], sharded["metric"], atol=1e-12)
    np.testing.assert_allclose(base["curvature"], sharded["curvature"],
                               atol=1e-12)
    assert abs(base["chern"] - sharded["chern"]) < 1e-12


def test_quench_echo_sharded_matches(mesh8):
    """dynamics.quench_echo under a mesh shards the k-grid; the rate
    function is unchanged."""
    from pythtb_tpu import dynamics

    mi = ptt.models.ssh(delta=0.5)
    mf = ptt.models.ssh(delta=-0.5)
    ts = np.linspace(0.3, 3.0, 5)
    base = dynamics.quench_echo(mi, mf, [0], (16,), ts)
    with use_mesh(mesh8):
        sharded = dynamics.quench_echo(mi, mf, [0], (16,), ts)
    np.testing.assert_allclose(base, sharded, atol=1e-12)


def test_harmonic_spectrum_sharded_matches(mesh8):
    """optical.harmonic_spectrum under a mesh shards the k-grid inside
    the vmapped time evolution; harmonics unchanged."""
    from pythtb_tpu import optical

    bn = ptt.models.bn(delta=1.0)
    kw = dict(occ=[0], nk=(16, 16), cycles=14, ramp_cycles=5,
              steps_per_cycle=32)
    base = optical.harmonic_spectrum(bn, 0.6, 1e-3, **kw)
    with use_mesh(mesh8):
        sharded = optical.harmonic_spectrum(bn, 0.6, 1e-3, **kw)
    # sharded reductions reorder the k-sum: agreement to round-off
    np.testing.assert_allclose(base["sigma1"], sharded["sigma1"],
                               atol=1e-8)
    np.testing.assert_allclose(base["sigma2"], sharded["sigma2"],
                               atol=1e-8)


def test_landauer_sharded_matches(mesh8):
    """negf.landauer_transmission under a mesh shards the energy batch
    (wI is GSPMD-annotated on axis 0); transmission unchanged, including
    the multi-layer RGF device path and the spin-resolved dense path."""
    from pythtb_tpu import negf

    rib = zoo.haldane(ptt).cut_piece(3, 1, glue_edgs=False)
    Es = np.linspace(-1.0, 1.0, 13)  # 13: not divisible by 8
    base = negf.landauer_transmission(rib, Es, eta=1e-5)
    with use_mesh(mesh8):
        sharded = negf.landauer_transmission(rib, Es, eta=1e-5)
    np.testing.assert_allclose(base, sharded, atol=1e-12)

    H00, _ = negf.lead_blocks(rib)
    rng = np.random.default_rng(7)
    dev = [H00 + np.diag(rng.uniform(-0.5, 0.5, len(H00)))
           for _ in range(3)]
    base_d = negf.landauer_transmission(rib, Es, device=dev, eta=1e-5)
    with use_mesh(mesh8):
        shard_d = negf.landauer_transmission(rib, Es, device=dev, eta=1e-5)
    np.testing.assert_allclose(base_d, shard_d, atol=1e-12)


def test_spectral_function_sharded_matches(mesh8):
    """surface.spectral_function under a mesh shards the larger of the
    (E, K) batch axes; the spectral map is unchanged on both branches."""
    from pythtb_tpu import surface

    m = zoo.haldane(ptt)
    # K-heavy branch: 1 energy x 17 momenta (axis 1 sharded)
    kpar = np.linspace(0.0, 1.0, 17)
    A_base = surface.spectral_function(m, 1, k_par=kpar,
                                       energies=np.array([0.3]), eta=0.05)
    with use_mesh(mesh8):
        A_shard = surface.spectral_function(m, 1, k_par=kpar,
                                            energies=np.array([0.3]),
                                            eta=0.05)
    np.testing.assert_allclose(A_base, A_shard, atol=1e-12)
    # E-heavy branch: 21 energies x 1 momentum (axis 0 sharded)
    Es = np.linspace(-1.5, 1.5, 21)
    B_base = surface.spectral_function(m, 1, k_par=np.array([0.25]),
                                       energies=Es, eta=0.05,
                                       return_bulk=True)
    with use_mesh(mesh8):
        B_shard = surface.spectral_function(m, 1, k_par=np.array([0.25]),
                                            energies=Es, eta=0.05,
                                            return_bulk=True)
    np.testing.assert_allclose(B_base[0], B_shard[0], atol=1e-12)
    np.testing.assert_allclose(B_base[1], B_shard[1], atol=1e-12)


def test_meanfield_sharded_matches(mesh8):
    """meanfield SCF loops under a mesh shard the k-grid; the fixed
    points are unchanged (collinear HF, noncollinear HF, and BCS)."""
    from pythtb_tpu import meanfield

    g = zoo.haldane(ptt)
    base = meanfield.hartree_fock(g, 3.0, 2.0, nk=(12, 12), seed=3)
    with use_mesh(mesh8):
        shard = meanfield.hartree_fock(g, 3.0, 2.0, nk=(12, 12), seed=3)
    np.testing.assert_allclose(base["n_up"], shard["n_up"], atol=1e-10)
    np.testing.assert_allclose(base["n_dn"], shard["n_dn"], atol=1e-10)
    assert abs(base["energy"] - shard["energy"]) < 1e-10

    km = zoo.kane_mele(ptt)
    base2 = meanfield.hartree_fock(km, 3.0, 2.0, nk=(10, 10), seed=7)
    with use_mesh(mesh8):
        shard2 = meanfield.hartree_fock(km, 3.0, 2.0, nk=(10, 10), seed=7)
    np.testing.assert_allclose(
        np.linalg.norm(base2["magnetization"], axis=1),
        np.linalg.norm(shard2["magnetization"], axis=1), atol=1e-8)

    sq = ptt.models.square(t=-1.0)
    base3 = meanfield.bcs_gap(sq, 2.0, -0.4, nk=(16, 16), temperature=0.05)
    with use_mesh(mesh8):
        shard3 = meanfield.bcs_gap(sq, 2.0, -0.4, nk=(16, 16),
                                   temperature=0.05)
    np.testing.assert_allclose(base3["delta"], shard3["delta"], atol=1e-10)


def test_dmft_gloc_sharded_matches(mesh8):
    """The DMFT lattice Green's-function pole sum (the N_k-heavy
    direction) shards over the mesh and matches the single-device
    result."""
    from pythtb_tpu import dmft

    m = zoo.haldane(ptt)
    epso, amps, lams, eps_d = dmft._lattice_pole_data(m, 0, [12, 11])
    wn = dmft.matsubara(20.0, 64)
    sig = 0.3 / (1j * wn + 0.7)
    g0 = dmft._gloc_lattice(epso, amps, lams, wn, 0.45, sig)
    with use_mesh(mesh8):
        g1 = dmft._gloc_lattice(epso, amps, lams, wn, 0.45, sig)
    np.testing.assert_allclose(g0, g1, atol=1e-13)


def test_dmft_band_spectral_sharded_matches(mesh8):
    """The real-frequency ARPES map A(k, w) (Schur pole reduction at
    z = w + i eta, including the orbital-resolved spectator block) and
    the real-axis local G shard over the k axis and match the
    single-device results."""
    import warnings

    from pythtb_tpu import dmft

    lat = [[1.0]]
    orb = [[0.0], [0.5]]
    m = ptt.tb_model(1, 1, lat, orb)
    m.set_onsite([0.0, 2.0])
    m.set_hop(-1.0, 0, 0, [1])
    m.set_hop(0.3, 0, 1, [0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = dmft.solve(m, U=1.5, orb=0, beta=8.0, nk=13,
                         n_matsubara=48, n_bath=2, max_iter=4,
                         tol=1e-10)
    kp = np.linspace(0.0, 1.0, 11)[:, None]  # 11 points: not divisible by 8
    om = np.linspace(-3.0, 4.0, 37)
    a0 = dmft.band_spectral(res, kp, om, eta=0.1, resolved=True)
    l0 = res.local_spectral(om, eta=0.1)
    with use_mesh(mesh8):
        a1 = dmft.band_spectral(res, kp, om, eta=0.1, resolved=True)
        l1 = res.local_spectral(om, eta=0.1)
    np.testing.assert_allclose(a0, a1, atol=1e-13)
    np.testing.assert_allclose(l0, l1, atol=1e-13)


def test_bse_sharded_matches(mesh8):
    """The BSE pair-grid kernel build shards the hole-sheet k axis and
    reproduces the single-device exciton spectrum."""
    from pythtb_tpu import exciton

    bn = ptt.tb_model(2, 2, [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]],
                      [[1.0 / 3, 1.0 / 3], [2.0 / 3, 2.0 / 3]])
    bn.set_onsite([-0.9, 0.9])
    for ij in ((0, 1, [0, 0]), (1, 0, [1, 0]), (1, 0, [0, 1])):
        bn.set_hop(-1.0, *ij)
    V = exciton.radial_interaction(bn, lambda x: 1.6 / (x + 0.5), 3.0)
    r0 = exciton.bse(bn, V, occ=[0], nk=(6, 6), qp="hf")
    with use_mesh(mesh8):
        r1 = exciton.bse(bn, V, occ=[0], nk=(6, 6), qp="hf")
    np.testing.assert_allclose(r0.energies, r1.energies, atol=1e-10)
    # per-state oscillator strengths are NOT gauge invariant inside
    # degenerate multiplets (the two eighs pick different bases);
    # compare degeneracy-cluster sums instead
    f0 = r0.oscillator_strengths(0)
    f1 = r1.oscillator_strengths(0)
    bounds = [0] + list(np.nonzero(np.diff(r0.energies) > 1e-8)[0] + 1) \
        + [len(f0)]
    c0 = np.array([f0[a:b].sum() for a, b in zip(bounds[:-1], bounds[1:])])
    c1 = np.array([f1[a:b].sum() for a, b in zip(bounds[:-1], bounds[1:])])
    np.testing.assert_allclose(c0, c1, atol=1e-8)


def test_eph_linewidths_sharded_matches(mesh8):
    """The eph q-grid vertex batch shards (including the host-solved
    phonon tables on the same axis) and reproduces the linewidths."""
    from pythtb_tpu import eph, phonon

    lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2.0]]
    orb = [[1 / 3.0, 1 / 3.0], [2 / 3.0, 2 / 3.0]]
    m = ptt.tb_model(2, 2, lat, orb)
    m.set_hop(-1.0, 0, 1, [0, 0])
    m.set_hop(-1.0, 1, 0, [1, 0])
    m.set_hop(-1.0, 1, 0, [0, 1])
    fc = phonon.force_model(lat, orb, masses=[1.0, 1.4])
    fc.set_spring(1.0, 0, 1, [0, 0], kt=0.3)
    fc.set_spring(1.0, 1, 0, [1, 0], kt=0.3)
    fc.set_spring(1.0, 1, 0, [0, 1], kt=0.3)
    kp = np.array([[0.1, 0.2], [0.35, 0.15]])
    g0 = eph.linewidths(m, fc, 1.5, kp, mu=0.0, temperature=0.15,
                        nkq=(10, 9), sigma=0.12)
    with use_mesh(mesh8):
        g1 = eph.linewidths(m, fc, 1.5, kp, mu=0.0, temperature=0.15,
                            nkq=(10, 9), sigma=0.12)
    np.testing.assert_allclose(g0, g1, atol=1e-12)


def test_multi_terminal_sharded_matches(mesh8):
    """negf.multi_terminal under a mesh shards the energy batch of the
    all-leads decimation + dense device solve; T_pq unchanged."""
    from pythtb_tpu import negf

    sq = ptt.models.square(t=-1.0)
    Hd, leads, _ = negf.hall_bar(sq, (4, 4))
    Es = np.linspace(-1.0, 1.0, 13)  # 13: not divisible by 8
    base = negf.multi_terminal(Hd, leads, Es, eta=1e-5)
    with use_mesh(mesh8):
        sharded = negf.multi_terminal(Hd, leads, Es, eta=1e-5)
    np.testing.assert_allclose(base, sharded, atol=1e-12)


def test_dos_linear_sharded_matches(mesh8):
    """fermisurface.dos_linear under a mesh shards the k-grid axis of
    the simplex solve; DOS unchanged."""
    from pythtb_tpu import fermisurface as fs

    g = ptt.models.graphene(t=-1.0)
    Es = np.linspace(-3.2, 3.2, 41)
    base = fs.dos_linear(g, Es, nk=36)
    with use_mesh(mesh8):
        sharded = fs.dos_linear(g, Es, nk=36)
    np.testing.assert_allclose(base, sharded, atol=1e-12)


def test_edelstein_sharded_matches(mesh8):
    from pythtb_tpu import boltzmann

    _SY = np.array([[0, -1j], [1j, 0]]) / 2
    _SX = np.array([[0, 1], [1, 0]], dtype=complex) / 2
    m = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]], nspin=2)
    m.set_hop(-1.0 * np.eye(2) - 1j * 0.6 * _SY, 0, 0, [1, 0])
    m.set_hop(-1.0 * np.eye(2) + 1j * 0.6 * _SX, 0, 0, [0, 1])
    base = boltzmann.edelstein(m, [-2.0, 0.3], 0.08, 36)
    with use_mesh(mesh8):
        sharded = boltzmann.edelstein(m, [-2.0, 0.3], 0.08, 36)
    np.testing.assert_allclose(base, sharded, atol=1e-12)


def test_lyapunov_sharded_matches(mesh8):
    """localization.lyapunov_spectrum under a mesh shards the energy
    batch of the transfer-matrix scan; exponents unchanged."""
    from pythtb_tpu import localization as loc

    ch = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    ch.set_hop(-1.0, 0, 0, [1])
    Es = np.linspace(2.2, 4.2, 16)
    base = loc.lyapunov_spectrum(ch, Es, 2000, disorder=0.8, seed=2)
    with use_mesh(mesh8):
        sharded = loc.lyapunov_spectrum(ch, Es, 2000, disorder=0.8,
                                        seed=2)
    np.testing.assert_allclose(base, sharded, atol=1e-12)


def test_find_nodes_sharded_matches(mesh8):
    """The node-finder gap scan shards over the k batch; the located
    nodes are identical with and without the mesh (18x18 scan: 324
    points, not divisible by 8 -> GSPMD padding)."""
    from pythtb_tpu import flows
    from pythtb_tpu import models

    m = models.graphene()
    k0, g0 = flows.find_nodes(m, band=0, nk=18, gap_tol=1e-4)
    with use_mesh(mesh8):
        k1, g1 = flows.find_nodes(m, band=0, nk=18, gap_tol=1e-4)
    assert k0.shape == k1.shape == (2, 2)
    np.testing.assert_allclose(k0, k1, atol=1e-10)
    np.testing.assert_allclose(g0, g1, atol=1e-10)
