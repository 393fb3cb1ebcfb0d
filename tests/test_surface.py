"""Semi-infinite surface spectral functions (Sancho-Rubio decimation;
no reference counterpart -- the reference only cuts finite pieces).

Oracles: the exact analytic surface Green's function of the
semi-infinite chain, and direct inversion of deep finite slabs built
with completely independent machinery (cut_piece + gen_ham)."""

import numpy as np
import pytest

from pythtb_tpu import surface, tb_model
from pythtb_tpu.models import library as zoo


def test_chain_matches_analytic():
    # semi-infinite chain: g_s(z) = (z - sqrt(z^2 - 4 t^2)) / (2 t^2)
    t = -1.0
    m = zoo.chain(t=t)
    E = np.linspace(-3.0, 3.0, 241)
    eta = 0.02
    A = surface.spectral_function(m, 0, energies=E, eta=eta)[:, 0]
    z = E + 1j * eta
    sq = np.sqrt(z**2 - 4.0 * t * t)
    sq = np.where(np.imag(sq) * np.imag(z) < 0, -sq, sq)
    Aref = -np.imag((z - sq) / (2.0 * t * t)) / np.pi
    np.testing.assert_allclose(A, Aref, atol=1e-10)
    # the opposite surface of the symmetric chain is identical
    At = surface.spectral_function(m, 0, energies=E, eta=eta, side="top")[:, 0]
    np.testing.assert_allclose(At, Aref, atol=1e-10)


def _slab_surface_A(model, surf_dir, kpar, energies, eta, nlayers, top=False):
    """Independent oracle: direct inversion of a deep finite slab; the
    spectral trace over the outermost layer's states."""
    slab = model.cut_piece(nlayers, surf_dir, glue_edgs=False)
    norb = model._norb * model._nspin
    out = np.zeros((len(energies), len(kpar)))
    for jk, k in enumerate(kpar):
        H = np.asarray(slab.gen_ham([list(k)]))[0]
        H = H.reshape(slab._nsta, slab._nsta)
        for je, e in enumerate(energies):
            G = np.linalg.inv((e + 1j * eta) * np.eye(slab._nsta) - H)
            blk = slice(-norb, None) if top else slice(0, norb)
            out[je, jk] = -np.imag(np.trace(G[blk, blk])) / np.pi
    return out


@pytest.mark.parametrize("side", ["bottom", "top"])
def test_haldane_vs_deep_slab(side):
    m = zoo.haldane()
    kpar = np.array([[0.15], [0.35], [0.6]])
    energies = np.array([-1.2, -0.3, 0.4, 1.5])
    eta = 0.08
    A = surface.spectral_function(m, 1, k_par=kpar, energies=energies,
                                  eta=eta, side=side)
    ref = _slab_surface_A(m, 1, kpar, energies, eta, nlayers=120,
                          top=(side == "top"))
    np.testing.assert_allclose(A, ref, atol=2e-4, rtol=1e-3)


def test_second_neighbor_layering_vs_slab():
    # R_surf = 2 hops force a 2-cell principal layer (the m > 1 path)
    m = tb_model(2, 2, lat=[[1.0, 0.0], [0.0, 1.0]], orb=[[0.0, 0.0]])
    m.set_hop(1.0, 0, 0, [1, 0])
    m.set_hop(1.0, 0, 0, [0, 1])
    m.set_hop(0.35, 0, 0, [0, 2])
    kpar = np.array([[0.1], [0.45]])
    energies = np.array([-2.0, 0.0, 1.3])
    eta = 0.08
    A = surface.spectral_function(m, 1, k_par=kpar, energies=energies, eta=eta)
    # the m=2 principal layer spans TWO original cells, so compare
    # against the slab trace over the outermost two cells
    slab = m.cut_piece(120, 1, glue_edgs=False)
    out = np.zeros_like(A)
    for jk, k in enumerate(kpar):
        H = np.asarray(slab.gen_ham([list(k)]))[0].reshape(slab._nsta, slab._nsta)
        for je, e in enumerate(energies):
            G = np.linalg.inv((e + 1j * eta) * np.eye(slab._nsta) - H)
            out[je, jk] = -np.imag(np.trace(G[:2, :2])) / np.pi
    np.testing.assert_allclose(A, out, atol=2e-4, rtol=1e-3)


def test_graphene_zigzag_flat_band():
    g = zoo.graphene()
    kpar = np.linspace(0.0, 1.0, 31)[:, None]
    As, Ab = surface.spectral_function(
        g, 1, k_par=kpar, energies=np.array([0.0]), eta=0.02, return_bulk=True
    )
    # zigzag edge flat band lives between the projected Dirac points
    # (k in (1/3, 2/3)); absent outside; absent in the bulk
    mid = np.abs(kpar[:, 0] - 0.5) < 0.1
    outside = kpar[:, 0] < 0.2
    assert As[0, mid].min() > 30 * As[0, outside].max()
    assert As[0, mid].min() > 30 * Ab[0, mid].max()


def test_kane_mele_helical_edge_spinful():
    km = zoo.kane_mele(esite=1.0)  # QSH phase: gapless helical edge
    ev = km.solve_all(km.k_uniform_mesh([25, 25]))
    mid = 0.5 * (ev[1].max() + ev[2].min())  # center of the bulk gap
    kpar = np.linspace(0.0, 1.0, 41)[:, None]
    As, Ab = surface.spectral_function(
        km, 1, k_par=kpar, energies=np.array([mid]), eta=0.03, return_bulk=True
    )
    # mid-gap: helical edge states on the surface, nothing in the bulk
    assert As.max() > 1.0
    assert As.max() > 20 * Ab.max()


def test_weyl_fermi_arc():
    m = zoo.weyl()
    # surface perpendicular to x; surface momenta (ky, kz)
    ky = np.linspace(-0.2, 0.2, 21)
    for kz, expect_arc in ((0.5, True), (0.0, False)):
        kpar = np.stack([ky, np.full_like(ky, kz)], axis=-1)
        A = surface.spectral_function(
            m, 0, k_par=kpar, energies=np.array([0.0]), eta=0.03
        )
        if expect_arc:
            arc_peak = A.max()
        else:
            no_arc = A.max()
    assert arc_peak > 10 * no_arc


def test_validation():
    from pythtb_tpu import PythtbError

    with pytest.raises(PythtbError):
        surface.spectral_function(zoo.molecule_nh3(), 0)
    with pytest.raises(PythtbError):
        surface.spectral_function(zoo.graphene(), 0)  # k_par required
    with pytest.raises(PythtbError):
        surface.spectral_function(
            zoo.graphene(), 0, k_par=np.zeros((3, 2)), energies=np.zeros(3)
        )
    with pytest.raises(PythtbError):
        surface.spectral_function(
            zoo.chain(), 0, energies=np.zeros(3), side="left"
        )


def test_resolved_weights_sum_to_trace():
    g = zoo.graphene()
    kpar = np.array([[0.45], [0.55]])
    energies = np.array([0.0, 0.8])
    Ar = surface.spectral_function(g, 1, k_par=kpar, energies=energies,
                                   eta=0.05, resolved=True)
    A = surface.spectral_function(g, 1, k_par=kpar, energies=energies, eta=0.05)
    assert Ar.shape == (2, 2, 2)
    np.testing.assert_allclose(Ar.sum(-1), A, atol=1e-12)
    # the zigzag edge state at E=0 is sublattice-polarized
    pol = Ar[0, 0] / Ar[0, 0].sum()
    assert pol.max() > 0.9


def test_fractional_surface_R_rejected():
    from pythtb_tpu import PythtbError

    m = tb_model(2, 2, lat=[[1.0, 0.0], [0.0, 1.0]],
                 orb=[[0.0, 0.0], [0.5, 0.5]])
    m.set_hop(1.0, 0, 1, [1, 0])
    m.set_hop(0.3, 0, 1, [0, 0.5])  # fractional R: legal for Bloch phases
    with pytest.raises(PythtbError):
        surface.spectral_function(m, 1, k_par=np.zeros((1, 1)),
                                  energies=np.zeros(2))


def test_eta_sweep_single_compile():
    # eta is traced, not static: sweeping it must not recompile
    m = zoo.chain()
    E = np.linspace(-3, 3, 31)
    base = surface.spectral_function(m, 0, energies=E, eta=0.05)
    import time
    t0 = time.time()
    for eta in (0.03, 0.07, 0.11):
        A = surface.spectral_function(m, 0, energies=E, eta=eta)
        assert np.isfinite(A).all()
    assert time.time() - t0 < 5.0  # three traced-eta calls, no recompiles


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_random_models_vs_slab(seed):
    """Random 2-D models (random graphs, complex hops, |R_surf| up to 2
    so the multi-cell principal-layer path is exercised): semi-infinite
    surface spectra must match deep-slab direct inversion."""
    rng = np.random.RandomState(500 + seed)
    norb = rng.randint(1, 3)
    m = tb_model(2, 2, lat=np.eye(2).tolist(),
                 orb=(rng.rand(norb, 2)).tolist())
    m.set_onsite(rng.randn(norb))
    added = 0
    for _ in range(8):
        i, j = rng.randint(norb), rng.randint(norb)
        R = [int(rng.randint(-1, 2)), int(rng.randint(-2, 3))]
        if (tuple(R) < (0, 0)) or (tuple(R) == (0, 0) and i >= j):
            continue
        try:
            m.set_hop(rng.randn() + 1j * rng.randn(), i, j, R, mode="set")
            added += 1
        except Exception:
            pass
    if added == 0:
        m.set_hop(1.0, 0, 0, [0, 1])
    kpar = rng.rand(2, 1)
    probe = m.solve_all(m.k_uniform_mesh([5, 5]))
    energies = np.sort(rng.uniform(probe.min() - 0.5, probe.max() + 0.5, 3))
    # the slab oracle truncates at finite depth: convergence to the
    # semi-infinite limit goes like exp(-n_layers * eta / v_max), so a
    # generous broadening and a deep slab keep the truncation error
    # below the tolerance for any random bandwidth drawn here
    eta = 0.3
    mlayers = max([abs(int(np.round(h[3][1]))) for h in m._hoppings] or [1])
    A = surface.spectral_function(m, 1, k_par=kpar, energies=energies, eta=eta)
    slab = m.cut_piece(260, 1, glue_edgs=False)
    S = mlayers * norb
    ref = np.zeros_like(A)
    for jk, k in enumerate(kpar):
        H = np.asarray(slab.gen_ham([list(k)]))[0].reshape(slab._nsta, slab._nsta)
        for je, e in enumerate(energies):
            G = np.linalg.inv((e + 1j * eta) * np.eye(slab._nsta) - H)
            ref[je, jk] = -np.imag(np.trace(G[:S, :S])) / np.pi
    np.testing.assert_allclose(A, ref, atol=1e-4, rtol=1e-3)


def _chain():
    m = tb_model(1, 1, lat=[[1.0]], orb=[[0.0]])
    m.set_hop(1.0, 0, 0, [1])
    return m


def test_decimation_warns_when_unconverged():
    """eta -> 0 at an in-band energy: the recursion blows up (g ~ 1/(w-e)
    hits the real-axis pole), the final coupling spuriously collapses to
    zero, and the peak-coupling detector must warn rather than silently
    return garbage."""
    with pytest.warns(UserWarning, match="not converged"):
        surface.spectral_function(_chain(), 0, energies=[0.0], eta=1e-300)


def test_decimation_auto_escalates_iters():
    """Starting from a depth (2^5 = 32 layers) far below the coherence
    length v/eta = 200 layers, the residual loop escalates iters
    automatically and lands on the same answer as a deep fixed run,
    warning-free."""
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        A = surface.spectral_function(
            _chain(), 0, energies=[0.0], eta=1e-2, iters=5
        )
    assert np.all(np.isfinite(A))
    A_deep = surface.spectral_function(_chain(), 0, energies=[0.0], eta=1e-2)
    np.testing.assert_allclose(A, A_deep, rtol=1e-10)


def test_decimation_converged_runs_unchanged():
    """Default workloads sit far below conv_tol: no warning and results
    identical to a fixed-iteration run."""
    import warnings as _w

    m = zoo.haldane()
    kpar = np.linspace(0.0, 1.0, 5)[:, None]
    with _w.catch_warnings():
        _w.simplefilter("error")
        A1 = surface.spectral_function(m, 0, k_par=kpar, eta=0.05)
    A2 = surface.spectral_function(m, 0, k_par=kpar, eta=0.05, conv_tol=np.inf)
    np.testing.assert_allclose(A1, A2, atol=0)


def test_hofstadter_edge_vs_deep_slab():
    """Surface x magnetic composition (round-3 showcase): the magnetic
    supercell at flux 1/3 feeds the Sancho-Rubio decimation directly
    (both are plain hop tables).  Oracle: direct inversion of a
    100-layer slab, both termination directions."""
    from pythtb_tpu import magnetic
    from pythtb_tpu.models import library as zoo2

    msc = magnetic.magnetic_supercell(zoo2.square(), 1, 3)
    kpar = np.array([[0.1], [0.3], [0.45]])
    energies = np.array([-2.0, -1.0, 0.5, 1.8])
    eta = 0.08
    for sd in (0, 1):
        A = surface.spectral_function(msc, sd, k_par=kpar,
                                      energies=energies, eta=eta)
        ref = _slab_surface_A(msc, sd, kpar, energies, eta, nlayers=100)
        np.testing.assert_allclose(A, ref, atol=2e-6, rtol=1e-4)


def test_hofstadter_chiral_edge_modes():
    """In the first Hofstadter gap the semi-infinite system carries ONE
    chiral edge mode per surface: strong in-gap surface weight absent
    from the bulk, and the two surfaces disperse OPPOSITELY (chirality)
    -- their spectral peaks sit at different k."""
    from pythtb_tpu import magnetic
    from pythtb_tpu.models import library as zoo2

    msc = magnetic.magnetic_supercell(zoo2.square(), 1, 3)
    # bulk magnetic subbands: locate the first gap
    ev = msc.solve_all(msc.k_uniform_mesh((31, 31)))
    e_gap = 0.5 * (ev[0].max() + ev[1].min())
    assert ev[1].min() - ev[0].max() > 0.3
    kpar = np.linspace(0.0, 1.0, 121)[:, None]
    E2 = np.array([e_gap - 0.25, e_gap + 0.25])
    Ab, Abulk = surface.spectral_function(
        msc, 1, k_par=kpar, energies=E2, eta=0.03, return_bulk=True)
    At = surface.spectral_function(
        msc, 1, k_par=kpar, energies=E2, eta=0.03, side="top")
    # edge weight exists and the bulk is gapped there
    assert Ab.max() > 30 * Abulk.max()
    assert At.max() > 30 * Abulk.max()

    # opposite chirality: as E moves through the gap, the edge-state
    # crossing moves in OPPOSITE k-directions on the two surfaces
    def slope(A):
        k1 = float(kpar[np.argmax(A[0]), 0])
        k2 = float(kpar[np.argmax(A[1]), 0])
        d = k2 - k1
        return d - round(d)  # circular difference

    sb, st = slope(Ab), slope(At)
    assert abs(sb) > 0.02 and abs(st) > 0.02, (sb, st)
    assert sb * st < 0, (sb, st)
