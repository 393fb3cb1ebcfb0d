"""Randomized differential testing against the live reference.

Random models (dimensions, periodicity subsets, spin structure, random
hopping tables incl. out-of-cell orbitals and far R vectors) are built
identically through both implementations; spectra and Berry quantities
must agree to float64 round-off, and *invalid* constructions must be
rejected by both.  This catches semantic drift in corners the curated
workloads miss.
"""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import pythtb_tpu as ptt

# committed-seed burn-in tier: redundant-by-design coverage, excluded
# from the default (<15 min) driver gate; run with -m '' for the full tier
pytestmark = pytest.mark.slow


def _build_random(mod, rng_seed, force_2d=False, frac_R=False):
    """Build one random model; returns (model, log) where log records
    which mutation attempts raised (for cross-implementation checks)."""
    rng = np.random.RandomState(rng_seed)
    dim_r = rng.randint(1, 4)
    dim_k = rng.randint(0, dim_r + 1)
    if force_2d:
        dim_r = dim_k = 2
    per = sorted(rng.choice(dim_r, size=dim_k, replace=False).tolist())
    nspin = 1 if rng.rand() < 0.7 else 2
    norb = rng.randint(1, 5)
    lat = np.eye(dim_r) + 0.25 * rng.randn(dim_r, dim_r)
    if dim_r > 0 and np.linalg.det(lat) < 0:
        lat[0] *= -1.0
    if abs(np.linalg.det(lat)) < 0.1:
        lat = np.eye(dim_r)
    orb = rng.uniform(-0.2, 1.2, size=(norb, dim_r))

    log = []
    m = mod.tb_model(dim_k, dim_r, lat.tolist(), orb.tolist(), per=per, nspin=nspin)

    def attempt(desc, fn):
        try:
            fn()
            log.append((desc, "ok"))
        except Exception:
            log.append((desc, "raise"))

    # onsite: scalars, Pauli 4-vectors, or explicit Hermitian 2x2 blocks
    if nspin == 1:
        ons = rng.randn(norb)
    elif rng.rand() < 0.5:
        ons = [rng.randn(4) for _ in range(norb)]
    else:
        def herm2():
            A = rng.randn(2, 2) + 1j * rng.randn(2, 2)
            return 0.5 * (A + A.conj().T)
        ons = [herm2() for _ in range(norb)]
    attempt("onsite", lambda: m.set_onsite(list(ons)))

    # random hoppings (some invalid on purpose)
    n_try = rng.randint(2, 12)
    for t in range(n_try):
        i = rng.randint(norb)
        j = rng.randint(norb)
        if dim_k > 0:
            R = rng.randint(-2, 3, size=dim_r).astype(float)
            if frac_R and rng.rand() < 0.4:
                R = R + rng.choice([0.0, 0.25, 0.5], size=dim_r)
            if not frac_R:
                R = R.astype(int)
        else:
            R = None
        if nspin == 1:
            amp = rng.randn() + 1j * rng.randn()
        elif rng.rand() < 0.5:
            amp = rng.randn(4)
        else:
            amp = rng.randn(2, 2) + 1j * rng.randn(2, 2)  # arbitrary 2x2 block
        mode = rng.choice(["set", "add", "reset"])
        acp = bool(rng.rand() < 0.3)
        attempt(
            "hop%d" % t,
            lambda i=i, j=j, R=R, amp=amp, mode=mode, acp=acp: m.set_hop(
                amp, i, j, None if R is None else list(R), mode=mode,
                allow_conjugate_pair=acp,
            ),
        )
    return m, log


SEEDS = list(range(24))


@pytest.mark.parametrize("seed", SEEDS)
def test_random_model_matches_reference(seed, ref):
    with redirect_stdout(io.StringIO()):
        m_ref, log_ref = _build_random(ref, seed)
        m_tpu, log_tpu = _build_random(ptt, seed)
    assert log_ref == log_tpu, "mutation accept/reject behavior diverged"

    rng = np.random.RandomState(seed + 1000)
    if m_ref._dim_k == 0:
        e_ref = m_ref.solve_all()
        e_tpu = m_tpu.solve_all()
    else:
        kpts = rng.randn(7, m_ref._dim_k)
        e_ref = m_ref.solve_all(kpts)
        e_tpu = m_tpu.solve_all(kpts)
    np.testing.assert_allclose(e_ref, e_tpu, atol=2e-12, rtol=1e-9)

    # Berry quantities on a small grid (2D only, keep it fast)
    if m_ref._dim_k == 2 and m_ref._nsta >= 2:
        with redirect_stdout(io.StringIO()):
            wr = ref.wf_array(m_ref, [5, 5])
            wr.solve_on_grid([0.0, 0.0])
            wt = ptt.wf_array(m_tpu, [5, 5])
            wt.solve_on_grid([0.0, 0.0])
        # all-states quantities are invariant under any degenerate-subspace
        # gauge, so they compare safely even for accidentally-degenerate
        # random models
        pr = wr.berry_phase("All", 1, contin=False)
        pt = wt.berry_phase("All", 1, contin=False)
        np.testing.assert_allclose(
            np.angle(np.exp(1j * (pr - pt))), 0.0, atol=1e-9
        )
        np.testing.assert_allclose(
            wr.berry_flux("All"), wt.berry_flux("All"), atol=1e-9
        )


@pytest.mark.parametrize("seed", range(8))
def test_random_surgery_matches_reference(seed, ref):
    """Random chains of cut_piece / make_supercell / remove_orb on a 2D
    model must produce identical spectra."""
    rng = np.random.RandomState(seed)
    with redirect_stdout(io.StringIO()):
        m_ref, _ = _build_random(ref, 100 + seed)
        m_tpu, _ = _build_random(ptt, 100 + seed)
    if m_ref._dim_k != 2 or m_ref._dim_r != 2:
        pytest.skip("surgery fuzz targets dim_k=dim_r=2 models")

    ops = rng.choice(["cut", "sc", "rm"], size=2)
    for op in ops:
        with redirect_stdout(io.StringIO()):
            if op == "cut" and m_ref._dim_k > 0:
                num = rng.randint(2, 4)
                fdir = m_ref._per[rng.randint(len(m_ref._per))]
                glue = bool(rng.rand() < 0.3)
                m_ref = m_ref.cut_piece(num, fdir, glue_edgs=glue)
                m_tpu = m_tpu.cut_piece(num, fdir, glue_edgs=glue)
            elif op == "sc" and m_ref._dim_k == 2:
                sc = [[2, 1], [0, 1]] if rng.rand() < 0.5 else [[1, -1], [1, 1]]
                # to_home=False: the reference snapshot's home-cell shift is
                # buggy (SURVEY hard-part #3) and pythtb_tpu implements the
                # documented intent instead, which is observable through
                # subsequent finite cuts of out-of-cell orbitals
                m_ref = m_ref.make_supercell(sc, to_home=False)
                m_tpu = m_tpu.make_supercell(sc, to_home=False)
            elif op == "rm" and m_ref._norb > 1:
                kill = [int(rng.randint(m_ref._norb))]
                m_ref = m_ref.remove_orb(kill)
                m_tpu = m_tpu.remove_orb(kill)
    if m_ref._dim_k == 0:
        e_ref, e_tpu = m_ref.solve_all(), m_tpu.solve_all()
    else:
        kpts = rng.randn(5, m_ref._dim_k)
        e_ref, e_tpu = m_ref.solve_all(kpts), m_tpu.solve_all(kpts)
    np.testing.assert_allclose(e_ref, e_tpu, atol=1e-10, rtol=1e-8)


@pytest.mark.parametrize("seed", range(10))
def test_random_wilson_spectra_match_reference(seed, ref):
    """Closed-loop Wilson spectra (berry_evals) of the FULL state set are
    gauge invariant, so they compare safely on random (possibly
    degenerate) models.  Matched as phase multisets on the circle."""
    with redirect_stdout(io.StringIO()):
        m_ref, _ = _build_random(ref, 300 + seed, force_2d=True)
        m_tpu, _ = _build_random(ptt, 300 + seed, force_2d=True)
    with redirect_stdout(io.StringIO()):
        wr = ref.wf_array(m_ref, [6, 6]); wr.solve_on_grid([0.0, 0.0])
        wt = ptt.wf_array(m_tpu, [6, 6]); wt.solve_on_grid([0.0, 0.0])
    fr = wr.berry_phase("All", 0, contin=False, berry_evals=True)
    ft = wt.berry_phase("All", 0, contin=False, berry_evals=True)
    assert fr.shape == ft.shape
    for row in range(fr.shape[0]):
        avail = list(ft[row])
        for want in fr[row]:
            dists = [abs(np.angle(np.exp(1j * (got - want)))) for got in avail]
            k = int(np.argmin(dists))
            assert dists[k] < 1e-8, (row, want, ft[row])
            avail.pop(k)


@pytest.mark.parametrize("seed", range(8))
def test_random_position_ops_match_reference(seed, ref):
    """Position expectations and hybrid-Wannier centers on ribbons cut
    from random 2D models must match the reference exactly."""
    with redirect_stdout(io.StringIO()):
        m_ref, _ = _build_random(ref, 400 + seed, force_2d=True)
        m_tpu, _ = _build_random(ptt, 400 + seed, force_2d=True)
        rib_ref = m_ref.cut_piece(3, 1, glue_edgs=False)
        rib_tpu = m_tpu.cut_piece(3, 1, glue_edgs=False)
    rng = np.random.RandomState(seed)
    k = [float(rng.rand())]
    e_ref, v_ref = rib_ref.solve_one(k, eig_vectors=True)
    _, v_tpu = rib_tpu.solve_one(k, eig_vectors=True)
    nocc = max(1, rib_ref._nsta // 2)
    if nocc < rib_ref._nsta and e_ref[nocc] - e_ref[nocc - 1] < 1e-6:
        pytest.skip("degenerate occupation cut: occupied subspace ill-defined")
    # position expectation of the occupied manifold: each band's value is
    # gauge-dependent under degeneracy, but the SUM over the manifold and
    # the sorted HWF centers are invariant
    p_ref = rib_ref.position_expectation(v_ref[:nocc], 1)
    p_tpu = rib_tpu.position_expectation(v_tpu[:nocc], 1)
    np.testing.assert_allclose(p_ref.sum(), p_tpu.sum(), atol=1e-9)
    h_ref = rib_ref.position_hwf(v_ref[:nocc], 1)
    h_tpu = rib_tpu.position_hwf(v_tpu[:nocc], 1)
    np.testing.assert_allclose(np.sort(h_ref), np.sort(h_tpu), atol=1e-9)


def test_fractional_lattice_vector_matches_reference(ref):
    """Non-integer ind_R is legal in the reference (it enters the Bloch
    phase raw); it must not be silently truncated."""
    def build(M):
        with redirect_stdout(io.StringIO()):
            m = M.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]],
                           [[0.0, 0.0], [0.4, 0.1]])
            m.set_hop(1.0, 0, 1, [0.5, 0.0])
            m.set_hop(0.3 + 0.2j, 0, 1, [1, 0], allow_conjugate_pair=True)
        return m
    k = np.array([[0.3, 0.1], [0.7, 0.9], [0.25, 0.5]])
    e_ref = build(ref).solve_all(k)
    e_tpu = build(ptt).solve_all(k)
    np.testing.assert_allclose(e_ref, e_tpu, atol=1e-12)


@pytest.mark.parametrize("seed", range(8))
def test_random_fractional_R_matches_reference(seed, ref):
    """Hopping vectors with non-integer components are legal in the
    reference (raw Bloch phases); spectra must match exactly."""
    with redirect_stdout(io.StringIO()):
        m_ref, lr = _build_random(ref, 600 + seed, frac_R=True)
        m_tpu, lt = _build_random(ptt, 600 + seed, frac_R=True)
    assert lr == lt
    rng = np.random.RandomState(seed)
    if m_ref._dim_k == 0:
        e_ref, e_tpu = m_ref.solve_all(), m_tpu.solve_all()
    else:
        k = rng.randn(6, m_ref._dim_k)
        e_ref, e_tpu = m_ref.solve_all(k), m_tpu.solve_all(k)
    np.testing.assert_allclose(e_ref, e_tpu, atol=2e-12, rtol=1e-9)


def _boundary_gapped(model, nocc, kpts, tol=1e-8):
    """True iff the occupied/empty boundary is gapped everywhere on the
    sampled grid.  At an exact degeneracy the occupied subspace itself
    is ill-defined: the two implementations legitimately pick different
    eigenvectors there, so Berry quantities need not agree (measured:
    only such draws ever mismatched, e.g. seeds 10872/10954 with
    boundary gap exactly 0)."""
    if nocc >= model._nsta:
        return True
    ev = model.solve_all(kpts)
    return (ev[nocc] - ev[nocc - 1]).min() > tol


def _links_ok(wf, nocc, tol=1e-6):
    """True iff every nearest-neighbor link-overlap determinant on the
    grid is bounded away from singular.  Discretized Berry quantities
    are mathematically defined only then; on singular links both
    implementations return noise (ours with a UserWarning), so such
    random draws are skipped rather than compared."""
    shp = tuple(int(s) for s in np.asarray(wf._mesh_arr))
    for d in range(len(shp)):
        for idx in np.ndindex(*shp):
            nxt = list(idx)
            nxt[d] += 1
            if nxt[d] >= shp[d]:
                continue
            a = np.asarray(wf[idx if len(shp) > 1 else idx[0]])
            b = np.asarray(wf[tuple(nxt) if len(shp) > 1 else nxt[0]])
            ar = a.reshape(a.shape[0], -1)[:nocc]
            br = b.reshape(b.shape[0], -1)[:nocc]
            if abs(np.linalg.det(ar.conj() @ br.T)) < tol:
                return False
    return True


def _wrapped_close(a, b, tol=1e-8):
    return np.abs(np.angle(np.exp(1j * (np.asarray(a) - np.asarray(b))))).max() < tol


@pytest.mark.parametrize("seed", [9304, 9311, 9336, 9358, 9402, 9466])
def test_random_contin_berry_matches_reference(seed, ref):
    """Multiband Berry phases with contin=True on random 2-D models:
    wrapped values match, and the branch choices agree up to a single
    global 2*pi*n shift of the whole string family."""
    with redirect_stdout(io.StringIO()):
        m_ref, _ = _build_random(ref, seed, force_2d=True)
        m_tpu, _ = _build_random(ptt, seed, force_2d=True)
    nocc = max(1, m_ref._nsta // 2)
    occ = list(range(nocc))
    kg = np.stack(
        np.meshgrid(np.arange(6) / 5.0, np.arange(7) / 6.0, indexing="ij"), -1
    ).reshape(-1, 2)
    if not _boundary_gapped(m_ref, nocc, kg):
        pytest.skip("degenerate occupied/empty boundary (subspace ambiguous)")
    with redirect_stdout(io.StringIO()):
        wr = ref.wf_array(m_ref, [6, 7]); wr.solve_on_grid([0.0, 0.0])
        wt = ptt.wf_array(m_tpu, [6, 7]); wt.solve_on_grid([0.0, 0.0])
    if not _links_ok(wr, nocc):
        pytest.skip("random draw has a singular link (result undefined)")
    for d in (0, 1):
        pr = np.asarray(wr.berry_phase(occ, d, contin=True))
        pt = np.asarray(wt.berry_phase(occ, d, contin=True))
        assert _wrapped_close(pr, pt)
        dd = pr - pt
        np.testing.assert_allclose(dd, dd.flat[0], atol=1e-8)


@pytest.mark.parametrize("seed", [9309, 9342, 9372, 9425, 9513])
def test_random_ribbon_hwf_matches_reference(seed, ref):
    """Hybrid Wannier centers along the finite direction of a random
    ribbon, in both 'orbital' and 'bloch' bases."""
    with redirect_stdout(io.StringIO()):
        m_ref, _ = _build_random(ref, seed, force_2d=True)
        m_tpu, _ = _build_random(ptt, seed, force_2d=True)
        rb_ref = m_ref.cut_piece(3, 1, glue_edgs=False)
        rb_tpu = m_tpu.cut_piece(3, 1, glue_edgs=False)
    nocc = max(1, rb_ref._nsta // 2)
    kpts = np.linspace(0, 1, 6, endpoint=False)[:, None]
    e_ref, v_ref = rb_ref.solve_all(kpts, eig_vectors=True)
    e_tpu, v_tpu = rb_tpu.solve_all(kpts, eig_vectors=True)
    np.testing.assert_allclose(e_ref, e_tpu, atol=1e-9)
    if e_ref[nocc, 3] - e_ref[nocc - 1, 3] < 1e-6:
        pytest.skip("degenerate occupied/empty boundary (subspace ambiguous)")
    for basis in ("orbital", "bloch"):
        h_ref = np.sort(rb_ref.position_hwf(v_ref[:nocc, 3], 1, basis=basis))
        h_tpu = np.sort(rb_tpu.position_hwf(v_tpu[:nocc, 3], 1, basis=basis))
        np.testing.assert_allclose(h_ref, h_tpu, atol=1e-8)


def _build_random_3d(mod, seed):
    rng = np.random.RandomState(seed)
    norb = rng.randint(2, 4)
    lat = np.eye(3) + 0.1 * rng.randn(3, 3)
    orb = rng.rand(norb, 3)
    with redirect_stdout(io.StringIO()):
        m = mod.tb_model(3, 3, lat, orb)
        m.set_onsite(list(rng.randn(norb)))
        for _ in range(rng.randint(3, 7)):
            i, j = rng.randint(norb), rng.randint(norb)
            R = rng.randint(-1, 2, 3)
            if i == j and np.all(R == 0):
                continue
            try:
                m.set_hop(rng.randn() + 1j * rng.randn(), i, j, list(R), mode="add")
            except Exception:
                pass
    return m


@pytest.mark.parametrize("seed", [9805, 9833, 9890, 9907, 10052])
def test_random_3d_flux_matches_reference(seed, ref):
    """berry_flux over every plane of random 3-D models, plus the
    individual plaquette phases and a cross-sheet Berry phase."""
    m_ref = _build_random_3d(ref, seed)
    m_tpu = _build_random_3d(ptt, seed)
    nocc = max(1, m_ref._nsta // 2)
    occ = list(range(nocc))
    ax = [np.arange(n) / (n - 1.0) for n in (4, 5, 3)]
    kg = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    if not _boundary_gapped(m_ref, nocc, kg):
        pytest.skip("degenerate occupied/empty boundary (subspace ambiguous)")
    with redirect_stdout(io.StringIO()):
        wr = ref.wf_array(m_ref, [4, 5, 3]); wr.solve_on_grid([0.0, 0.0, 0.0])
        wt = ptt.wf_array(m_tpu, [4, 5, 3]); wt.solve_on_grid([0.0, 0.0, 0.0])
    if not _links_ok(wr, nocc):
        pytest.skip("random draw has a singular link (result undefined)")
    for plane in ((0, 1), (1, 2), (0, 2), (2, 0)):
        np.testing.assert_allclose(
            np.asarray(wr.berry_flux(occ, plane)),
            np.asarray(wt.berry_flux(occ, plane)), atol=1e-8,
        )
    np.testing.assert_allclose(
        np.asarray(wr.berry_flux(occ, (0, 1), individual_phases=True)),
        np.asarray(wt.berry_flux(occ, (0, 1), individual_phases=True)),
        atol=1e-8,
    )
    assert _wrapped_close(
        wr.berry_phase(occ, 2, contin=False), wt.berry_phase(occ, 2, contin=False)
    )
