"""Quasicrystal / quasiperiodic model generators (models/quasicrystal.py).

Beyond-reference capability (the reference at /root/reference/pythtb.py
builds periodic crystals only).  Oracle tiers:

* exact-geometry oracles on the de Bruijn multigrid tilings: every
  rhombus edge has exactly unit length, the tile-shape sets are the
  literature ones (36/72 deg Penrose, 45 deg + square Ammann-Beenker),
  fat/thin counts approach the golden ratio, coordinations stay in
  3..7, and integer de Bruijn indexing reproduces the vertex positions
  exactly (position = index @ star);
* exact-spectral oracles: bipartite particle-hole symmetry on the
  vertex models (machine precision), the famous macroscopically
  degenerate E = 0 confined states on Penrose, and the EXACT finite-
  ring Aubry duality spec(lam) = (lam/2) spec(4 t^2/lam) at
  beta = F_{m-1}/F_m, L = F_m (both t-sign conventions);
* physics oracles: the localization transition at lam = 2|t| via IPR;
* composition: the generated models are plain finite tb_models, so the
  matrix-free engines (flows.solve_lowest) agree with dense solve_all.
"""

import numpy as np
import pytest

from pythtb_tpu import flows
from pythtb_tpu.models import quasicrystal as qc


# ---------------------------------------------------------------- tilings

@pytest.fixture(scope="module")
def penrose_tiling():
    return qc.penrose(6.0, return_tiling=True)


@pytest.fixture(scope="module")
def ab_tiling():
    return qc.ammann_beenker(6.0, return_tiling=True)


def _edge_lengths(til):
    pos, edges = til["verts"], til["edges"]
    return np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]], axis=1)


def _tile_angles_deg(til):
    pos, tiles = til["verts"], til["tiles"]
    v1 = pos[tiles[:, 1]] - pos[tiles[:, 0]]
    v2 = pos[tiles[:, 3]] - pos[tiles[:, 0]]
    c = np.abs((v1 * v2).sum(axis=1))
    c /= np.linalg.norm(v1, axis=1) * np.linalg.norm(v2, axis=1)
    return np.degrees(np.arccos(np.clip(c, 0.0, 1.0)))


def test_penrose_geometry_exact(penrose_tiling):
    m, til = penrose_tiling
    d = _edge_lengths(til)
    np.testing.assert_allclose(d, 1.0, atol=1e-10)
    ang = np.unique(np.round(_tile_angles_deg(til), 6))
    # P3 rhombi: fat (72/108) and thin (36/144); acute angles 72 and 36
    np.testing.assert_allclose(ang, [36.0, 72.0], atol=1e-6)
    # integer de Bruijn indexing is exact: position == index @ star
    np.testing.assert_allclose(
        til["index"].astype(float) @ til["star"], til["verts"], atol=1e-12)


def test_ammann_beenker_geometry_exact(ab_tiling):
    m, til = ab_tiling
    np.testing.assert_allclose(_edge_lengths(til), 1.0, atol=1e-10)
    ang = np.unique(np.round(_tile_angles_deg(til), 6))
    np.testing.assert_allclose(ang, [45.0, 90.0], atol=1e-6)


def test_penrose_fat_thin_golden_ratio():
    # fat:thin tile count -> golden ratio as the patch grows
    _, til = qc.penrose(11.0, return_tiling=True)
    ang = _tile_angles_deg(til)
    fat = int((ang > 50.0).sum())
    thin = int((ang <= 50.0).sum())
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    assert abs(fat / thin - phi) < 0.12


def test_vertex_coordination_bounds(penrose_tiling, ab_tiling):
    for _, til in (penrose_tiling, ab_tiling):
        nv = len(til["verts"])
        deg = np.bincount(til["edges"].reshape(-1), minlength=nv)
        # interior Penrose/AB coordinations are 3..7/3..8; boundary
        # vertices can drop to 2
        assert deg.min() >= 2
        assert deg.max() <= 8


def test_no_duplicate_vertices(penrose_tiling):
    _, til = penrose_tiling
    pos = til["verts"]
    d2 = ((pos[None, :, :] - pos[:, None, :]) ** 2).sum(-1)
    d2 += np.eye(len(pos)) * 10.0
    # distinct integer indices => distinct positions, well separated
    assert d2.min() > 0.1


# ----------------------------------------------------- vertex-model physics

def test_penrose_bipartite_and_confined_states(penrose_tiling):
    m, _ = penrose_tiling
    ev = np.sort(m.solve_all())
    # rhombus tilings are bipartite: spectrum exactly ph-symmetric
    np.testing.assert_allclose(ev + ev[::-1], 0.0, atol=1e-12)
    # macroscopically degenerate strictly-localized E = 0 band
    frac0 = (np.abs(ev) < 1e-8).sum() / len(ev)
    assert frac0 > 0.03


def test_ammann_beenker_bipartite(ab_tiling):
    m, _ = ab_tiling
    ev = np.sort(m.solve_all())
    np.testing.assert_allclose(ev + ev[::-1], 0.0, atol=1e-12)


def test_penrose_solve_lowest_matches_dense(penrose_tiling):
    m, _ = penrose_tiling
    dense = np.sort(m.solve_all())[:4]
    res = flows.solve_lowest(m, 4)
    lo = np.sort(np.asarray(res[0] if isinstance(res, tuple) else res))
    np.testing.assert_allclose(lo, dense, atol=1e-6)


# ------------------------------------------------------------- Aubry-Andre

def test_aubry_duality_exact_positive_t():
    L, lam = 89, 1.3
    ea = np.sort(qc.aubry_andre(L, lam, t=1.0).solve_all())
    eb = np.sort(qc.aubry_andre(L, 4.0 / lam, t=1.0).solve_all())
    np.testing.assert_allclose(ea, (lam / 2.0) * eb, atol=1e-12)


def test_aubry_duality_exact_negative_t():
    # t < 0: the dual onsite amplitude is negative; -cos is not a ring
    # translation of cos for odd L, so the dual spectrum comes back
    # negated (order-reversed)
    L, lam = 89, 2.7
    ea = np.sort(qc.aubry_andre(L, lam, t=-1.0).solve_all())
    eb = np.sort(qc.aubry_andre(L, 4.0 / lam, t=-1.0).solve_all())
    np.testing.assert_allclose(ea, -(lam / 2.0) * eb[::-1], atol=1e-12)


def test_aubry_localization_transition():
    iprs = {}
    for lam in (0.5, 3.5):
        ev, vec = qc.aubry_andre(233, lam, t=1.0).solve_all(
            eig_vectors=True)
        iprs[lam] = float((np.abs(vec) ** 4).sum(axis=-1).mean())
    # extended phase: IPR ~ 1/L; localized phase: O(1)
    assert iprs[0.5] < 0.02
    assert iprs[3.5] > 0.2
    assert iprs[3.5] / iprs[0.5] > 20.0


def test_aubry_irrational_beta_accepted():
    beta = (np.sqrt(5.0) - 1.0) / 2.0
    m = qc.aubry_andre(55, 1.0, beta=beta, phi=0.3)
    ev = m.solve_all()
    assert len(ev) == 55
    assert np.all(np.isfinite(ev))


def test_aubry_validation():
    with pytest.raises(Exception):
        qc.aubry_andre(2, 1.0)


# --------------------------------------------------------- Fibonacci chain

def test_fibonacci_word_lengths_and_counts():
    # |w_n| = F_{n+2}; #A/#B -> golden ratio
    fib = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144]
    for n in range(8):
        w = qc.fibonacci_word(n)
        assert len(w) == fib[n + 1]
    w = qc.fibonacci_word(10)
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    assert abs(w.count("A") / w.count("B") - phi) < 0.01


def test_fibonacci_chain_ph_symmetric():
    ev = np.sort(qc.fibonacci_chain(9).solve_all())
    np.testing.assert_allclose(ev + ev[::-1], 0.0, atol=1e-12)


def test_fibonacci_chain_trifurcating_gaps():
    # the Fibonacci spectrum is a Cantor set: the main gaps at the
    # 1/phi and 1/phi^2 filling fractions (gap-labeling theorem) are
    # open and much larger than the typical level spacing
    ev = np.sort(qc.fibonacci_chain(10, ta=-1.0, tb=-0.5).solve_all())
    L = len(ev)
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    gaps = np.diff(ev)
    med = np.median(gaps)
    for frac in (1.0 / phi, 1.0 / phi ** 2):
        i = int(round(frac * L))
        gap_here = gaps[i - 2: i + 2].max()
        assert gap_here > 20.0 * med


def test_vertex_areas_tessellate(penrose_tiling):
    _, til = penrose_tiling
    owned = qc.vertex_areas(til)
    pos, tiles = til["verts"], til["tiles"]
    v1 = pos[tiles[:, 1]] - pos[tiles[:, 0]]
    v2 = pos[tiles[:, 3]] - pos[tiles[:, 0]]
    total = np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]).sum()
    # quarter-tile shares tessellate: sum(owned) == total tile area
    np.testing.assert_allclose(owned.sum(), total, rtol=1e-12)
    assert owned.min() > 0.0


@pytest.mark.slow
def test_penrose_chern_insulator_marker():
    """Quasicrystalline Chern insulator: a uniform field on the
    Penrose vertex model opens Landau gaps whose bulk is topological.
    The Bianco-Resta marker summed over a bulk disk and divided by the
    exact tile-share area of the same vertices quantizes to +1 -- a
    composition (quasicrystal x magnetic.peierls_model x
    realspace.chern_marker) no k-space method can reach."""
    from pythtb_tpu import magnetic, realspace

    m, til = qc.penrose(12.0, return_tiling=True)
    pos = til["verts"]
    r = np.linalg.norm(pos, axis=1)
    owned = qc.vertex_areas(til)
    N = len(pos)
    for phi, c_expect in [(0.1, 1.0), (0.2, 1.0)]:
        mb = magnetic.peierls_model(m, phi, dirs=(0, 1))
        ev = np.sort(mb.solve_all())
        # Landau-gap filling ~ phi * (patch area) states below
        target = int(round(phi * N * 0.8123))
        gaps = np.diff(ev)
        i0 = target - 5 + int(np.argmax(gaps[target - 5: target + 5]))
        assert gaps[i0] > 0.05  # a real spectral gap
        c = realspace.chern_marker(mb, nocc=i0 + 1)
        bulk = r < 5.0
        c_est = c[bulk].sum() / owned[bulk].sum()
        assert abs(c_est - c_expect) < 0.02


def test_multigrid_validation():
    with pytest.raises(Exception):
        qc.multigrid_tiling(3, 5.0)
    with pytest.raises(Exception):
        qc.multigrid_tiling(5, 5.0, offsets=[0.1, 0.2])
