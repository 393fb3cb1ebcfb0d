"""Oracles for the moire builder (models/moire.py).

- decoupled folding: with interlayer hops off, the moire spectrum at
  ANY supercell k must equal the band-folded union of the same
  Slater-Koster monolayer over the exact commensurate k-sets of the two
  rotated layers (pure geometry + tiling check; independent of the
  supercell machinery);
- symmetry: time reversal E(k) = E(-k) and C3 (the moire cell closes
  under 120-degree rotation) on the coupled model;
- physics: Dirac-velocity renormalization -- the hallmark of twisted
  bilayers -- monotonically increasing suppression as the twist angle
  shrinks, against the sk_graphene monolayer baseline;
- construction invariants: orbital counts 4(3m^2+3m+1), commensuration
  identity, Hermitian builder tables (implicitly via solve).
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError
from pythtb_tpu.models import moire


def _folded_kset(M, K):
    """The det(M) monolayer k-points that fold onto supercell momentum
    K: k = M^{-1}(K + n) mod 1 over the distinct residues n."""
    Nc = int(round(abs(np.linalg.det(M))))
    Minv = np.linalg.inv(M)
    res = []
    r = abs(M).max() + 2
    for p in range(-r, r + 1):
        for q in range(-r, r + 1):
            k = Minv @ np.array([p, q], dtype=float)
            k -= np.floor(k + 1e-9)
            res.append(np.round(k * Nc).astype(int) % Nc)
    res = np.unique(np.array(res), axis=0)
    assert len(res) == Nc
    ks = res / float(Nc) + (Minv @ np.asarray(K, dtype=float))[None, :]
    return ks - np.floor(ks)


@pytest.mark.parametrize("K", [[0.0, 0.0], [0.2, 0.37], [1 / 3.0, 1 / 3.0]])
def test_decoupled_folding_oracle(K):
    m = 2
    t0 = moire.tbg(m, interlayer=False)
    ev = np.sort(t0.solve_all(np.array([K]))[:, 0])
    g = moire.sk_graphene()
    M1 = np.array([[m, m + 1], [-(m + 1), 2 * m + 1]])
    M2 = np.array([[m + 1, m], [-m, 2 * m + 1]])
    ref = np.sort(np.concatenate(
        [g.solve_all(_folded_kset(M, K)).ravel() for M in (M1, M2)]
    ))
    assert ev.shape == ref.shape
    np.testing.assert_allclose(ev, ref, atol=1e-10)


def test_counts_and_angles():
    assert abs(moire.tbg_angle(1) - 21.7868) < 1e-3
    assert abs(moire.tbg_angle(30) - 1.0845) < 1e-3
    for m in (1, 3):
        t = moire.tbg(m)
        assert t._norb == 4 * (3 * m * m + 3 * m + 1)
    with pytest.raises(PythtbError):
        moire.tbg_angle(0)
    with pytest.raises(PythtbError):
        moire.tbg(2, cutoff=1.0)


def test_symmetries():
    t = moire.tbg(2)
    ks = np.array([[0.13, 0.27], [0.41, 0.08]])
    e_p = np.sort(t.solve_all(ks).T, axis=-1)
    e_m = np.sort(t.solve_all(-ks).T, axis=-1)
    np.testing.assert_allclose(e_p, e_m, atol=1e-12)  # time reversal
    # C3: in reduced coordinates of the moire hexagonal cell the
    # rotation acts as (k1, k2) -> (k2 - k1... ) -- same matrix as the
    # monolayer honeycomb: k -> (-k2, k1 - k2)
    ks3 = np.stack([-ks[:, 1], ks[:, 0] - ks[:, 1]], axis=-1)
    e_3 = np.sort(t.solve_all(ks3).T, axis=-1)
    np.testing.assert_allclose(e_p, e_3, atol=1e-9)


def _dirac_velocity(model, Kfrac, E_D, dk=2e-3):
    """Cone slope at a Dirac point: track the upper of the two states
    nearest the Dirac energy at two offsets (cancels E_D and survives
    the particle-hole asymmetry of the 2nd/3rd-neighbor hops)."""
    lat2d = np.asarray(model._lat)[:2, :2]
    # Cartesian step of length dk along x: dfrac = lat2d @ [dk,0]/(2pi)
    dfrac = lat2d @ np.array([dk, 0.0]) / (2.0 * np.pi)

    def upper(kf):
        e = np.sort(model.solve_all(np.array([kf]))[:, 0])
        i = np.argsort(np.abs(e - E_D))[:2]
        return e[i].max()

    return (upper(np.asarray(Kfrac) + 2.0 * dfrac)
            - upper(np.asarray(Kfrac) + dfrac)) / dk


def test_dirac_velocity_renormalization():
    """Twist-angle velocity renormalization -- the hallmark of twisted
    bilayers (Lopes dos Santos et al.: v/v0 = (1 - 3 a^2)/(1 + 6 a^2),
    a = w/(v0 k_theta)): weak at 21.8 deg, ~25% suppression by
    3.89 deg.  The monolayer valley K = (2/3, 1/3) folds onto the
    moire point (1/3, 2/3) for layer 1 (M1 @ K mod 1 -- m-independent),
    which is where the cone must sit.  Monolayer baseline uses the
    SAME Slater-Koster hops."""
    g = moire.sk_graphene()
    eK = g.solve_all(np.array([[2.0 / 3.0, 1.0 / 3.0]]))[:, 0]
    assert abs(eK[0] - eK[1]) < 1e-10  # Dirac degeneracy
    E_D = float(eK.mean())
    v_mono = _dirac_velocity(g, [2.0 / 3.0, 1.0 / 3.0], E_D)
    assert v_mono > 4.0  # ~ (3/2) |t| a0 = 5.75 eV A for NN alone
    Km = [1.0 / 3.0, 2.0 / 3.0]
    ratios = {m: _dirac_velocity(moire.tbg(m), Km, E_D) / v_mono
              for m in (1, 3, 8)}
    assert ratios[1] > 0.95  # 21.8 deg: nearly unrenormalized
    assert ratios[3] < ratios[1]
    assert ratios[8] < ratios[3]
    assert 0.68 < ratios[8] < 0.82  # LDS value ~ 0.75 at 3.89 deg


@pytest.mark.slow
def test_folded_dirac_winding_via_wilson_window():
    """Composition: the spectrum-slice Wilson loop resolves the Berry
    winding of the folded Dirac cones at the moire K point.  The two
    valence cone states there carry OPPOSITE windings (K and K' layer
    characters fold together), so the pair's Wilson eigenphases are
    exactly +-pi while the total phase vanishes."""
    from pythtb_tpu import flows

    g = moire.sk_graphene()
    E_D = float(np.mean(g.solve_all(np.array([[2 / 3, 1 / 3]]))[:, 0]))
    t2 = moire.tbg(2)
    Km = np.array([1 / 3, 2 / 3])
    th = np.linspace(0, 2 * np.pi, 9)
    loop = Km[None, :] + 0.06 * np.stack([np.cos(th), np.sin(th)], -1)
    loop[-1] = loop[0]
    evs = flows.wilson_window(t2, E_D - 0.21, 2, loop, block=6, seed=0,
                              berry_evals=True)
    np.testing.assert_allclose(np.abs(evs), np.pi, atol=1e-3)
    total = flows.wilson_window(t2, E_D - 0.21, 2, loop, block=6, seed=0)
    assert abs(total) < 1e-3
