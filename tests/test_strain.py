"""Strain engineering oracles (models.apply_strain /
triaxial_graphene_flake): pseudo-magnetic Landau physics.

- sqrt(n) law: the triaxially strained flake's LDOS shows Landau
  levels with E_2 / E_1 = sqrt(2) (the relativistic LL fingerprint);
- field scaling: E_1 grows like sqrt(strain);
- the n = 0 level is sublattice-polarized while TIME REVERSAL stays
  unbroken (all strained hops remain real) -- the defining contrast
  with a real magnetic field;
- apply_strain: identity at zero displacement, guards.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, realspace
from pythtb_tpu.models import apply_strain, triaxial_graphene_flake


def _center_sites(flake):
    pos = np.asarray(flake._orb) @ np.asarray(flake._lat)
    xy = pos - pos.mean(axis=0)
    r2 = np.sum(xy**2, axis=1)
    # nearest site of each sublattice (builder interleaves A/B as
    # orbital parity of the index)
    iA = int(min(np.where(np.arange(len(r2)) % 2 == 0)[0],
                 key=lambda i: r2[i]))
    iB = int(min(np.where(np.arange(len(r2)) % 2 == 1)[0],
                 key=lambda i: r2[i]))
    return iA, iB


def _peaks(e, y, prominence):
    from scipy.signal import find_peaks

    pk, _ = find_peaks(y, prominence=prominence)
    return e[pk]


def test_pseudo_landau_sqrt_n_and_sublattice_zero_mode():
    fl = triaxial_graphene_flake(36, 0.004)
    # TRS stays unbroken: every strained hop is real
    assert max(abs(complex(h[0]).imag) for h in fl._hoppings) == 0.0
    iA, iB = _center_sites(fl)
    e, ld = realspace.kpm_ldos(fl, [iA, iB], num_moments=2048,
                               n_energies=2001)
    w = np.abs(e) < 2.0
    both = ld[0][w] + ld[1][w]
    epk = np.sort(_peaks(e[w], both, 0.02))
    pos = epk[epk > 0.05][:2]
    assert len(pos) >= 2
    assert abs(pos[1] / pos[0] - np.sqrt(2.0)) < 0.04  # E2/E1 = sqrt 2
    # zero mode: present and strongly sublattice-polarized
    i0 = int(np.argmin(np.abs(e)))
    hi = max(ld[0][i0], ld[1][i0])
    lo = min(ld[0][i0], ld[1][i0])
    assert hi > 5.0 * lo
    assert hi > 0.05


def test_field_scaling_sqrt_strain():
    e1 = {}
    for c in (0.002, 0.004):
        fl = triaxial_graphene_flake(36, c)
        iA, iB = _center_sites(fl)
        e, ld = realspace.kpm_ldos(fl, [iA, iB], num_moments=2048,
                                   n_energies=2001)
        w = np.abs(e) < 2.0
        epk = np.sort(_peaks(e[w], ld[0][w] + ld[1][w], 0.02))
        pos = epk[epk > 0.05]
        assert len(pos) >= 1
        e1[c] = pos[0]
    assert abs(e1[0.004] / e1[0.002] - np.sqrt(2.0)) < 0.08


def test_apply_strain_identity_and_guards():
    fl = ptt.models.graphene().cut_piece(4, 0, glue_edgs=False).cut_piece(
        4, 1, glue_edgs=False)
    same = apply_strain(fl, lambda p: np.zeros_like(p), 3.0)
    np.testing.assert_allclose(np.sort(same.solve_all()),
                               np.sort(fl.solve_all()), atol=1e-12)
    with pytest.raises(PythtbError):
        apply_strain(ptt.models.graphene(), lambda p: np.zeros_like(p),
                     3.0)
    with pytest.raises(PythtbError):
        apply_strain(fl, lambda p: np.zeros((3, 2)), 3.0)
    # in_place=False must not mutate the input
    bent = apply_strain(fl, lambda p: 0.01 * p**2, 3.0)
    assert not np.allclose(np.sort(bent.solve_all()),
                           np.sort(fl.solve_all()))
    np.testing.assert_allclose(
        np.sort(fl.solve_all()),
        np.sort(ptt.models.graphene().cut_piece(
            4, 0, glue_edgs=False).cut_piece(
            4, 1, glue_edgs=False).solve_all()), atol=1e-12)


def test_apply_strain_coincident_orbitals():
    """Regression (review): hops between coincident orbitals (BBH
    keeps all four at the origin) must pass through unchanged, not
    NaN out on the 0/0 bond length."""
    fl = ptt.models.bbh(gamma=0.5).cut_piece(3, 0, glue_edgs=False)
    fl = fl.cut_piece(3, 1, glue_edgs=False)
    bent = apply_strain(fl, lambda p: 0.01 * p**2, 3.0)
    ev = np.sort(bent.solve_all())
    assert np.all(np.isfinite(ev))
