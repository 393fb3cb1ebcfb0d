"""Edelstein (inverse spin-galvanic) oracle tier.

The load-bearing oracle is differential: at T -> 0 the RTA
Fermi-window grid sum must equal the Fermi-surface LINE INTEGRAL

``alpha_ab = q tau / (2 pi)^2 sum_orbits oint dl s_a(k) v_b(k)/|v(k)|``

built from completely independent machinery (marching-squares contours
from :mod:`pythtb_tpu.fermisurface`, eigenvectors re-solved at the
contour points, Cartesian arclength).  Symmetry oracles: exact zero
under inversion, C4 Rashba antisymmetry, linear SOC scaling.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, boltzmann, fermisurface as fs

_SX = np.array([[0, 1], [1, 0]], dtype=complex) / 2
_SY = np.array([[0, -1j], [1j, 0]], dtype=complex) / 2
_SZ = np.array([[1, 0], [0, -1]], dtype=complex) / 2


def _rashba(t=1.0, lam=0.3):
    """Square-lattice Rashba model: H(k) = -2t(cos kx + cos ky) I
    + 2 lam (sin kx sigma_y - sin ky sigma_x)."""
    m = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]],
                     nspin=2)
    m.set_hop(-t * np.eye(2) - 1j * lam * 2 * _SY, 0, 0, [1, 0])
    m.set_hop(-t * np.eye(2) + 1j * lam * 2 * _SX, 0, 0, [0, 1])
    return m


def test_inversion_symmetric_zero():
    """No SOC: every component of alpha vanishes identically."""
    m = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]], nspin=2)
    m.set_hop(-1.0, 0, 0, [1, 0])
    m.set_hop(-1.0, 0, 0, [0, 1])
    a = boltzmann.edelstein(m, [-2.0, 0.5], 0.1, 64)
    np.testing.assert_allclose(a, 0.0, atol=1e-12)


def test_rashba_c4_structure():
    """C4 Rashba: alpha_xy = -alpha_yx nonzero; diagonal in-plane and
    every s_z component vanish."""
    m = _rashba(lam=0.3)
    a = boltzmann.edelstein(m, [-2.5], 0.05, 128)[0]
    assert abs(a[1, 0]) > 1e-3
    np.testing.assert_allclose(a[0, 1], -a[1, 0], atol=1e-10)
    np.testing.assert_allclose(a[0, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(a[1, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(a[2], 0.0, atol=1e-10)


def test_rashba_linear_in_soc():
    a1 = boltzmann.edelstein(_rashba(lam=0.02), [-2.5], 0.05, 128)[0]
    a2 = boltzmann.edelstein(_rashba(lam=0.04), [-2.5], 0.05, 128)[0]
    np.testing.assert_allclose(a2[1, 0] / a1[1, 0], 2.0, rtol=2e-2)


def _line_integral_alpha(model, ef, nk=401):
    """Independent T=0 Edelstein: FS line integral over marching
    contours; spin expectations from eigenvectors re-solved at the
    contour k-points."""
    lat = np.asarray(model._lat, dtype=float)
    B = 2.0 * np.pi * np.linalg.inv(lat).T  # rows = reciprocal vecs
    conts = fs.fermi_surface(model, ef, nk=nk)
    alpha = np.zeros((3, 2))
    for band, pieces in conts.items():
        for pts, closed in pieces:
            if len(pts) < 3:
                continue
            # midpoints + Cartesian segment lengths
            kc = pts @ B
            seg = np.roll(kc, -1, axis=0) - kc if closed \
                else kc[1:] - kc[:-1]
            mid = (pts + np.roll(pts, -1, axis=0)) / 2.0 if closed \
                else (pts[1:] + pts[:-1]) / 2.0
            dl = np.linalg.norm(seg, axis=1)
            ev, vec = model.solve_all(mid % 1.0, eig_vectors=True)
            v = fs.fermi_velocity(model, mid % 1.0)[:, :, band]
            vabs = np.linalg.norm(v, axis=1)
            # spin expectation of this band at each midpoint
            w = np.asarray(vec)[band]  # (npts, norb, 2) spin axis last
            w2 = w.reshape(len(mid), -1, 2)
            sd = np.stack([
                np.real(np.einsum("por,rs,pos->p", np.conj(w2), S, w2))
                for S in (_SX, _SY, _SZ)])
            alpha += np.einsum("p,xp,pc->xc", dl / vabs, sd, v)
    q = -1.0
    return q * alpha / (2.0 * np.pi) ** 2


@pytest.mark.slow
def test_grid_sum_vs_line_integral():
    """THE differential oracle: Fermi-window grid sum (kT -> 0)
    against the independent marching-contour line integral, both
    Rashba branches crossing E_F."""
    m = _rashba(lam=0.25)
    for ef in (-2.7, -1.0):
        a_grid = boltzmann.edelstein(m, [ef], 0.01, 512)[0]
        a_line = _line_integral_alpha(m, ef, nk=501)
        np.testing.assert_allclose(a_grid[1, 0], a_line[1, 0],
                                   rtol=1.5e-2, atol=1e-5)
        np.testing.assert_allclose(a_grid[0, 1], a_line[0, 1],
                                   rtol=1.5e-2, atol=1e-5)


def test_error_paths():
    sq = ptt.tb_model(2, 2, np.eye(2), [[0.0, 0.0]])
    sq.set_hop(-1.0, 0, 0, [1, 0])
    sq.set_hop(-1.0, 0, 0, [0, 1])
    with pytest.raises(PythtbError, match="nspin == 2"):
        boltzmann.edelstein(sq, [0.0], 0.1, 32)
    m = _rashba()
    with pytest.raises(PythtbError, match="temperature"):
        boltzmann.edelstein(m, [0.0], -1.0, 32)
