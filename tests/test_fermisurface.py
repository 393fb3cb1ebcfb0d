"""Fermi-surface tools oracle tier.

Closed-form oracles: the 1-D chain DOS ``1/(pi sqrt(4t^2-E^2))``, the
2-D parabolic band-bottom plateau ``1/(4 pi |t|)``, graphene's linear
Dirac DOS, the 3-D band-edge ``sqrt(E)`` law, exact state-count
integrals, and parabolic circle areas / cyclotron masses.  Orbit areas
additionally get a measure-counting cross-oracle (the enclosed area is
the k-space measure below E_F, computable by independent machinery:
counting grid points).
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, fermisurface as fs


def _square(t=-1.0):
    m = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    m.set_hop(t, 0, 0, [1, 0])
    m.set_hop(t, 0, 0, [0, 1])
    return m


def test_dos_1d_chain_exact():
    c = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    c.set_hop(-1.0, 0, 0, [1])
    Es = np.linspace(-1.9, 1.9, 9)
    exact = 1.0 / (np.pi * np.sqrt(4.0 - Es ** 2))
    err = [np.max(np.abs(fs.dos_linear(c, Es, nk=nk) / exact - 1.0))
           for nk in (4096, 8192)]
    # the segment method's error envelope is O(1/nk), oscillatory in
    # where E lands within a segment -- check the envelope, not ratios
    assert err[0] < 5e-3
    assert err[1] < 1.5e-3
    assert err[1] < err[0]


def test_dos_2d_square_integral_and_plateau():
    sq = _square()
    Es = np.linspace(-4.5, 4.5, 2001)
    d = fs.dos_linear(sq, Es, nk=128)
    np.testing.assert_allclose(np.trapezoid(d, Es), 1.0, atol=2e-3)
    # parabolic bottom: m = 1/(2|t|) per direction -> DOS = m/(2 pi)
    d0 = fs.dos_linear(sq, np.array([-3.92]), nk=384)[0]
    np.testing.assert_allclose(d0, 1.0 / (4.0 * np.pi), rtol=3e-2)


def test_dos_graphene_dirac_linear():
    g = ptt.models.graphene(t=-1.0)
    d = fs.dos_linear(g, np.array([0.15, 0.3, -0.15, -0.3]), nk=512)
    # linear Dirac DOS: rho(2E)/rho(E) = 2 up to the O(E^2) band
    # correction (measured 2.0499 at |E| = 0.3); particle-hole
    # symmetry of the nn model is EXACT in the method
    np.testing.assert_allclose(d[1] / d[0], 2.0, rtol=3e-2)
    np.testing.assert_allclose(d[2], d[0], rtol=1e-12)
    np.testing.assert_allclose(d[3], d[1], rtol=1e-12)


def test_dos_3d_cubic_sqrt_edge():
    cub = ptt.tb_model(3, 3, np.eye(3), [[0, 0, 0]])
    for d3 in range(3):
        R = [0, 0, 0]
        R[d3] = 1
        cub.set_hop(-1.0, 0, 0, R)
    Es = np.linspace(-6.5, 6.5, 801)
    d = fs.dos_linear(cub, Es, nk=40)
    np.testing.assert_allclose(np.trapezoid(d, Es), 1.0, atol=1e-2)
    # band edge at -6: rho ~ sqrt(E+6)
    lo = fs.dos_linear(cub, np.array([-5.95, -5.8]), nk=64)
    np.testing.assert_allclose(lo[1] / lo[0], np.sqrt(0.2 / 0.05),
                               rtol=7e-2)


def test_dos_spin_doubling():
    sq = _square()
    sq2 = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]],
                       nspin=2)
    sq2.set_hop(-1.0, 0, 0, [1, 0])
    sq2.set_hop(-1.0, 0, 0, [0, 1])
    Es = np.linspace(-4.5, 4.5, 501)
    d1 = fs.dos_linear(sq, Es, nk=96)
    d2 = fs.dos_linear(sq2, Es, nk=96)
    np.testing.assert_allclose(d2, 2.0 * d1, atol=1e-10)


def test_orbit_area_counting_oracle():
    """Shoelace area of the marching contour == k-space measure below
    E_F (independent counting machinery), and both approach the
    parabolic circle near the band bottom."""
    sq = _square()
    for ef in (-3.6, -3.2):
        A = fs.orbit_areas(sq, ef, 0, nk=401)
        assert len(A) == 1
        ev = fs._grid_evals(sq, 501)[:, 0]
        detB = (2 * np.pi) ** 2
        A_count = np.mean(ev < ef) * detB
        np.testing.assert_allclose(A[0], A_count, rtol=1e-2)
    A = fs.orbit_areas(sq, -3.9, 0, nk=401)
    np.testing.assert_allclose(A[0], np.pi * 0.1, rtol=2e-2)


def test_cyclotron_mass_parabolic():
    sq = _square()
    m = fs.cyclotron_mass(sq, -3.9, 0, nk=401)
    np.testing.assert_allclose(m, 0.5, rtol=3e-2)


def test_open_orbits_flagged():
    """Above the van Hove energy the square-lattice FS turns into a
    hole pocket around (1/2,1/2) -- still closed; a 1-D-ish anisotropic
    band makes genuinely open (traversing) orbits."""
    aniso = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    aniso.set_hop(-1.0, 0, 0, [1, 0])
    aniso.set_hop(-0.05, 0, 0, [0, 1])
    conts = fs.fermi_surface(aniso, 0.0, nk=201)[0]
    assert len(conts) > 0
    assert all(not closed for _, closed in conts)
    with pytest.warns(UserWarning, match="open orbit"):
        A = fs.orbit_areas(aniso, 0.0, 0, nk=201)
    assert len(A) == 0
    # hole pocket: closed, and area shrinks toward the band top
    sq = _square()
    Ah1 = fs.orbit_areas(sq, 3.6, 0, nk=401)
    Ah2 = fs.orbit_areas(sq, 3.9, 0, nk=401)
    assert len(Ah1) == 1 and len(Ah2) == 1
    assert Ah2[0] < Ah1[0]
    # hole pocket at the band top: eps = 4 - q^2 -> A = pi (4 - ef)
    np.testing.assert_allclose(Ah2[0], np.pi * 0.1, rtol=2e-2)


def test_fermi_surface_contour_energies():
    """Every contour point actually sits on the iso-energy surface
    (bilinear check: re-solve the model exactly at contour k)."""
    g = ptt.models.graphene(t=-1.0)
    conts = fs.fermi_surface(g, -0.35, nk=301)
    assert 0 in conts and len(conts[0]) >= 2  # two Dirac pockets
    pts = np.vstack([c for c, _ in conts[0]])[::7] % 1.0
    ev = np.asarray(g.solve_all(pts))
    # linear interpolation on a 301-grid: O((pi/301)^2 * curvature)
    assert np.abs(ev[0] - (-0.35)).max() < 2e-3


def test_fermi_velocity_vs_fd():
    g = ptt.models.graphene(t=-1.0)
    kpts = np.array([[0.2, 0.1], [0.4, 0.33]])
    v = fs.fermi_velocity(g, kpts)
    lat = np.array([[1.0, 0.0], [0.5, np.sqrt(3) / 2]])
    h = 1e-5
    for ki, k in enumerate(kpts):
        for a in range(2):
            # Cartesian displacement h e_a -> reduced displacement:
            # k_cart = k_red @ B with B = 2 pi inv(lat)^T, so
            # dred = h e_a @ inv(B) = h lat[:, a] / (2 pi)
            dred = h * lat[:, a] / (2.0 * np.pi)
            ep = np.asarray(g.solve_all([k + dred]))
            em = np.asarray(g.solve_all([k - dred]))
            np.testing.assert_allclose(v[ki, a, :], (ep - em)[:, 0]
                                       / (2 * h), atol=1e-6)


def test_error_paths():
    c = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    c.set_hop(-1.0, 0, 0, [1])
    with pytest.raises(PythtbError, match="dim_k == 2"):
        fs.fermi_surface(c, 0.0)
    sq = _square()
    with pytest.raises(PythtbError, match="out of range"):
        fs.fermi_surface(sq, 0.0, bands=[3])
    fin = sq.cut_piece(3, 0)
    with pytest.raises(PythtbError, match="fully periodic"):
        fs.dos_linear(fin, np.array([0.0]))
