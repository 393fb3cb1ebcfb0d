"""Lattice dynamics (phonon.force_model and friends).

Oracles:

* analytic diatomic chain dispersion at machine precision;
* acoustic sum rule: dim_r exact zero modes at Gamma for any spring
  network, omega ~ c|k| with the analytic monatomic sound speed;
* the torus identity: the spectrum of the glued L-cell cluster equals
  the union of omega(k) over the nk = L grid (machine precision on
  omega^2);
* a light isotope defect binds a localized mode above the optical
  band (dynamical_cluster mass override);
* heat capacity: Dulong-Petit mode count at high T, Debye T^2 scaling
  on a 2-D lattice;
* RTA thermal conductivity against the closed-form 1-D chain integral
  (same grid, analytic dispersion/velocities: agreement ~1e-10);
* instability detection (negative springs raise).
"""

import numpy as np
import pytest

from pythtb_tpu import phonon
from pythtb_tpu.model import PythtbError
from pythtb_tpu.parallel import mesh as pmesh


def _diatomic(ks=1.0, m1=1.0, m2=3.0):
    fm = phonon.force_model([[1.0]], [[0.0], [0.5]], masses=[m1, m2])
    fm.set_spring(ks, 0, 1, [0])
    fm.set_spring(ks, 1, 0, [1])
    return fm


def _triangular(kl=1.0, kt=0.2):
    fm = phonon.force_model([[1.0, 0.0], [0.5, np.sqrt(3) / 2]], [[0, 0]])
    for R in ([1, 0], [0, 1], [-1, 1]):
        fm.set_spring(kl, 0, 0, R, kt=kt)
    return fm


def test_diatomic_chain_analytic():
    ks, m1, m2 = 1.3, 1.0, 2.5
    fm = _diatomic(ks, m1, m2)
    kred = np.linspace(0.0, 0.5, 7)[:, None]
    w = phonon.bands(fm, kred)
    mu = 1.0 / m1 + 1.0 / m2
    disc = np.sqrt(mu ** 2 - 4.0 * np.sin(np.pi * kred[:, 0]) ** 2
                   / (m1 * m2))
    np.testing.assert_allclose(w[:, 0], np.sqrt(ks * (mu - disc)),
                               atol=1e-12)
    np.testing.assert_allclose(w[:, 1], np.sqrt(ks * (mu + disc)),
                               atol=1e-12)


def test_acoustic_sum_rule_and_sound_speed():
    fm = _triangular()
    w0 = phonon.bands(fm, [[0.0, 0.0]])[0]
    assert np.abs(w0).max() < 1e-7  # both Gamma modes exactly acoustic
    # monatomic 1-D chain: omega = 2 sqrt(ks/m) |sin(pi k)| -> sound
    # speed c = domega/dk_cart = sqrt(ks/m) at k -> 0 (a = 1)
    ch = phonon.force_model([[1.0]], [[0.0]], masses=4.0)
    ch.set_spring(9.0, 0, 0, [1])
    h = 1e-5
    w = phonon.bands(ch, [[h]])[0, 0]
    assert abs(w / (2 * np.pi * h) - np.sqrt(9.0 / 4.0)) < 1e-4


def test_torus_identity():
    fm = _diatomic(1.0, 1.0, 3.0)
    H, wc = phonon.dynamical_cluster(fm, 5)
    wg = np.sort(phonon.bands(fm, np.arange(5)[:, None] / 5.0).ravel())
    np.testing.assert_allclose(np.sort(wc) ** 2, wg ** 2, atol=1e-12)
    # 2-D version
    fm2 = _triangular()
    H2, wc2 = phonon.dynamical_cluster(fm2, (3, 4))
    k1, k2 = np.meshgrid(np.arange(3) / 3.0, np.arange(4) / 4.0,
                         indexing="ij")
    kg = np.stack([k1.ravel(), k2.ravel()], axis=-1)
    wg2 = np.sort(phonon.bands(fm2, kg).ravel())
    np.testing.assert_allclose(np.sort(wc2) ** 2, wg2 ** 2, atol=1e-12)


def test_isotope_local_mode():
    fm = _diatomic(1.0, 1.0, 3.0)
    masses = np.tile([1.0, 3.0], 8)
    masses[6] = 0.4  # one light substitution
    _, wc = phonon.dynamical_cluster(fm, 8, masses=masses)
    band_top = phonon.bands(fm, np.arange(64)[:, None] / 64.0).max()
    assert wc.max() > band_top + 0.3  # split-off localized mode
    # heavy substitution: no mode above the band
    masses[6] = 10.0
    _, wc2 = phonon.dynamical_cluster(fm, 8, masses=masses)
    assert wc2.max() < band_top + 1e-8


def test_heat_capacity_limits():
    fm = _triangular()
    C = phonon.heat_capacity(fm, [0.04, 0.08, 200.0], 96)
    assert abs(C[2] - 2.0) < 1e-3  # Dulong-Petit: 2 modes
    assert abs(C[1] / C[0] - 4.0) < 0.1  # Debye T^2 in 2-D


def test_thermal_conductivity_chain_analytic():
    ks, m, kt_temp, tau = 1.3, 1.0, 0.3, 2.0
    ch = phonon.force_model([[1.0]], [[0.0]], masses=m)
    ch.set_spring(ks, 0, 0, [1])
    kap = phonon.thermal_conductivity(ch, [kt_temp], 512, tau=tau)
    kk = (np.arange(512) + 0.5) / 512.0
    om = 2.0 * np.sqrt(ks / m) * np.abs(np.sin(np.pi * kk))
    v = np.sqrt(ks / m) * np.cos(np.pi * kk) * np.sign(np.sin(np.pi * kk))
    x = om / kt_temp
    cv = (x / (2.0 * np.sinh(x / 2.0))) ** 2
    kan = tau * np.mean(cv * v * v)
    assert abs(kap[0, 0, 0] - kan) < 1e-9


def test_kappa_isotropy_triangular():
    fm = _triangular()
    kap = phonon.thermal_conductivity(fm, [0.5], 96)[0]
    # C6: isotropic conductivity (grid anisotropy ~1/nk^2)
    assert abs(kap[0, 0] - kap[1, 1]) < 0.01 * kap[0, 0]
    assert abs(kap[0, 1]) < 0.01 * kap[0, 0]


def test_instability_raises():
    ch = phonon.force_model([[1.0]], [[0.0]])
    ch.set_spring(-1.0, 0, 0, [1])  # repulsive: unstable chain
    with pytest.raises(PythtbError, match="stable"):
        phonon.bands(ch, [[0.25]])


def test_pinning_gaps_acoustic():
    fm = _triangular()
    fm.set_pin(0.5)
    w0 = phonon.bands(fm, [[0.0, 0.0]])[0]
    np.testing.assert_allclose(w0, np.sqrt(0.5), atol=1e-10)


def test_fc_raw_blocks_match_spring():
    # set_fc with the explicit Born block reproduces set_spring
    fm1 = _triangular(1.0, 0.2)
    fm2 = phonon.force_model([[1.0, 0.0], [0.5, np.sqrt(3) / 2]], [[0, 0]])
    lat = np.array([[1.0, 0.0], [0.5, np.sqrt(3) / 2]])
    for R in ([1, 0], [0, 1], [-1, 1]):
        dvec = np.asarray(R, float) @ lat
        n = dvec / np.linalg.norm(dvec)
        P = -(1.0 * np.outer(n, n) + 0.2 * (np.eye(2) - np.outer(n, n)))
        fm2.set_fc(P, 0, 0, R)
    k = [[0.21, 0.37]]
    np.testing.assert_allclose(phonon.bands(fm1, k), phonon.bands(fm2, k),
                               atol=1e-13)


def test_mesh_sharded_kgrid():
    fm = _triangular()
    base = phonon.thermal_conductivity(fm, [0.3, 0.6], 32)
    with pmesh.use_mesh(pmesh.auto_mesh()):
        shard = phonon.thermal_conductivity(fm, [0.3, 0.6], 32)
    np.testing.assert_allclose(base, shard, atol=1e-12)
    kg = np.linspace(0, 1, 16, endpoint=False)[:, None] * [1, 0]
    wb = phonon.bands(fm, kg)
    with pmesh.use_mesh(pmesh.auto_mesh()):
        ws = phonon.bands(fm, kg)
    np.testing.assert_allclose(wb, ws, atol=1e-12)


def test_guards():
    with pytest.raises(PythtbError):
        phonon.force_model([[1.0]], [[0.0]], masses=-1.0)
    fm = _diatomic()
    with pytest.raises(PythtbError):
        fm.set_fc(1.0, 0, 0, [0])  # self block is ASR-determined
    with pytest.raises(PythtbError):
        fm.set_spring(1.0, 0, 5, [0])
    with pytest.raises(PythtbError):
        phonon.heat_capacity(fm, [-1.0], 8)
    with pytest.raises(PythtbError):
        phonon.dynamical_cluster(fm, 4, masses=np.ones(3))
    with pytest.raises(PythtbError):
        phonon.bands(fm, [[0.1, 0.2]])  # wrong k dimension
