"""RTA Boltzmann transport (boltzmann.transport_coefficients /
transport_distribution).

Oracles:

* Drude-weight identity: L0 == geometry.drude_weight exactly in the
  converged-grid limit (integration by parts on the BZ torus) -- two
  independent code paths (velocity-squared vs band-Hessian sums);
* analytic 1-D chain: sigma/tau = 2 v_F / pi at band center;
* dilute parabolic limit: R_H -> 1/(n q) with the electron/hole sign
  flip (the full semiclassical Hall machinery collapses to the Drude
  result);
* Mott relation and Wiedemann-Franz at low temperature;
* transport_distribution convolved with the Fermi window reproduces
  the L0 of transport_coefficients.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import boltzmann, geometry
from pythtb_tpu.model import PythtbError
from pythtb_tpu.parallel import mesh as pmesh


def test_drude_identity():
    sq = ptt.models.square(t=-1.0)
    for mu in (-1.7, 0.0):
        r = boltzmann.transport_coefficients(sq, [mu], 0.05, 256, tau=1.0)
        D = geometry.drude_weight(sq, mu, nk=(256, 256), temperature=0.05)
        np.testing.assert_allclose(r["sigma"][0], D, rtol=2e-4, atol=1e-9)


def test_chain_analytic_sigma():
    ch = ptt.models.chain(t=-1.0)
    # eps = -2 cos k: at mu = 0 the Fermi velocity is 2, and
    # sigma/tau = spin * v_F / pi = 4 / pi
    r = boltzmann.transport_coefficients(ch, [0.0], 0.02, 1024, tau=1.0)
    assert abs(r["sigma"][0, 0, 0] - 4.0 / np.pi) < 2e-3
    # particle-hole symmetric point: Seebeck vanishes
    assert abs(r["seebeck"][0, 0, 0]) < 1e-10


def test_hall_dilute_limit():
    sq = ptt.models.square(t=-1.0)
    r = boltzmann.transport_coefficients(sq, [-3.8, 3.8], 0.02, 128,
                                         tau=3.0)
    # electron pocket: R_H = 1/(n q) = -1/n
    assert abs(r["hall_coefficient"][0] * r["n"][0] + 1.0) < 5e-3
    # hole pocket: R_H = +1/n_h
    n_h = 2.0 - r["n"][1]
    assert abs(r["hall_coefficient"][1] * n_h - 1.0) < 5e-3
    # tau-independence of R_H
    r2 = boltzmann.transport_coefficients(sq, [-3.8], 0.02, 128, tau=0.7)
    assert abs(r2["hall_coefficient"][0] - r["hall_coefficient"][0]) < 1e-10


def test_mott_relation():
    sq = ptt.models.square(t=-1.0)
    kt = 0.05  # the Fermi window must stay resolved by the 256 grid
    mu0, h = -1.3, 0.04
    r = boltzmann.transport_coefficients(
        sq, [mu0 - h, mu0, mu0 + h], kt, 256, tau=1.0)
    s_xx = r["seebeck"][1, 0, 0]
    dlns = (np.log(r["sigma"][2, 0, 0]) - np.log(r["sigma"][0, 0, 0])) / (2 * h)
    mott = (np.pi ** 2 / 3.0) * kt * dlns / (-1.0)  # q = -1
    assert abs(s_xx - mott) < 0.01 * abs(mott), (s_xx, mott)


def test_wiedemann_franz():
    sq = ptt.models.square(t=-1.0)
    r = boltzmann.transport_coefficients(sq, [-1.7], 0.05, 256, tau=1.0)
    assert abs(r["lorenz"][0] - np.pi ** 2 / 3.0) < 0.02


def test_insulator_nan_guard():
    bn = ptt.models.bn(delta=1.0)  # gapped at half filling
    with pytest.warns(UserWarning, match="sit"):
        r = boltzmann.transport_coefficients(bn, [0.0, -2.0], 0.02, 64)
    assert np.isnan(r["seebeck"][0, 0, 0])
    assert np.isnan(r["lorenz"][0])
    assert r["sigma"][0, 0, 0] < 1e-8
    # the metallic mu of the same batch is still computed
    assert np.isfinite(r["seebeck"][1, 0, 0])
    assert r["sigma"][1, 0, 0] > 1e-3


def test_tdf_matches_l0():
    sq = ptt.models.square(t=-1.0)
    kt = 0.05
    mu = -1.1
    es = np.linspace(-4.5, 4.5, 1201)
    td = boltzmann.transport_distribution(sq, es, 256, smearing=0.03)
    f = 1.0 / (1.0 + np.exp((es - mu) / kt))
    w = f * (1.0 - f) / kt
    l0 = np.trapezoid(td[:, 0, 0] * w, es)
    r = boltzmann.transport_coefficients(sq, [mu], kt, 256, tau=1.0)
    assert abs(l0 - r["sigma"][0, 0, 0]) < 0.01 * abs(l0)


def test_seebeck_sign_and_symmetry():
    sq = ptt.models.square(t=-1.0)
    r = boltzmann.transport_coefficients(sq, [-3.0, 3.0], 0.05, 64)
    assert r["seebeck"][0, 0, 0] < 0  # electron-like
    assert r["seebeck"][1, 0, 0] > 0  # hole-like
    # C4 lattice: isotropic tensors, no off-diagonal sigma
    assert abs(r["sigma"][0, 0, 0] - r["sigma"][0, 1, 1]) < 1e-10
    assert abs(r["sigma"][0, 0, 1]) < 1e-12


def test_mesh_sharded_grid():
    sq = ptt.models.square(t=-1.0)
    base = boltzmann.transport_coefficients(sq, [-1.0, 1.0], 0.05, 32)
    with pmesh.use_mesh(pmesh.auto_mesh()):
        shard = boltzmann.transport_coefficients(sq, [-1.0, 1.0], 0.05, 32)
    np.testing.assert_allclose(base["sigma"], shard["sigma"], atol=1e-12)
    np.testing.assert_allclose(base["sigma_hall"], shard["sigma_hall"],
                               atol=1e-12)


def test_three_d_hall_shape():
    cub = ptt.tb_model(3, 3, np.eye(3), [[0, 0, 0]])
    cub.set_hop(-1.0, 0, 0, [1, 0, 0])
    cub.set_hop(-1.0, 0, 0, [0, 1, 0])
    cub.set_hop(-1.0, 0, 0, [0, 0, 1])
    r = boltzmann.transport_coefficients(cub, [-5.5], 0.03, 48)
    sh = r["sigma_hall"]
    assert sh.shape == (1, 3, 3, 3)
    # antisymmetric in the first two indices; cubic symmetry: equal
    # magnitudes for all three B axes
    assert abs(sh[0, 0, 1, 2] + sh[0, 1, 0, 2]) < 1e-12
    assert abs(abs(sh[0, 0, 1, 2]) - abs(sh[0, 1, 2, 0])) < 1e-10
    # dilute limit R_H for B || z, built from the 3-D tensors
    sig = r["sigma"][0]
    rh = -(np.linalg.inv(sig) @ sh[0, :, :, 2] @ np.linalg.inv(sig))[1, 0]
    assert abs(rh * r["n"][0] + 1.0) < 0.05


def test_guards():
    sq = ptt.models.square(t=-1.0)
    with pytest.raises(PythtbError):
        boltzmann.transport_coefficients(sq, [0.0], -0.1, 16)
    with pytest.raises(PythtbError):
        boltzmann.transport_coefficients(sq, [0.0], 0.1, [16])
    with pytest.raises(PythtbError):
        boltzmann.transport_coefficients(sq.cut_piece(4, 0), [0.0], 0.1, 16)
    with pytest.raises(PythtbError):
        boltzmann.transport_distribution(sq, [0.0], 16, smearing=-1.0)
