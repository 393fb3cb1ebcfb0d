"""Effective mass and Loewdin k.p expansion (geometry.effective_mass /
geometry.kp_model).

Oracles:

* analytic 1-D chain: eps(k) = 2 t cos(k_cart) gives hessian(-2t) at
  Gamma, zero mass curvature and velocity 2|t| at the band middle;
* finite-difference differential oracle on a random 2-D model
  (central stencil in Cartesian k, O(h^2));
* single-band kp_model == effective_mass (the Loewdin second-order
  block collapses to the band Hessian);
* graphene Dirac cone: the 2x2 kp model at K is linear and isotropic
  with the exact Fermi velocity (matched against brute-force band
  slopes);
* convergence order: a second-order kp model tracks the exact bands
  to O(|dk|^3) -- halving dk shrinks the error ~8x.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import geometry
from pythtb_tpu.model import PythtbError


def _rand_model(seed):
    rng = np.random.default_rng(seed)
    lat = np.eye(2) + 0.2 * rng.standard_normal((2, 2))
    orb = rng.uniform(0, 1, size=(3, 2))
    m = ptt.tb_model(2, 2, lat, orb)
    m.set_onsite(list(rng.standard_normal(3)))
    done = set()
    for i in range(3):
        for j in range(3):
            for R in ([0, 0], [1, 0], [0, 1]):
                if (i, j, tuple(R)) in done or (i == j and R == [0, 0]):
                    continue
                done.add((i, j, tuple(R)))
                amp = rng.standard_normal() + 1j * rng.standard_normal()
                try:
                    m.set_hop(0.5 * amp, i, j, R)
                except PythtbError:
                    pass
    return m


def test_chain_analytic():
    ch = ptt.models.chain(t=-1.0)
    r = geometry.effective_mass(ch, [0.0], 0)
    # eps = -2 cos(k_cart): hessian(0) = 2, v(0) = 0
    assert abs(r["hessian"][0, 0] - 2.0) < 1e-10
    assert abs(r["velocity"][0]) < 1e-10
    assert abs(r["mass"][0] - 0.5) < 1e-10
    assert abs(r["energy"] + 2.0) < 1e-12
    # band middle k_red = 1/4: v = 2 sin(pi/2) = 2, hessian = 0
    r2 = geometry.effective_mass(ch, [0.25], 0)
    assert abs(r2["velocity"][0] - 2.0) < 1e-10
    assert abs(r2["hessian"][0, 0]) < 1e-10
    assert abs(r2["mass"][0]) > 1e9  # inflection point: diverging mass


@pytest.mark.parametrize("seed", [3, 11])
def test_hessian_vs_finite_difference(seed):
    m = _rand_model(seed)
    lat = np.asarray(m._lat, dtype=float)
    k0 = np.array([0.137, 0.281])
    band = 1
    r = geometry.effective_mass(m, k0, band)
    h = 1e-4

    def ev_at(dk_cart):
        dk_red = lat @ np.asarray(dk_cart) / (2.0 * np.pi)
        return m.solve_all([k0 + dk_red])[band, 0]

    for a in range(2):
        for b in range(2):
            ea = np.zeros(2)
            eb = np.zeros(2)
            ea[a] = h
            eb[b] = h
            if a == b:
                fd = (ev_at(ea) - 2 * ev_at([0, 0]) + ev_at(-ea)) / h**2
            else:
                fd = (ev_at(ea + eb) - ev_at(ea - eb)
                      - ev_at(eb - ea) + ev_at(-ea - eb)) / (4 * h**2)
            assert abs(r["hessian"][a, b] - fd) < 5e-5, (a, b)
    # velocity against the first-derivative stencil
    for a in range(2):
        ea = np.zeros(2)
        ea[a] = h
        fd = (ev_at(ea) - ev_at(-ea)) / (2 * h)
        assert abs(r["velocity"][a] - fd) < 1e-6


def test_single_band_kp_equals_effective_mass():
    m = _rand_model(7)
    k0 = [0.21, 0.34]
    r = geometry.effective_mass(m, k0, 0)
    kp = geometry.kp_model(m, k0, [0])
    assert abs(kp.h0[0, 0] - r["energy"]) < 1e-12
    assert np.allclose(np.real(kp.h1[:, 0, 0]), r["velocity"], atol=1e-12)
    assert np.allclose(np.real(kp.h2[:, :, 0, 0]), r["hessian"], atol=1e-10)
    # h2 Hermitian in the band indices, symmetric in (a, b)
    kp3 = geometry.kp_model(m, k0, [0, 1])
    assert np.allclose(kp3.h2, np.conj(kp3.h2.transpose(0, 1, 3, 2)))
    assert np.allclose(kp3.h2, kp3.h2.transpose(1, 0, 2, 3))
    # dk = 0 reproduces the exact energies
    assert np.allclose(kp3(np.zeros(2)),
                       np.sort(m.solve_all([k0])[:2, 0]), atol=1e-12)


def test_graphene_dirac_cone():
    g = ptt.models.graphene(t=-1.0)
    K = [1.0 / 3.0, 2.0 / 3.0]
    # the Dirac point is doubly degenerate: single-band PT must refuse
    with pytest.raises(PythtbError):
        geometry.effective_mass(g, K, 0)
    kp = geometry.kp_model(g, K, [0, 1])
    # linear, isotropic cone: eigenvalues +- v |dk| + O(dk^2)
    lat = np.asarray(g._lat, dtype=float)
    vs = []
    for th in (0.0, 0.7, 1.9, 3.0):
        dk = 1e-4 * np.array([np.cos(th), np.sin(th)])
        e = kp(dk)
        vs.append((e[1] - e[0]) / 2e-4)
        # against the exact solve at the same offset
        ex = np.sort(g.solve_all([np.asarray(K) + lat @ dk / (2 * np.pi)])[:, 0])
        assert np.abs(e - ex).max() < 1e-9
    vs = np.asarray(vs)
    # nearest-neighbor graphene, |t| = 1, a = 1: v_F = sqrt(3)/2
    assert np.abs(vs - np.sqrt(3.0) / 2.0).max() < 1e-3, vs


def test_kp_third_order_convergence():
    m = ptt.models.haldane()
    k0 = [0.11, 0.27]
    kp = geometry.kp_model(m, k0, [0])
    lat = np.asarray(m._lat, dtype=float)

    def err(s):
        dk = s * np.array([0.8, 0.6])
        ex = m.solve_all([np.asarray(k0) + lat @ dk / (2 * np.pi)])[0, 0]
        return abs(kp(dk)[0] - ex)

    e1, e2 = err(2e-2), err(1e-2)
    assert e1 / e2 > 6.0, (e1, e2)  # third order: ratio -> 8


def test_guards():
    m = ptt.models.haldane()
    with pytest.raises(PythtbError):
        geometry.effective_mass(m, [0.1, 0.1], 5)
    with pytest.raises(PythtbError):
        geometry.kp_model(m, [0.1, 0.1], [0, 0])
    with pytest.raises(PythtbError):
        geometry.kp_model(m, [0.1], [0])  # wrong k0 length
    fin = m.cut_piece(3, 0)
    with pytest.raises(PythtbError):
        geometry.effective_mass(fin, [0.1], 0)
