"""Oracles for optical.py (Kubo conductivity + joint DOS).

* physics -- positive absorption; spinless graphene's universal
  pi/4 e^2/h plateau; sigma_xy(w->0) == chern_number (package Hall
  convention); TRS Kane-Mele has zero Hall response; Drude peak for a
  metal at finite temperature; JDOS onset at the direct gap with exact
  normalization.
* differential -- an independently coded numpy k-loop (finite-
  difference velocities, explicit python loops) must match the fused
  device program on the full tensor.
* structure -- reality condition sigma(-w) = conj(sigma(w)),
  positivity, error cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu
from pythtb_tpu import PythtbError, flows, optical
from pythtb_tpu.models import library as zoo

from .zoo import kane_mele


def _sigma_numpy(model, omegas, occ, nk, eta):
    """Brute-force implementation of the documented formula: python
    loops, numpy eigh, central-difference velocities."""
    from pythtb_tpu.ops.hamiltonian import assemble

    static, data = model._get_finalized()
    lat = np.asarray(model._lat, dtype=np.float64)
    dim = model._dim_k
    grids = [np.arange(n) / float(n) for n in nk]
    kpts = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, dim)
    B = len(kpts)
    dk = 1e-6
    shifts = [kpts]
    for r in range(dim):
        for s in (+dk, -dk):
            kp = kpts.copy()
            kp[:, r] += s
            shifts.append(kp)
    Hs = np.asarray(assemble(static, data, jnp.asarray(np.concatenate(shifts))))
    H0, Hpm = Hs[:B], Hs[B:].reshape(dim, 2, B, *Hs.shape[1:])
    S = H0.shape[-1]
    vol = abs(np.linalg.det(lat))
    sig = np.zeros((dim, dim, len(omegas)), dtype=complex)
    for ik in range(B):
        ev, U = np.linalg.eigh(H0[ik])  # columns = states
        vred = [
            (Hpm[r, 0, ik] - Hpm[r, 1, ik]) / (2 * dk) for r in range(dim)
        ]
        vcart = [
            sum(lat[r, a] * vred[r] for r in range(dim)) / (2 * np.pi)
            for a in range(dim)
        ]
        vb = [U.conj().T @ v @ U for v in vcart]  # band basis
        f = np.zeros(S)
        f[list(occ)] = 1.0
        for n in range(S):
            for m in range(S):
                de = ev[m] - ev[n]
                if abs(de) < 1e-9 or f[n] == f[m]:
                    continue
                for a in range(dim):
                    for b in range(dim):
                        sig[a, b] += (
                            1j
                            * (f[n] - f[m])
                            / de
                            * vb[b][n, m]
                            * vb[a][m, n]
                            / (omegas - de + 1j * eta)
                        )
    return sig * 2 * np.pi / (B * vol)


class TestOpticalConductivity:
    def test_differential_vs_numpy_loop(self):
        m = zoo.haldane()
        w = np.array([0.0, 0.8, 1.5, 3.0])
        got = optical.optical_conductivity(m, w, occ=[0], nk=(9, 9), eta=0.08)
        want = _sigma_numpy(m, w, [0], (9, 9), 0.08)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_hall_dc_limit_is_chern(self):
        m = zoo.haldane()
        C = flows.chern_number(m, occ=[0], nk=(101, 101))
        sig = optical.optical_conductivity(m, [0.0], occ=[0], nk=(101, 101),
                                           eta=0.01)
        assert abs(sig[0, 1, 0].real - C) < 1e-3
        assert abs(sig[1, 0, 0].real + C) < 1e-3  # antisymmetric

    def test_positive_absorption(self):
        m = zoo.haldane()
        w = np.linspace(0.0, 8.0, 33)
        sig = optical.optical_conductivity(m, w, occ=[0], nk=(41, 41), eta=0.05)
        assert (sig[0, 0].real > -1e-10).all()
        assert (sig[1, 1].real > -1e-10).all()

    def test_graphene_universal_plateau(self):
        g = zoo.graphene()
        sig = optical.optical_conductivity(
            g, [0.25, 0.4, 0.6], occ=[0], nk=(241, 241), eta=0.015
        )
        # spinless: pi/4 e^2/h (the measured pi/2 includes spin).  The
        # individual points ripple with the discrete sampling of the
        # Dirac cone; the plateau average is clean.
        np.testing.assert_allclose(
            sig[0, 0].real.mean(), np.pi / 4, rtol=0.06
        )
        assert (abs(sig[0, 0].real - np.pi / 4) < 0.09).all()

    def test_reality_condition(self):
        m = zoo.haldane()
        w = np.array([0.5, 1.7])
        sp = optical.optical_conductivity(m, w, occ=[0], nk=(21, 21), eta=0.05)
        sm = optical.optical_conductivity(m, -w, occ=[0], nk=(21, 21), eta=0.05)
        np.testing.assert_allclose(sm, np.conj(sp), atol=1e-10)

    def test_trs_zero_hall(self):
        km = kane_mele(pythtb_tpu, "odd")
        sig = optical.optical_conductivity(
            km, [0.0, 0.5], occ=[0, 1], nk=(31, 31), eta=0.05
        )
        np.testing.assert_allclose(sig[0, 1], 0.0, atol=1e-8)
        assert (sig[0, 0].real > -1e-12).all()

    def test_fermi_matches_occ_for_insulator(self):
        m = zoo.haldane()
        w = np.array([0.0, 1.5])
        s1 = optical.optical_conductivity(m, w, occ=[0], nk=(15, 15), eta=0.05)
        s2 = optical.optical_conductivity(m, w, fermi=0.0, nk=(15, 15), eta=0.05)
        np.testing.assert_allclose(s1, s2, atol=1e-10)

    def test_metal_drude_peak(self):
        sq = zoo.square()
        w = np.array([0.0, 1.0])
        sig = optical.optical_conductivity(
            sq, w, fermi=0.0, nk=(61, 61), eta=0.05, temperature=0.2
        )
        d = sig[0, 0].real
        assert d[0] > 10.0 and d[0] > 20 * d[1]  # Drude peak at w=0
        # T=0 discrete grid: intraband term omitted, finite response
        sig0 = optical.optical_conductivity(
            sq, w, fermi=0.0, nk=(61, 61), eta=0.05, temperature=0.0
        )
        assert sig0[0, 0, 0].real < d[0]

    def test_errors(self):
        m = zoo.haldane()
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m.cut_piece(3, 0), [0.0], occ=[0])
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m, [0.0], occ=[0], fermi=0.0)
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m, [0.0])
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m, [0.0], occ=[0], nk=(5, 5, 5))
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m, [0.0], occ=[0, 0], nk=(5, 5))
        with pytest.raises(PythtbError):
            optical.optical_conductivity(m, [0.0], occ=[7], nk=(5, 5))


class TestJointDOS:
    def test_onset_at_direct_gap_and_norm(self):
        m = zoo.haldane()
        kv = m.k_uniform_mesh([61, 61])
        ev = m.solve_all(kv)
        gap = (ev[1] - ev[0]).min()
        w = np.linspace(0.0, 10.0, 401)
        J = optical.joint_dos(m, w, occ=[0], nk=(61, 61), sigma=0.04)
        assert (J > -1e-12).all()
        onset = w[J > 5e-3][0]
        assert abs(onset - gap) < 0.15
        # integrates to n_occ * n_unocc = 1
        np.testing.assert_allclose(np.trapezoid(J, w), 1.0, atol=1e-3)

    def test_1d_and_errors(self):
        chain = pythtb_tpu.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
        chain.set_onsite([-1.0, 1.0])
        chain.set_hop(0.4, 0, 1, [0])
        chain.set_hop(0.4, 1, 0, [1])
        w = np.linspace(0.0, 6.0, 301)
        J = optical.joint_dos(chain, w, occ=[0], nk=(101,), sigma=0.05)
        np.testing.assert_allclose(np.trapezoid(J, w), 1.0, atol=1e-3)
        with pytest.raises(PythtbError):
            optical.joint_dos(chain.cut_piece(3, 0), w, occ=[0])
        with pytest.raises(PythtbError):
            optical.joint_dos(chain, w, occ=[0, 1], nk=(21,))
