"""Oracles for real-time dynamics (pythtb_tpu.dynamics).

- Chebyshev propagation vs dense eigendecomposition evolution (exact
  unitary, shared-nothing) at 1e-10; unitarity to 1e-12; spinful and
  TorusSample inputs;
- Loschmidt echo vs per-k scipy.linalg.expm (Pade, not
  eigendecomposition) at 1e-10;
- DQPT physics: the SSH quench across the critical point produces
  rate-function cusps at the predicted critical times, while a quench
  within a phase stays smooth and small;
- chiral edge transport: a gap-filtered wavepacket on a Haldane flake
  circulates with a consistent handedness.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, dynamics, realspace
from pythtb_tpu.ops.matvec import to_dense

from . import zoo


def _dense_evolution(model, psi0, times):
    from pythtb_tpu.ops.matvec import sparse_h

    H = to_dense(sparse_h(model))
    w, v = np.linalg.eigh(H)
    c0 = v.conj().T @ psi0
    return np.stack([v @ (np.exp(-1j * w * t) * c0) for t in times])


def test_evolve_vs_dense():
    m = zoo.haldane(ptt).cut_piece(4, 0).cut_piece(4, 1)  # 32 sites
    rng = np.random.default_rng(0)
    psi0 = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    psi0 /= np.linalg.norm(psi0)
    times = np.linspace(0.7, 7.0, 10)
    psi_t = dynamics.evolve(m, psi0, times)
    ref = _dense_evolution(m, psi0, times)
    assert np.abs(psi_t - ref).max() < 1e-10
    # unitarity
    norms = np.linalg.norm(psi_t, axis=1)
    assert np.abs(norms - 1.0).max() < 1e-12
    # state block input
    psis = np.stack([psi0, np.roll(psi0, 3)], axis=1)
    out = dynamics.evolve(m, psis, times)
    assert out.shape == (10, 32, 2)
    assert np.abs(out[:, :, 0] - psi_t).max() < 1e-10


def test_evolve_spinful_and_torus():
    km = zoo.kane_mele(ptt).cut_piece(3, 0).cut_piece(3, 1)
    n = km._nsta
    rng = np.random.default_rng(1)
    psi0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    psi0 /= np.linalg.norm(psi0)
    times = np.linspace(0.5, 2.5, 5)
    psi_t = dynamics.evolve(km, psi0, times)
    ref = _dense_evolution(km, psi0, times)
    assert np.abs(psi_t - ref).max() < 1e-10

    s = realspace.torus_sample(zoo.haldane(ptt), (3, 3))
    p0 = np.zeros(s.nsta, complex)
    p0[0] = 1.0
    out = dynamics.evolve(s, p0, np.array([1.0]))
    H = to_dense(s.h)
    w, v = np.linalg.eigh(H)
    ref1 = v @ (np.exp(-1j * w) * (v.conj().T @ p0))
    assert np.abs(out[0] - ref1).max() < 1e-10


def test_evolve_errors():
    m = zoo.haldane(ptt).cut_piece(3, 0).cut_piece(3, 1)
    with pytest.raises(PythtbError):
        dynamics.evolve(m, np.ones(m._nsta), np.array([1.0, 1.5, 2.5]))
    with pytest.raises(PythtbError):
        dynamics.evolve(m, np.ones(3), np.array([1.0]))
    with pytest.raises(PythtbError):
        dynamics.evolve(zoo.haldane(ptt), np.ones(2), np.array([1.0]))


def test_quench_echo_vs_expm():
    """General det-echo machinery vs per-k scipy expm (independent
    algorithm), SSH quench, both occupied-count choices."""
    from scipy.linalg import expm

    mi = ptt.models.ssh(delta=0.5)
    mf = ptt.models.ssh(delta=-0.5)
    nk = 16
    times = np.linspace(0.3, 6.0, 7)
    for occ in ([0], [0, 1]):
        g = dynamics.quench_echo(mi, mf, occ, (nk,), times)
        ref = np.zeros_like(times)
        for ik in range(nk):
            k = np.array([ik / nk])
            _, vi = mi.solve_one(k, eig_vectors=True)
            vi = np.atleast_2d(np.asarray(vi))[list(occ)]
            # dense H_f(k) rebuilt from model_f's eigendecomposition
            # (rows of vf are state amplitudes: H = sum_j e_j psi_j psi_j^dag)
            ef, vf = mf.solve_one(k, eig_vectors=True)
            vf = np.atleast_2d(np.asarray(vf))
            Hf = (vf.T * ef) @ vf.conj()
            for it, t in enumerate(times):
                U = expm(-1j * Hf * t)
                M = vi.conj() @ U @ vi.T
                ref[it] += -2.0 * np.log(np.abs(np.linalg.det(M)))
        ref /= nk * len(occ)
        np.testing.assert_allclose(g, ref, atol=1e-10)


def test_quench_echo_dqpt_cusps():
    """Quench across the SSH transition: cusps at t*_n = (2n+1) pi /
    (2 eps_f(k*)), k* the momentum where the old and new Bloch vectors
    are orthogonal.  A within-phase quench stays smooth and small."""
    mi = ptt.models.ssh(delta=0.6)
    mf = ptt.models.ssh(delta=-0.6)
    nk = 400
    # locate k*: overlap |<u_i(k)|u_f(k)>|^2 = 1/2 crossing
    ks = np.arange(nk) / nk
    ov = []
    for k in ks:
        _, vi = mi.solve_one([k], eig_vectors=True)
        _, vf = mf.solve_one([k], eig_vectors=True)
        ov.append(abs(np.vdot(np.asarray(vi)[0], np.asarray(vf)[0])) ** 2)
    ov = np.asarray(ov)
    istar = int(np.argmin(np.abs(ov - 0.5)))
    ef = mf.solve_one([ks[istar]])
    eps_star = float(np.max(ef))
    t_star = np.pi / (2.0 * eps_star)
    times = np.linspace(0.02, 4.0 * t_star, 400)
    g = dynamics.quench_echo(mi, mf, [0], (nk,), times)
    # cusp = local max of g near t_star with a large curvature spike
    i1 = int(np.argmin(np.abs(times - t_star)))
    w = 25
    local = g[max(0, i1 - w):i1 + w]
    ipk = int(np.argmax(local)) + max(0, i1 - w)
    assert abs(times[ipk] - t_star) < 0.05 * t_star
    assert g[ipk] > 0.1
    # trivial quench: small smooth rate function
    g0 = dynamics.quench_echo(ptt.models.ssh(delta=0.6),
                              ptt.models.ssh(delta=0.3), [0], (nk,), times)
    assert g0.max() < 0.05
    d2 = np.abs(np.diff(g0, 2)).max() / (times[1] - times[0]) ** 2
    d2c = np.abs(np.diff(g, 2)).max() / (times[1] - times[0]) ** 2
    assert d2c > 20.0 * d2  # the cusp's curvature spike


def test_quench_echo_errors():
    with pytest.raises(PythtbError):
        dynamics.quench_echo(ptt.models.ssh(), ptt.models.graphene(),
                             [0], (8,), np.array([1.0]))
    with pytest.raises(PythtbError):
        dynamics.quench_echo(
            ptt.models.ssh().cut_piece(4, 0, glue_edgs=False),
            ptt.models.ssh().cut_piece(4, 0, glue_edgs=False),
            [0], (8,), np.array([1.0]))


def test_chiral_edge_transport():
    """Gap-filtered wavepacket on a Haldane flake circulates one way:
    the tangential displacement keeps a consistent sign."""
    m = zoo.haldane(ptt)
    flake = m.cut_piece(8, 0).cut_piece(8, 1)  # 128 sites, open
    from pythtb_tpu.ops.matvec import sparse_h

    H = to_dense(sparse_h(flake))
    w, v = np.linalg.eigh(H)
    gap = np.abs(w) < 0.5  # in-gap edge states
    assert gap.sum() > 4
    pos = np.asarray(flake._orb) @ np.asarray(flake._lat)
    # seed on an edge site, project into the gap window
    seed = np.zeros(len(w), complex)
    edge_site = int(np.argmin(pos[:, 1]))  # bottom edge
    seed[edge_site] = 1.0
    psi0 = (v[:, gap] @ (v[:, gap].conj().T @ seed))
    psi0 /= np.linalg.norm(psi0)
    times = np.linspace(1.0, 12.0, 12)
    psi_t = dynamics.evolve(flake, psi0, times)
    dens = np.abs(psi_t) ** 2
    com = dens @ pos  # (nt, 2)
    center = pos.mean(axis=0)
    r = com - center
    cross = r[:-1, 0] * r[1:, 1] - r[:-1, 1] * r[1:, 0]
    # consistent chirality: every interval winds the same way
    assert np.all(cross > 0) or np.all(cross < 0)
    # and it actually moves
    assert np.linalg.norm(com[-1] - com[0]) > 0.5


def test_review_guards():
    """Regressions from code review: order < 2 must raise (jnp index
    clamping silently returned a non-unitary state); duplicate occ in
    quench_echo must raise (rank-deficient determinant gave inf)."""
    m = zoo.haldane(ptt).cut_piece(3, 0).cut_piece(3, 1)
    with pytest.raises(PythtbError, match="order"):
        dynamics.evolve(m, np.ones(m._nsta) / np.sqrt(m._nsta),
                        np.array([1.0]), order=1)
    with pytest.raises(PythtbError, match="distinct"):
        dynamics.quench_echo(ptt.models.ssh(delta=0.5),
                             ptt.models.ssh(delta=-0.5), [0, 0], (8,),
                             np.array([1.0]))


def test_evolve_arbitrary_uniform_grid():
    """times need not start at the step: an initial fractional
    (possibly backward) Chebyshev step seeds the series, so any uniform
    grid -- including one starting at 0 -- matches the dense oracle."""
    m = zoo.haldane(ptt).cut_piece(3, 0).cut_piece(3, 1)
    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal(m._nsta) + 1j * rng.standard_normal(m._nsta)
    psi0 /= np.linalg.norm(psi0)
    for times in (np.linspace(0.5, 3.5, 6),   # t0 < step
                  np.linspace(2.0, 4.0, 5),   # t0 > step
                  np.linspace(0.0, 2.0, 5)):  # includes t = 0
        out = dynamics.evolve(m, psi0, times)
        ref = _dense_evolution(m, psi0, times)
        assert np.abs(out - ref).max() < 1e-10
    with pytest.raises(PythtbError):
        dynamics.evolve(m, psi0, np.array([0.0]))


def test_evolve_long_seed_step_exact():
    """Regression (review): a seed step much longer than dt needs its
    OWN Bessel-safe order -- truncating it at the scan order gave
    silently non-unitary states."""
    m = zoo.haldane(ptt).cut_piece(3, 0).cut_piece(3, 1)
    rng = np.random.default_rng(5)
    psi0 = rng.standard_normal(m._nsta) + 1j * rng.standard_normal(m._nsta)
    psi0 /= np.linalg.norm(psi0)
    times = np.linspace(100.0, 101.0, 3)  # seed step ~ 99.5 >> dt 0.5
    out = dynamics.evolve(m, psi0, times)
    ref = _dense_evolution(m, psi0, times)
    assert np.abs(out - ref).max() < 1e-9
    assert np.abs(np.linalg.norm(out, axis=1) - 1.0).max() < 1e-12
