"""Shift-current (second-order optical response) oracles.

- differential oracle: the sum-rule generalized derivative r^{c;a}
  (optical._gen_derivative, pure linear algebra in H, dH, d2H) against
  an INDEPENDENT finite-difference covariant derivative
  r^{c;a} = d_a r^c - i (A^a_nn - A^a_mm) r^c in an explicitly
  smoothed numerical gauge;
- physics oracles: centrosymmetric models give exactly zero, polarity
  flip reverses the current, C3 symmetry constrains the 2-D tensor.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu import optical
from pythtb_tpu.model import PythtbError


def rice_mele(delta=0.4, t=1.0, dt=0.3):
    """Polar 1-D chain: staggered onsite + dimerized hops, broken
    inversion -> nonzero shift current."""
    m = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
    m.set_onsite([delta, -delta])
    m.set_hop(t + dt, 0, 1, [0])
    m.set_hop(t - dt, 1, 0, [1])
    return m


def _band_data(model, kpts):
    """evals, gauge-free eigenvectors, Cartesian V and W2 at kpts."""
    from pythtb_tpu import config
    from pythtb_tpu.ops.eigh import eigh_batched
    from pythtb_tpu.ops.hamiltonian import (assemble, assemble_d2k,
                                            assemble_dk)

    static, data = model._get_finalized()
    kj = jnp.asarray(np.atleast_2d(kpts), config.float_dtype())
    H = assemble(static, data, kj)
    evals, vecs = eigh_batched(H)
    lat = jnp.asarray(np.asarray(model._lat), config.float_dtype())
    dH = assemble_dk(static, data, kj)
    dHc = jnp.einsum("ra,brij->baij", lat, dH) / (2.0 * np.pi)
    V = jnp.einsum("bns,bast,bmt->banm", jnp.conj(vecs), dHc, vecs)
    d2H = assemble_d2k(static, data, kj)
    d2c = jnp.einsum("ra,sc,brsij->bacij", lat, lat, d2H) / (
        (2.0 * np.pi) ** 2
    )
    W2 = jnp.einsum("bns,bacst,bmt->bacnm", jnp.conj(vecs), d2c, vecs)
    return (np.asarray(evals), np.asarray(vecs), np.asarray(V),
            np.asarray(W2))


def _fd_gen_derivative_1d(model, k0, dk=1e-5):
    """Finite-difference covariant derivative at reduced k0 for a 1-D
    model: smooth the gauge explicitly (each band's phase at k0 +- dk
    fixed by positive real overlap with the k0 eigenvector), then
    r^{c;a}_FD = d_a r^c - i (A^a_nn - A^a_mm) r^c, all Cartesian."""
    a_lat = float(np.asarray(model._lat)[0, 0])
    evals, vecs, V, _ = _band_data(
        model, np.array([[k0 - dk], [k0], [k0 + dk]])
    )
    S = evals.shape[1]
    # smooth gauge: rotate each neighbor band vector's phase onto k0's
    fixed = vecs.copy()
    for s in (0, 2):
        for n in range(S):
            ov = np.vdot(vecs[1, n], vecs[s, n])
            fixed[s, n] = vecs[s, n] * (np.conj(ov) / abs(ov))
    # Cartesian derivative: d/dk_cart = (a/2pi) d/dk_red for 1-D
    fac = a_lat / (2.0 * np.pi)

    def r_of(idx):
        D = evals[idx][:, None] - evals[idx][None, :]
        safe = np.where(np.abs(D) < 1e-12, 1.0, D)
        r = -1j * V[idx, 0] / safe
        np.fill_diagonal(r, 0.0)
        # re-express in the smoothed gauge: r -> U^* r U^T with
        # diagonal U the applied phases
        ph = np.array([np.vdot(vecs[idx, n], fixed[idx, n])
                       for n in range(S)])
        return np.conj(ph)[:, None] * r * ph[None, :]

    r_m, r_0, r_p = r_of(0), r_of(1), r_of(2)
    dr = (r_p - r_m) / (2.0 * dk) * fac
    # Berry connection diagonal: A_nn = i <u_n | d_k u_n>
    A = np.array([
        1j * np.vdot(fixed[1, n], (fixed[2, n] - fixed[0, n]))
        / (2.0 * dk) * fac
        for n in range(S)
    ]).real
    rgen = dr - 1j * (A[:, None] - A[None, :]) * r_0
    return r_0, rgen


@pytest.mark.parametrize("k0", [0.11, 0.37, 0.68])
def test_sum_rule_vs_fd_rice_mele(k0):
    m = rice_mele()
    evals, vecs, V, W2 = _band_data(m, np.array([[k0]]))
    r_sr, rgen_sr = optical._gen_derivative(
        jnp.asarray(evals), jnp.asarray(V), jnp.asarray(W2), 1e-7
    )
    r_fd, rgen_fd = _fd_gen_derivative_1d(m, k0)
    np.testing.assert_allclose(np.asarray(r_sr)[0, 0], r_fd, atol=1e-8)
    off = ~np.eye(evals.shape[1], dtype=bool)
    np.testing.assert_allclose(
        np.asarray(rgen_sr)[0, 0, 0][off], rgen_fd[off], atol=1e-6
    )


def test_sum_rule_vs_fd_three_band():
    """Three-band model: the p-sum (three-band terms) must be exercised
    with a genuinely nonempty p != n, m set."""
    m = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.3], [0.7]])
    m.set_onsite([0.8, -0.1, -0.6])
    m.set_hop(1.0, 0, 1, [0])
    m.set_hop(0.7 + 0.2j, 1, 2, [0])
    m.set_hop(0.5, 2, 0, [1])
    for k0 in (0.13, 0.52):
        evals, vecs, V, W2 = _band_data(m, np.array([[k0]]))
        _, rgen_sr = optical._gen_derivative(
            jnp.asarray(evals), jnp.asarray(V), jnp.asarray(W2), 1e-7
        )
        _, rgen_fd = _fd_gen_derivative_1d(m, k0)
        off = ~np.eye(3, dtype=bool)
        np.testing.assert_allclose(
            np.asarray(rgen_sr)[0, 0, 0][off], rgen_fd[off], atol=1e-6
        )


def test_centrosymmetric_shift_current_vanishes():
    """SSH at zero staggering is inversion-symmetric: sigma^{abc} = 0
    identically.  (Individual k contributions cancel pairwise between
    k and -k.)"""
    m = rice_mele(delta=0.0)  # pure dimerized hops: inversion about bond
    w = np.linspace(1.0, 4.0, 31)
    sig = optical.shift_current(m, w, occ=[0], nk=(301,), sigma=0.08)
    assert np.abs(sig).max() < 1e-10
    g = ptt.models.graphene()  # inversion-symmetric honeycomb
    w2 = np.linspace(0.5, 4.0, 16)
    sig2 = optical.shift_current(g, w2, occ=[0], nk=(61, 61), sigma=0.1)
    assert np.abs(sig2).max() < 1e-10


def test_polarity_flip_reverses_current():
    """Flipping the Rice-Mele onsite polarity is the inversion image of
    the model: the shift current reverses exactly; and the response is
    genuinely nonzero at the absorption peak."""
    w = np.linspace(0.5, 4.0, 61)
    s_plus = optical.shift_current(rice_mele(0.4), w, occ=[0], nk=(401,),
                                   sigma=0.06)
    s_minus = optical.shift_current(
        rice_mele(-0.4), w, occ=[0], nk=(401,), sigma=0.06
    )
    assert np.abs(s_plus).max() > 1e-3
    np.testing.assert_allclose(s_plus, -s_minus, atol=1e-10)


def test_bn_c3_symmetry():
    """BN is C3-symmetric: the 2-D shift tensor must be invariant under
    sigma'^{abc} = R_aa' R_bb' R_cc' sigma^{a'b'c'} with R the 120-deg
    rotation, and nonzero (broken inversion)."""
    m = ptt.models.bn()
    w = np.array([2.2, 2.6, 3.0])
    sig = optical.shift_current(m, w, occ=[0], nk=(61, 61), sigma=0.1)
    assert np.abs(sig).max() > 1e-4
    th = 2.0 * np.pi / 3.0
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    rot = np.einsum("ai,bj,ck,ijkw->abcw", R, R, R, sig)
    np.testing.assert_allclose(rot, sig, atol=1e-6)


def test_shift_current_spinful_vs_spinless_doubling():
    """A spin-doubled (SU(2)-trivial) Rice-Mele chain must give exactly
    twice the spinless shift current -- exercises the nspin=2
    assemble_d2k path."""
    w = np.linspace(1.0, 3.5, 21)
    s1 = optical.shift_current(rice_mele(), w, occ=[0], nk=(201,),
                               sigma=0.08)
    m2 = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]], nspin=2)
    m2.set_onsite([0.4, -0.4])
    m2.set_hop(1.3, 0, 1, [0])
    m2.set_hop(0.7, 1, 0, [1])
    s2 = optical.shift_current(m2, w, occ=[0, 1], nk=(201,), sigma=0.08)
    np.testing.assert_allclose(s2, 2.0 * s1, atol=1e-9)


def test_shift_current_errors():
    m = ptt.models.graphene()
    with pytest.raises(PythtbError):
        optical.shift_current(m.cut_piece(3, 0), [1.0], occ=[0])
    with pytest.raises(PythtbError):
        optical.shift_current(m, [1.0], occ=[0, 1], nk=(11, 11))
    with pytest.raises(PythtbError):
        optical.shift_current(m, [1.0], occ=[0], nk=(11,))
