"""Disorder: coherent-potential approximation (CPA) and ensemble tools.

Beyond-reference capability: single-site CPA for substitutional
disorder on any periodic model.  The disordered orbitals carry a
frequency-dependent self-energy ``Sigma_i(w)`` fixed by the CPA
condition that the ensemble-averaged single-site T-matrix vanish in
the effective medium,

``<t_i(w)> = sum_c p_c (eps_c - Sigma_i) /
             (1 - (eps_c - Sigma_i) G_ii(w)) = 0``,

with ``G(w) = (1/Nk) sum_k [(w + i eta) - H(k) - Sigma]^{-1}`` the
medium Green's function.  The fixed point is iterated as
``Sigma <- Sigma + <t> / (1 + G_ii <t>)`` (the standard stable CPA
update), batched over ALL frequencies in one jitted device program
(the k-sum of batched small-matrix inverses is the hot op; the omega
axis shards over a device mesh).

Disorder models:

* ``("binary", probs, values)`` -- substitutional alloy with discrete
  onsite levels (any number of species);
* ``("lorentzian", gamma)`` -- Cauchy-distributed onsite disorder.
  For analytic-in-the-lower-half-plane t(eps), the Cauchy average is
  the analytic continuation ``<t> = t(-i gamma)`` (residue theorem),
  and the EXACT disorder-averaged Green's function of the Lloyd model
  is ``G_clean(w + i gamma)`` -- i.e. ``Sigma = -i gamma`` exactly
  (Lloyd 1969).  CPA reproduces this exactly, which is the module's
  precision oracle (``tests/test_disorder.py``: fixed point within
  1e-8 of the analytic self-energy, DOS equal to the gamma-broadened
  clean DOS).

The binary-alloy CPA is pinned against brute-force ensemble averages:
the exact configuration-enumerated average Green's function of small
rings (all 2^L configurations) at weak disorder, and disorder-averaged
KPM DOS on large supercells at moderate disorder (honest tolerances --
CPA is a single-site approximation, exact only in the weak/strong
limits, infinite coordination, or Lorentzian disorder).
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .parallel import mesh as pmesh
from .utils.xfer import host_unpack, pack_cplx

__all__ = ["cpa", "cpa_dos", "ensemble_realization"]

_HP = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnums=(0, 9, 12))
def _cpa_jit(static, data, kpts, omegas, eta, probs, vals, mask,
             max_iters, use_lloyd, gamma, tol, mesh=None):
    """CPA fixed point, all omegas in one program.

    probs (nc,), vals (nc,) -- binary/discrete alloy levels on the
    orbitals selected by mask (nsta bool as float).  With use_lloyd,
    the Cauchy average replaces the discrete sum analytically.
    Returns ri-packed (Sigma (W, S), G_diag (W, S)).
    """
    from .ops.hamiltonian import assemble

    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        omegas = shard_grid_axis0(omegas, mesh)

    H = assemble(static, data, kpts)  # (B, S, S)
    B, S = H.shape[0], H.shape[-1]
    eye = jnp.eye(S, dtype=H.dtype)
    W = omegas.shape[0]

    def gdiag(sigma):
        # (W, S): medium local Green's function
        z = jax.lax.complex(omegas, jnp.broadcast_to(eta, omegas.shape))
        A = (z[:, None, None, None] * eye
             - H[None]
             - sigma[:, None, :, None] * eye)  # (W, B, S, S)
        Ginv = jnp.linalg.inv(A)
        return jnp.mean(jnp.diagonal(Ginv, axis1=-2, axis2=-1), axis=1)

    def t_avg(sigma, G):
        if use_lloyd:
            # Cauchy average: analytic continuation eps -> -i gamma
            epsc = jax.lax.complex(jnp.zeros_like(gamma), -gamma)
            de = epsc - sigma
            return de / (1.0 - de * G)
        de = vals[None, None, :] - sigma[:, :, None]  # (W, S, nc)
        t = de / (1.0 - de * G[:, :, None])
        return jnp.sum(probs[None, None, :] * t, axis=-1)

    def body(carry):
        sigma, _, i = carry
        G = gdiag(sigma)
        ta = t_avg(sigma, G) * mask[None, :]
        new = sigma + ta / (1.0 + G * ta)
        dn = jnp.max(jnp.abs(new - sigma))
        return new, dn, i + 1

    def cond(carry):
        _, dn, i = carry
        return jnp.logical_and(i < max_iters, dn > tol)

    ftype = omegas.dtype
    sig0 = jnp.zeros((W, S), dtype=H.dtype)
    if not use_lloyd:
        # virtual-crystal start: <eps>
        sig0 = sig0 + (jnp.sum(probs * vals) * mask)[None, :].astype(H.dtype)
    sigma, dn, iters = jax.lax.while_loop(
        cond, body, (sig0, jnp.asarray(jnp.inf, ftype), jnp.int32(0))
    )
    G = gdiag(sigma)
    return pack_cplx(sigma), pack_cplx(G), dn, iters


def _norm_disorder(model, disorder):
    """-> (probs, vals, use_lloyd, gamma, mask over states)."""
    kind = disorder[0]
    norb, ns = model._norb, model._nspin
    orbs = None
    if kind == "binary":
        probs = np.asarray(disorder[1], dtype=float)
        vals = np.asarray(disorder[2], dtype=float)
        if len(disorder) > 3:
            orbs = disorder[3]
        if probs.shape != vals.shape or probs.ndim != 1:
            raise PythtbError("disorder: probs/values must match 1-D")
        if abs(probs.sum() - 1.0) > 1e-10 or np.any(probs < 0):
            raise PythtbError("disorder: probs must be a distribution")
        use_lloyd, gamma = False, 0.0
    elif kind == "lorentzian":
        gamma = float(disorder[1])
        if gamma <= 0:
            raise PythtbError("disorder: gamma must be positive")
        if len(disorder) > 2:
            orbs = disorder[2]
        probs = np.ones(1)
        vals = np.zeros(1)
        use_lloyd = True
    else:
        raise PythtbError("disorder: kind must be binary/lorentzian")
    mask = np.zeros(norb * ns)
    sel = range(norb) if orbs is None else orbs
    for i in sel:
        for s in range(ns):
            mask[ns * int(i) + s] = 1.0
    return probs, vals, use_lloyd, gamma, mask


def cpa(model, omegas, nk, disorder, eta=1e-3, max_iters=200, tol=None):
    """CPA self-energy and local Green's function.

    :param omegas: real frequencies
    :param nk: k-grid (int or per-direction)
    :param disorder: ``("binary", probs, values[, orbitals])`` or
      ``("lorentzian", gamma[, orbitals])``; the optional orbital list
      restricts disorder to those orbitals (all by default)
    :param eta: positive spectral broadening
    :returns: dict with ``sigma`` (W, nsta) complex self-energies,
      ``gloc`` (W, nsta) local Green's functions, ``dos`` (W,) total
      DOS ``-Im Tr G / pi``, ``converged``, ``iters``
    """
    if model._dim_k < 1:
        raise PythtbError("cpa: model must be periodic")
    static, data = model._get_finalized()
    if np.ndim(nk) == 0:
        nk = [int(nk)] * model._dim_k
    grids = np.meshgrid(*[np.arange(n) / n for n in nk], indexing="ij")
    kpts = np.stack([g.reshape(-1) for g in grids], axis=-1)
    probs, vals, use_lloyd, gamma, mask = _norm_disorder(model, disorder)
    omegas = np.atleast_1d(np.asarray(omegas, dtype=float))
    ftype = config.float_dtype()
    if tol is None:
        tol = float(np.finfo(ftype).eps ** (2.0 / 3.0))
    sig_ri, g_ri, dn, iters = _cpa_jit(
        static, data,
        jnp.asarray(kpts, ftype),
        jnp.asarray(omegas, ftype),
        jnp.asarray(float(eta), ftype),
        jnp.asarray(probs, ftype),
        jnp.asarray(vals, ftype),
        jnp.asarray(mask, ftype),
        jnp.int32(max_iters),
        bool(use_lloyd),
        jnp.asarray(gamma, ftype),
        jnp.asarray(tol, ftype),
        pmesh.current_mesh(),
    )
    sigma = host_unpack(sig_ri)
    gloc = host_unpack(g_ri)
    converged = bool(np.asarray(jax.device_get(dn)) <= tol)
    if not converged:
        warnings.warn(
            "cpa: fixed point not converged to %.1e in %d iterations "
            "(residual %.2e)" % (tol, max_iters,
                                 float(np.asarray(jax.device_get(dn)))),
            stacklevel=2,
        )
    if np.max(np.imag(sigma)) > 10 * eta:
        warnings.warn("cpa: non-causal self-energy (Im Sigma > 0) -- "
                      "increase eta or nk", stacklevel=2)
    dos = -np.imag(np.sum(gloc, axis=1)) / np.pi
    return {
        "sigma": sigma,
        "gloc": gloc,
        "dos": dos,
        "omegas": omegas,
        "converged": converged,
        "iters": int(np.asarray(jax.device_get(iters))),
    }


def cpa_dos(model, omegas, nk, disorder, **kwargs):
    """Total CPA density of states (per cell)."""
    return cpa(model, omegas, nk, disorder, **kwargs)["dos"]


def ensemble_realization(model, disorder, seed=0):
    """One random onsite-disorder realization of a FINITE model
    (for brute-force ensemble averages against CPA): returns a copy
    with the disordered orbitals' onsite energies shifted by draws
    from the given distribution."""
    if model._dim_k != 0:
        raise PythtbError(
            "ensemble_realization: finite models (cut_piece a supercell)"
        )
    probs, vals, use_lloyd, gamma, mask = _norm_disorder(model, disorder)
    rng = np.random.default_rng(seed)
    import copy as _copy

    out = _copy.deepcopy(model)
    norb, ns = model._norb, model._nspin
    draws = np.zeros(norb)
    for i in range(norb):
        if mask[ns * i] == 0:
            continue
        if use_lloyd:
            draws[i] = gamma * np.tan(np.pi * (rng.uniform() - 0.5))
        else:
            draws[i] = vals[rng.choice(len(vals), p=probs)]
    if ns == 1:
        cur = np.asarray(out._site_energies, dtype=float)
        out.set_onsite(list(cur + draws), mode="reset")
    else:
        for i in range(norb):
            out.set_onsite(
                np.asarray(out._site_energies[i]) + draws[i] * np.eye(2),
                ind_i=i, mode="reset")
    return out
