"""Linear response: orbital-resolved Lindhard susceptibility and RPA.

Beyond-reference capability (the reference framework at
``/root/reference/pythtb.py`` has no response machinery): the bare
particle-hole susceptibility of a periodic tight-binding model,

``chi0_ab(q, w) = -(1/Nk) sum_{k,n,m} (f_nk - f_mk+q)
    M_a(k,n,m) conj(M_b(k,n,m)) / (w + e_nk - e_mk+q + i eta)``

with ``M_a = <u_nk| P_a |u_mk+q>`` the orbital-projected density
matrix element, in the **positive convention** (``chi0(q, 0)`` is a
positive-semidefinite Hermitian orbital matrix; it equals *minus* the
retarded correlator ``<<n_a(q); n_b(-q)>>`` of :func:`ed.dynamic_
susceptibility` -- the cross-check in ``tests/test_response.py`` pins
this sign and the orbital-embedding phases at 1e-9 against exact
diagonalization on matching finite clusters).

Convention note: with Convention-I Bloch phases (``ops/hamiltonian``,
phase factors include orbital positions), the momentum-q orbital
density operator is exactly ``n_a(q) = sum_k c^dag_{k,a} c_{k+q,a}``
-- no extra embedding phases appear in the matrix elements, so the
raw eigenvector products above are the correct ones (this would NOT
hold in Convention II).

RPA (Hubbard factorization, per-spin ``chi0`` for spinless-basis
models): ``chi_s = chi0 (1 - U chi0)^-1`` (spin channel),
``chi_c = chi0 (1 + U chi0)^-1`` (charge channel); the Stoner
instability of the paramagnet is ``max eig[U^1/2 chi0(q,0) U^1/2]
-> 1``, and the critical coupling per wavevector is ``U_c(q) = U /
lambda_max(q)``.  The RPA Stoner threshold coincides with the onset
of symmetry breaking in self-consistent Hartree-Fock (same k-grid,
same temperature) -- that equivalence is tested against
``meanfield.hartree_fock`` on the honeycomb Hubbard model.

TPU-first: one jitted program solves the k and k+q grids with the
batched eigensolver, forms the band matrix elements with a HIGHEST-
precision einsum, and sweeps all frequencies in one contraction; the
q batch is vmapped and shards over a device mesh
(``parallel.use_mesh``).  Nothing complex crosses the host<->device
boundary (ri-packed returns).
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

__all__ = ["lindhard", "rpa_susceptibility", "stoner_analysis"]

_HP = jax.lax.Precision.HIGHEST


def _fermi(x):
    return 0.5 * (1.0 - jnp.tanh(0.5 * x))


@partial(jax.jit, static_argnums=(0, 5, 10))
def _lindhard_jit(static, data, kpts, qpts, omegas, nocc, mu, kt, eta,
                  wts, mesh=None):
    """chi0 for a batch of q vectors; returns ri-packed
    (nq, nomega, nops, nops)."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble

    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        qpts = shard_grid_axis0(qpts, mesh)

    Hk = assemble(static, data, kpts)  # (B, S, S)
    wk, vk = eigh_batched(Hk)
    nsta = wk.shape[-1]

    def occ_of(w):
        if nocc is not None:
            return jnp.where(
                jnp.arange(nsta)[None, :] < nocc,
                jnp.ones((), w.dtype),
                jnp.zeros((), w.dtype),
            ) * jnp.ones_like(w)
        return _fermi((w - mu) / kt)

    f_k = occ_of(wk)

    def chi_q(q):
        Hq = assemble(static, data, kpts + q[None, :])
        wq, vq = eigh_batched(Hq)
        f_q = occ_of(wq)
        # orbital-projected matrix elements, summed over internal
        # (spin) components via the operator weights wts (nops, S)
        M = jnp.einsum(
            "kns,os,kms->knmo", jnp.conj(vk), wts, vq, precision=_HP
        )  # (B, n, m, nops)
        num = f_k[:, :, None] - f_q[:, None, :]  # (B, n, m)
        de = wk[:, :, None] - wq[:, None, :]
        d = omegas[:, None, None, None] + de[None]
        den = jax.lax.complex(d, jnp.broadcast_to(eta, d.shape))
        wgt = num[None] / den  # (W, B, n, m) complex
        chi = -jnp.einsum(
            "wknm,knmo,knmp->wop", wgt, M, jnp.conj(M), precision=_HP
        ) / kpts.shape[0]
        return chi

    chi = jax.vmap(chi_q)(qpts)  # (nq, W, nops, nops)
    return pack_cplx(chi)


def _setup(model, nk):
    static, data = model._get_finalized()
    if model._dim_k < 1:
        raise PythtbError("response: model must be periodic (dim_k >= 1)")
    if np.ndim(nk) == 0:
        nk = [int(nk)] * model._dim_k
    nk = [int(n) for n in nk]
    if len(nk) != model._dim_k:
        raise PythtbError("response: nk must have dim_k entries")
    grids = np.meshgrid(
        *[np.arange(n) / n for n in nk], indexing="ij"
    )
    kpts = np.stack([g.reshape(-1) for g in grids], axis=-1)
    return static, data, kpts


def _default_ops(model):
    """Orbital-density operator weights (norb, nsta)."""
    norb, ns = model._norb, model._nspin
    wts = np.zeros((norb, norb * ns))
    for i in range(norb):
        for s in range(ns):
            wts[i, ns * i + s] = 1.0
    return wts


def lindhard(model, qpts, omegas, nk, nocc=None, mu=None,
             temperature=None, eta=1e-2, ops=None):
    """Bare susceptibility ``chi0(q, omega)`` on a uniform k-grid.

    :param qpts: (nq, dim_k) reduced wavevectors (or a single vector)
    :param omegas: frequencies (real axis; broadened by ``eta``)
    :param nk: k-grid size (int or per-direction list)
    :param nocc: T = 0 band-filling occupations (insulator mode); the
      lowest ``nocc`` bands are filled at every k.  Mutually exclusive
      with ``mu``.
    :param mu: chemical potential for Fermi occupations at
      ``temperature`` (metal mode)
    :param eta: Lorentzian broadening of the poles
    :param ops: optional (nops, nsta) array of *diagonal* one-body
      operator weights replacing the default per-orbital densities
      (e.g. S^z patterns for explicit-spin models)
    :returns: complex array (nq, nomega, nops, nops); positive
      convention (see module docstring).  Per-spin for nspin == 1
      models -- multiply by 2 for the physical charge response.

    For nspin == 1 models this is the **per-spin** susceptibility.  In
    ``nocc`` mode the k-grid occupations are by band index; if the
    model is metallic on that grid (occupied and empty bands overlap
    in energy) a warning is issued -- use the ``mu`` mode there.
    """
    static, data, kpts = _setup(model, nk)
    qpts = np.atleast_2d(np.asarray(qpts, dtype=float))
    if qpts.shape[1] != model._dim_k:
        raise PythtbError("lindhard: qpts must have dim_k columns")
    omegas = np.atleast_1d(np.asarray(omegas, dtype=float))
    if (nocc is None) == (mu is None):
        raise PythtbError("lindhard: give exactly one of nocc / mu")
    if ops is None:
        wts = _default_ops(model)
    else:
        wts = np.asarray(ops, dtype=float)
        if wts.ndim != 2 or wts.shape[1] != model._nsta:
            raise PythtbError("lindhard: ops must be (nops, nsta)")
    ftype = config.float_dtype()
    kt = 0.0 if temperature is None else float(temperature)
    if mu is not None and kt <= 0.0:
        raise PythtbError("lindhard: mu mode needs temperature > 0")
    if nocc is not None:
        if not 0 < nocc <= model._nsta:
            raise PythtbError("lindhard: nocc must be in 1..nsta")
        # diagnose metallicity of the band-index filling
        ev = np.asarray(model.solve_all(kpts))
        if nocc < model._nsta and (
            np.max(ev[:nocc]) >= np.min(ev[nocc:]) - 1e-12
        ):
            warnings.warn(
                "lindhard: occupied and empty bands overlap on this "
                "k-grid (metallic); band-index occupations are "
                "ill-defined -- use mu/temperature mode",
                stacklevel=2,
            )
    out = _lindhard_jit(
        static,
        data,
        jnp.asarray(kpts, ftype),
        jnp.asarray(qpts, ftype),
        jnp.asarray(omegas, ftype),
        int(nocc) if nocc is not None else None,
        jnp.asarray(0.0 if mu is None else float(mu), ftype),
        jnp.asarray(max(kt, 1e-30), ftype),
        jnp.asarray(float(eta), ftype),
        jnp.asarray(wts, ftype),
        pmesh.current_mesh(),
    )
    return host_unpack(out)


def rpa_susceptibility(model, qpts, omegas, nk, U, channel="spin",
                       **kwargs):
    """RPA-dressed susceptibility of the Hubbard model
    (spinless-basis models; per-spin chi0):

    ``chi_spin = chi0 (1 - U chi0)^-1``,
    ``chi_charge = chi0 (1 + U chi0)^-1``

    with ``U`` a scalar or per-orbital vector (diagonal vertex).
    Returns (chi_rpa, chi0), each (nq, nomega, norb, norb).
    """
    if model._nspin != 1:
        raise PythtbError(
            "rpa_susceptibility: Hubbard factorization needs a "
            "spinless-basis model"
        )
    if channel not in ("spin", "charge"):
        raise PythtbError("rpa_susceptibility: channel must be spin/charge")
    chi0 = lindhard(model, qpts, omegas, nk, **kwargs)
    norb = chi0.shape[-1]
    Uvec = np.asarray(U, dtype=float)
    if Uvec.ndim == 0:
        Uvec = np.full(norb, float(Uvec))
    sgn = -1.0 if channel == "spin" else 1.0
    eye = np.eye(norb)
    # chi0 @ diag(U): scale columns; (1 - chi0 U)^-1 chi0 ==
    # chi0 (1 - U chi0)^-1 by the standard resummation identity
    denom = eye + sgn * chi0 * Uvec[None, None, None, :]
    chi = np.linalg.solve(denom, chi0)
    return chi, chi0


def stoner_analysis(model, qpts, nk, U=1.0, eta=1e-4, **kwargs):
    """Stoner instability analysis of the paramagnetic state.

    Computes the static per-spin ``chi0(q, 0)``, symmetrizes the RPA
    kernel ``U^1/2 chi0 U^1/2`` and returns per q: its largest
    eigenvalue ``lambda(q)`` (instability at 1), the critical coupling
    ``U_c(q) = U / lambda(q)``, and the critical orbital eigenvector.
    The minimum of ``U_c`` over q is the RPA phase boundary and
    coincides with the self-consistent HF onset on the same k-grid /
    temperature (tested).
    """
    qpts = np.atleast_2d(np.asarray(qpts, dtype=float))
    chi0 = lindhard(model, qpts, [0.0], nk, eta=eta, **kwargs)[:, 0]
    chi0 = 0.5 * (chi0 + np.conj(np.swapaxes(chi0, -1, -2)))
    norb = chi0.shape[-1]
    Uvec = np.asarray(U, dtype=float)
    if Uvec.ndim == 0:
        Uvec = np.full(norb, float(Uvec))
    root = np.sqrt(Uvec)
    kern = root[None, :, None] * chi0 * root[None, None, :]
    lam, vec = np.linalg.eigh(kern)
    lam_max = lam[:, -1].real
    with np.errstate(divide="ignore"):
        uc = np.where(lam_max > 0, Uvec.max() / np.maximum(lam_max, 1e-300),
                      np.inf)
    best = int(np.argmax(lam_max))
    return {
        "lambda": lam_max,
        "U_c": uc,
        "vector": vec[:, :, -1],
        "q_best": qpts[best],
        "U_c_min": float(uc[best]),
    }
