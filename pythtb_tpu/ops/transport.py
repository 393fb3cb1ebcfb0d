"""Parallel transport, smooth gauges, and adiabatic state following.

Two upstream PythTB wish-list features the reference never implemented
(/root/reference/notes/TODO:17-20 "smoothen the gauge according to the
MV 1997 paper", :46-48 "In wf_array allow for adiabatic evolution ...
which states do you end up with?"), built TPU-first:

* :func:`smooth_gauge` -- the twisted parallel-transport gauge of
  Marzari & Vanderbilt 1997 along one grid axis.  The key identity
  makes it a *log-depth* program instead of a sequential sweep: if
  ``W_m`` is the polar-unitarized link overlap ``<w_m|w_{m+1}>`` in the
  ORIGINAL gauge, the cumulative chain ``C_m = W_0 @ ... @ W_{m-1}``
  (one ``associative_scan``) gives the parallel-transport rotation
  directly, ``w'_m = conj(C_m) @ w_m``; the closed-loop holonomy
  ``Lambda = C_{L-1}`` is then distributed evenly along the axis via
  fractional powers ``Lambda^{m/(L-1)}`` (one unitary eigendecomposition,
  :func:`..ops.berry.unitary_eig`).

* :func:`follow_states` -- adiabatic evolution of a chosen initial
  subspace along a parameter axis: at each step the ``nocc`` states
  with maximal squared overlap against the transported subspace are
  selected (``lax.top_k``: data-dependent *values*, static shapes) and
  the subspace is re-orthonormalized by polar projection.  Returns the
  followed band indices, a per-step adiabatic fidelity (the fraction of
  the subspace captured; < 1 signals Landau-Zener leakage through a
  small gap), and the followed states in a smooth gauge.  The sweep is
  a ``lax.scan`` along the parameter axis, batched over all remaining
  grid axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.xfer import pack_cplx, unpack_cplx
from .berry import _overlap, _unitarize, unitary_eig  # noqa: F401 (_unitarize used below)

__all__ = ["smooth_gauge", "follow_states"]


def _flat_states(w, nspin, dim_arr):
    """(grid..., S, norb[, spin]) -> (grid..., S, F)."""
    if nspin == 2:
        return w.reshape(w.shape[: dim_arr + 1] + (-1,))
    return w


_MM = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _smooth_gauge_jit(wfs_packed, occ, dir, nspin, dim_arr, closed):
    w_full = unpack_cplx(wfs_packed)  # (grid..., S, norb[, spin])
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)
    sel = (slice(None),) * dim_arr + (occ_idx,)
    w = _flat_states(w_full[sel], nspin, dim_arr)  # (grid..., nocc, F)
    wm = jnp.moveaxis(w, dir, 0)  # (L, rest..., nocc, F)
    L = wm.shape[0]

    ovr = _overlap(wm[:-1], wm[1:])  # (L-1, rest..., nocc, nocc)
    U, sing, Vh = jnp.linalg.svd(ovr, full_matrices=False)
    Wl = _MM(U, Vh)  # polar unitarization
    C = jax.lax.associative_scan(lambda a, b: _MM(a, b), Wl)
    eye = jnp.broadcast_to(jnp.eye(Wl.shape[-1], dtype=Wl.dtype), Wl.shape[1:])
    B = jnp.concatenate([eye[None], C], axis=0)  # B[m] = C_m, B[0] = I

    if closed and L > 1:
        lam = B[-1]  # holonomy over the closed axis
        theta, P = unitary_eig(lam)
        t = (jnp.arange(L) / (L - 1)).reshape((L,) + (1,) * (theta.ndim))
        # Lambda^{-t} = P diag(e^{-i theta t}) P^H, one per grid point
        ph = jnp.exp(-1.0j * theta[None] * t)  # (L, rest..., nocc)
        lam_t = _MM(P[None] * ph[..., None, :], jnp.conj(jnp.swapaxes(P, -1, -2))[None])
        B = _MM(B, lam_t)

    # new state rows are combinations of the old ones: w'_m = conj(B_m) w_m
    new = jnp.einsum(
        "l...nm,l...mf->l...nf", jnp.conj(B), wm, precision=jax.lax.Precision.HIGHEST
    )
    new = jnp.moveaxis(new, 0, dir)
    if nspin == 2:
        new = new.reshape(new.shape[:-1] + (w_full.shape[-2], 2))
    w_full = w_full.at[sel].set(new)
    return pack_cplx(w_full), jnp.min(sing)


def smooth_gauge(wfs_packed, occ, dir, nspin, dim_arr, closed):
    """Impose the (twisted) parallel-transport gauge on states ``occ``
    along grid axis ``dir``; see module docstring.  Returns the full
    updated ri-packed state array (device) and the smallest link
    singular value (for singular-overlap warnings)."""
    packed, min_s = _smooth_gauge_jit(
        wfs_packed, tuple(int(o) for o in occ), int(dir), nspin, dim_arr, bool(closed)
    )
    return packed, float(jax.device_get(min_s))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _follow_states_jit(wfs_packed, occ, dir, nspin, dim_arr):
    w_full = unpack_cplx(wfs_packed)
    w = _flat_states(w_full, nspin, dim_arr)  # (grid..., S, F)
    wm = jnp.moveaxis(w, dir, 0)  # (L, rest..., S, F)
    nocc = len(occ)
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)

    f0 = wm[0][..., occ_idx, :]  # (rest..., nocc, F)
    idx0 = jnp.broadcast_to(occ_idx, f0.shape[:-1])

    def step(f, wl):
        # wl: (rest..., S, F); f: (rest..., nocc, F) transported states
        ovr = _overlap(f, wl)  # (rest..., nocc, S)
        weight = jnp.sum(jnp.abs(ovr) ** 2, axis=-2)  # (rest..., S)
        topw, topi = jax.lax.top_k(weight, nocc)
        topi = jnp.sort(topi, axis=-1)
        wsel = jnp.take_along_axis(wl, topi[..., None], axis=-2)
        M = jnp.take_along_axis(ovr, topi[..., None, :], axis=-1)
        fnew = jnp.einsum(
            "...nm,...mf->...nf",
            jnp.conj(_unitarize(M)),
            wsel,
            precision=jax.lax.Precision.HIGHEST,
        )
        fidelity = jnp.sum(topw, axis=-1) / nocc
        return fnew, (topi, fidelity, fnew)

    _, (idx, fid, states) = jax.lax.scan(step, f0, wm[1:])
    idx = jnp.concatenate([idx0[None].astype(idx.dtype), idx], axis=0)
    states = jnp.concatenate([f0[None], states], axis=0)  # (L, rest..., nocc, F)
    states = jnp.moveaxis(states, 0, dir)
    if nspin == 2:
        states = states.reshape(states.shape[:-1] + (w_full.shape[-2], 2))
    return idx, fid, pack_cplx(states)


def follow_states(wfs_packed, occ, dir, nspin, dim_arr):
    """Adiabatically follow the subspace spanned by stored states
    ``occ`` along grid axis ``dir``; see module docstring.

    Returns ``(indices, fidelity, states_packed)``: the followed
    stored-state indices (L, rest..., nocc) with the axis moved to the
    front, the per-step captured subspace fraction (L-1, rest...), and
    the followed states (grid-shaped, nocc states per point, ri-packed,
    device-resident)."""
    idx, fid, states = _follow_states_jit(
        wfs_packed, tuple(int(o) for o in occ), int(dir), nspin, dim_arr
    )
    idx, fid = jax.device_get((idx, fid))  # one round trip for both
    return np.asarray(idx), np.asarray(fid, dtype=np.float64), states
