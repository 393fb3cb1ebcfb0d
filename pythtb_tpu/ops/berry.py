"""Fused Berry-phase / Berry-flux engine.

The reference computes Wilson loops with nested Python loops and
recomputes every interior link's overlap matrix twice
(/root/reference/pythtb.py:3798-3865).  Here the whole grid is processed
in one compiled program:

* neighbor overlap matrices for an entire mesh direction in one einsum
  (batched matmul -> MXU);
* plaquette phases from link *determinants*:
  ``det(M1 M2 M3 M4) = det(M1) det(M2) det(M3) det(M4)``, so each link
  det is computed once and shared by its two adjacent plaquettes;
* traced Berry phases from the sum of link det angles
  (``angle(prod z_i) = wrap(sum angle(z_i))`` -- exact modulo 2*pi and
  immune to modulus underflow on long strings), wrapped to match the
  reference branch ``-angle(det(prod))`` (pythtb.py:3829-3831);
* the ``berry_evals`` Wilson-loop path: per-link SVD unitarization
  (pythtb.py:3824-3826) batched over all strings, chained with a
  log-depth associative scan.  Only the final tiny (nocc, nocc) product
  returns to host, where its (non-Hermitian) eigenvalues are taken.

Band selection (``occ``) and axis arrangement happen *inside* the jitted
programs (static arguments), so a device-resident wf_array feeds these
kernels with zero host round-trips.  Wavefunction arrays cross the
host<->device boundary ri-packed (trailing [re, im] axis); see
utils/xfer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.xfer import host_unpack, pack_cplx, unpack_cplx

__all__ = [
    "berry_phase_traced",
    "berry_loop_products",
    "berry_flux_planes",
    "prep_states",
    "plaquette_phases",
]


def _wrap(x):
    """Wrap angle(s) to (-pi, pi] the way jnp.angle would."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def _dets(M):
    """Determinants of (..., S, S); cheap closed forms for S <= 2."""
    S = M.shape[-1]
    if S == 1:
        return M[..., 0, 0]
    if S == 2:
        return M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    return jnp.linalg.det(M)


def _overlap(wa, wb):
    """ovr[..., n, m] = <wa[..., n, :] | wb[..., m, :]> (pythtb.py:3813-3817)."""
    return jnp.einsum(
        "...nf,...mf->...nm", jnp.conj(wa), wb,
        precision=jax.lax.Precision.HIGHEST,
    )


def _link_dets(w):
    """Overlap determinants of nearest-neighbor links along the last two
    grid axes of (..., n0, n1, S, F) states."""
    Dr = _dets(_overlap(w[..., :-1, :, :, :], w[..., 1:, :, :, :]))
    Du = _dets(_overlap(w[..., :, :-1, :, :], w[..., :, 1:, :, :]))
    return Dr, Du


def plaquette_phases(w):
    """Plaquette Berry phases of (..., n0, n1, S, F) states, from link
    determinants (each computed once; the single home of the flux
    orientation convention).  Returns (..., n0-1, n1-1) float."""
    Dr, Du = _link_dets(w)
    return -jnp.angle(
        Dr[..., :, :-1]
        * Du[..., 1:, :]
        * jnp.conj(Dr[..., :, 1:])
        * jnp.conj(Du[..., :-1, :])
    )


def prep_states(wfs_packed, occ, nspin, dim_arr):
    """unpack + select states + flatten orbital/spin -> (grid..., nocc, F).

    Shared by the Berry and position engines."""
    w = unpack_cplx(wfs_packed)  # (grid..., S, norb[, spin])
    if nspin == 2:
        w = w.reshape(w.shape[: dim_arr + 1] + (-1,))
    idx = (slice(None),) * dim_arr + (jnp.asarray(occ, dtype=jnp.int32),)
    return w[idx]


_prep = prep_states


# ---------------------------------------------------------------------------
# Traced Berry phase along strings
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _berry_traced_jit(wfs_packed, occ, dir, nspin, dim_arr):
    w = _prep(wfs_packed, occ, nspin, dim_arr)
    w = jnp.moveaxis(w, dir, 0)  # (L, rest..., nocc, F)
    dets = _dets(_overlap(w[:-1], w[1:]))  # (L-1, rest...)
    ang = jnp.angle(dets)
    return -_wrap(jnp.sum(ang, axis=0)), jnp.min(jnp.abs(dets))


def berry_phase_traced(wfs_packed, occ, dir, nspin, dim_arr):
    """Traced Berry phase of states ``occ`` along grid axis ``dir``.

    wfs_packed: ri-packed (grid..., S, norb[, spin], 2) array (host or
    device).  Returns ``(phases, min_abs_det)``: a float64 array over
    the remaining grid axes, plus the smallest |det| over all link
    overlaps -- near zero the discretized phase is mathematically
    undefined (the occupied subspaces of neighboring points contain
    orthogonal directions) and the caller should warn.
    """
    out, mdet = jax.device_get(  # single d2h round trip for both
        _berry_traced_jit(wfs_packed, tuple(occ), int(dir), nspin, dim_arr)
    )
    return np.asarray(out, dtype=np.float64), float(mdet)


# ---------------------------------------------------------------------------
# Wilson-loop (berry_evals) path
# ---------------------------------------------------------------------------


def _unitarize(M):
    """Polar/SVD unitarization: M -> U V^H with M = U s V^H."""
    U, _, Vh = jnp.linalg.svd(M, full_matrices=False)
    return U @ Vh


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _berry_products_jit(wfs_packed, occ, dir, nspin, dim_arr):
    w = _prep(wfs_packed, occ, nspin, dim_arr)
    w = jnp.moveaxis(w, dir, 0)
    ovr = _overlap(w[:-1], w[1:])  # (L-1, rest..., S, S)
    U, s, Vh = jnp.linalg.svd(ovr, full_matrices=False)
    Wl = U @ Vh  # polar unitarization
    # ordered chain product prd = W_0 @ W_1 @ ... via log-depth scan
    prod = jax.lax.associative_scan(
        lambda a, b: jnp.einsum(
            "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
        ),
        Wl,
    )
    return pack_cplx(prod[-1]), jnp.min(s)


def berry_loop_products(wfs_packed, occ, dir, nspin, dim_arr):
    """Ordered product of unitarized link overlaps along ``dir``
    (the reference's ``prd``, pythtb.py:3824-3826), one (nocc, nocc)
    complex matrix per string, shaped (rest..., nocc, nocc).

    Returns ``(prd, min_singular_value)``; unitarization hides singular
    links (SVD of a singular overlap yields an arbitrary unitary), so
    the smallest singular value over all links is reported for the
    caller to warn on."""
    out, msv = jax.device_get(  # single d2h round trip for both
        _berry_products_jit(wfs_packed, tuple(occ), int(dir), nspin, dim_arr)
    )
    return host_unpack(out), float(msv)


# ---------------------------------------------------------------------------
# Berry flux over planes
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _berry_flux_jit(wfs_packed, occ, d0, d1, nspin, dim_arr, individual):
    w = _prep(wfs_packed, occ, nspin, dim_arr)
    # arrange grid axes as (rest..., d0, d1): matches the reference's
    # transpose + slice loops (pythtb.py:3135-3196)
    w = jnp.moveaxis(w, (d0, d1), (dim_arr - 2, dim_arr - 1))
    Dr, Du = _link_dets(w)
    plaq = -jnp.angle(
        Dr[..., :, :-1]
        * Du[..., 1:, :]
        * jnp.conj(Dr[..., :, 1:])
        * jnp.conj(Du[..., :-1, :])
    )
    mdet = jnp.minimum(jnp.min(jnp.abs(Dr)), jnp.min(jnp.abs(Du)))
    if individual:
        return plaq, mdet  # (rest..., n0-1, n1-1)
    return jnp.sum(plaq, axis=(-2, -1)), mdet  # (rest...)


def berry_flux_planes(wfs_packed, occ, d0, d1, nspin, dim_arr, individual):
    """Plaquette Berry phases (or their plane sums) over the (d0, d1)
    planes of a grid of states.  Returns ``(flux, min_abs_det)`` with
    the smallest link-overlap |det| for the caller's singular-link
    warning."""
    out, mdet = jax.device_get(  # single d2h round trip for both
        _berry_flux_jit(
            wfs_packed, tuple(occ), int(d0), int(d1), nspin, dim_arr, bool(individual)
        )
    )
    return np.asarray(out, dtype=np.float64), float(mdet)
