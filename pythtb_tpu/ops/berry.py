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

Boundary convention: wavefunction arrays cross the host<->device
boundary ri-packed (trailing [re, im] axis); see utils/xfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx

__all__ = [
    "flux_plane_host",
    "berry_phase_traced_host",
    "berry_loop_products_host",
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
    return jnp.einsum("...nf,...mf->...nm", jnp.conj(wa), wb)


# ---------------------------------------------------------------------------
# Berry flux over a plane
# ---------------------------------------------------------------------------


@jax.jit
def _flux_plane_jit(wfs_packed):
    """Plaquette Berry phases on (..., n0, n1, S, F) ri-packed states.

    Returns (..., n0-1, n1-1) float, each entry the reference's
    4-link plaquette loop phase (pythtb.py:3840-3865).
    """
    w = unpack_cplx(wfs_packed)  # (..., n0, n1, S, F)
    # link determinants, each computed once
    Dr = _dets(_overlap(w[..., :-1, :, :, :], w[..., 1:, :, :, :]))  # (...,n0-1,n1)
    Du = _dets(_overlap(w[..., :, :-1, :, :], w[..., :, 1:, :, :]))  # (...,n0,n1-1)
    loop = (
        Dr[..., :, :-1]
        * Du[..., 1:, :]
        * jnp.conj(Dr[..., :, 1:])
        * jnp.conj(Du[..., :-1, :])
    )
    return -jnp.angle(loop)


def flux_plane_host(wfs: np.ndarray) -> np.ndarray:
    """Host wrapper: wfs (..., n0, n1, S, F) complex -> plaquette phases."""
    out = _flux_plane_jit(host_pack(wfs))
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Traced Berry phase along strings
# ---------------------------------------------------------------------------


@jax.jit
def _berry_traced_jit(wfs_packed):
    """Traced Berry phase along axis 0 of (L, B, S, F) ri-packed states.

    Returns (B,) float: -angle(det(prod_links M)) per string, computed as
    the wrapped sum of per-link det angles.
    """
    w = unpack_cplx(wfs_packed)
    ovr = _overlap(w[:-1], w[1:])  # (L-1, B, S, S)
    ang = jnp.angle(_dets(ovr))  # (L-1, B)
    return -_wrap(jnp.sum(ang, axis=0))


def berry_phase_traced_host(wfs: np.ndarray) -> np.ndarray:
    """Host wrapper: wfs (L, B, S, F) complex -> (B,) float64 phases."""
    out = _berry_traced_jit(host_pack(wfs))
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Wilson-loop (berry_evals) path
# ---------------------------------------------------------------------------


def _unitarize(M):
    """Polar/SVD unitarization: M -> U V^H with M = U s V^H."""
    U, _, Vh = jnp.linalg.svd(M, full_matrices=False)
    return U @ Vh


@jax.jit
def _berry_products_jit(wfs_packed):
    """Ordered product of unitarized link overlaps along axis 0.

    wfs (L, B, S, F) ri-packed -> (B, S, S) ri-packed product matrices
    (the reference's ``prd`` at pythtb.py:3824-3826, one per string).
    """
    w = unpack_cplx(wfs_packed)
    ovr = _overlap(w[:-1], w[1:])  # (L-1, B, S, S)
    Wl = _unitarize(ovr)
    # ordered chain product prd = W_0 @ W_1 @ ... via log-depth scan
    prod = jax.lax.associative_scan(lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), Wl)
    return pack_cplx(prod[-1])


def berry_loop_products_host(wfs: np.ndarray) -> np.ndarray:
    """Host wrapper: wfs (L, B, S, F) complex -> (B, S, S) complex products."""
    return host_unpack(_berry_products_jit(host_pack(wfs)))
