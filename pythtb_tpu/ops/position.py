"""Position-operator matrix elements and hybrid Wannier functions.

Batched device equivalents of the reference's per-k loops
(/root/reference/pythtb.py:2034-2279): with the diagonal-position
approximation, ``X[n, m] = sum_f conj(u_n[f]) * pos[f] * u_m[f]``
(pythtb.py:2091-2107), its diagonal is the position expectation, and its
eigen-decomposition gives hybrid-Wannier centers/functions
(pythtb.py:2243-2277).  All functions broadcast over arbitrary leading
(grid) axes.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

import jax.numpy as jnp

from ..utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx
from .eigh import eigh_batched, eigvalsh_batched

__all__ = [
    "position_matrix_host",
    "position_hwf_host",
    "position_matrix_packed",
    "position_expectation_packed",
    "position_hwf_packed",
]


def _xmat(w, pos):
    """w (..., nb, F) complex, pos (F,) float -> X (..., nb, nb) complex."""
    return jnp.einsum(
        "...nf,f,...mf->...nm", jnp.conj(w), pos.astype(w.dtype), w,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def _pos_matrix_jit(wfs_packed, pos):
    return pack_cplx(_xmat(unpack_cplx(wfs_packed), pos))


def _hwf_core(w, pos, want_evec, orbital_basis):
    """Shared HWF body: X-matrix, eigendecomposition, optional
    orbital-basis back-transform (pythtb.py:2243-2277)."""
    X = _xmat(w, pos)
    if not want_evec:
        return eigvalsh_batched(X)
    hwfc, hwf = eigh_batched(X)  # hwf rows are states (ascending centers)
    if orbital_basis:
        # express each HWF on the orbital basis: hwf_orb[h] = sum_b hwf[h,b] u_b
        # (pythtb.py:2262-2277)
        hwf = jnp.einsum(
            "...hb,...bf->...hf", hwf, w, precision=jax.lax.Precision.HIGHEST
        )
    return hwfc, pack_cplx(hwf)


@partial(jax.jit, static_argnums=(2, 3))
def _pos_hwf_jit(wfs_packed, pos, want_evec, orbital_basis):
    return _hwf_core(unpack_cplx(wfs_packed), pos, want_evec, orbital_basis)


def _prep_states(wfs_packed, occ, nspin, dim_arr):
    from .berry import prep_states

    return prep_states(wfs_packed, occ, nspin, dim_arr)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _pos_matrix_packed_jit(wfs_packed, pos, occ, nspin, dim_arr):
    w = _prep_states(wfs_packed, occ, nspin, dim_arr)
    return pack_cplx(_xmat(w, pos))


@partial(jax.jit, static_argnums=(2, 3, 4))
def _pos_expectation_packed_jit(wfs_packed, pos, occ, nspin, dim_arr):
    w = _prep_states(wfs_packed, occ, nspin, dim_arr)
    # only the diagonal of X is needed: reduce ON DEVICE so just
    # (mesh..., nocc) floats cross the boundary (the full matrix is
    # nocc x larger, significant on tunneled runtimes)
    return jnp.real(
        jnp.einsum(
            "...nf,f,...nf->...n", jnp.conj(w), pos.astype(w.dtype), w,
            precision=jax.lax.Precision.HIGHEST,
        )
    )


def position_expectation_packed(wfs_packed, pos, occ, nspin, dim_arr):
    """Grid-batched position expectations (device-reduced diagonal)."""
    out = _pos_expectation_packed_jit(
        wfs_packed, jnp.asarray(pos), occ, nspin, dim_arr
    )
    return np.asarray(out, dtype=np.float64)


def position_matrix_packed(wfs_packed, pos, occ, nspin, dim_arr):
    """Grid-batched position matrices from (device) packed storage."""
    out = _pos_matrix_packed_jit(
        wfs_packed, jnp.asarray(pos), occ, nspin, dim_arr
    )
    return host_unpack(out)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _pos_hwf_packed_jit(wfs_packed, pos, occ, nspin, dim_arr, want_evec, orbital_basis):
    w = _prep_states(wfs_packed, occ, nspin, dim_arr)
    return _hwf_core(w, pos, want_evec, orbital_basis)


def position_hwf_packed(wfs_packed, pos, occ, nspin, dim_arr, want_evec, orbital_basis):
    """Grid-batched hybrid-Wannier centers/functions from packed storage."""
    out = _pos_hwf_packed_jit(
        wfs_packed, jnp.asarray(pos), occ, nspin, dim_arr,
        bool(want_evec), bool(orbital_basis),
    )
    if not want_evec:
        return np.asarray(out, dtype=np.float64)
    hwfc, hwf = jax.device_get(out)  # one d2h round trip for both
    return np.asarray(hwfc, dtype=np.float64), host_unpack(hwf)


def position_matrix_host(wfs: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Host wrapper.  wfs (..., nb, F) complex, pos (F,) -> (..., nb, nb)."""
    return host_unpack(_pos_matrix_jit(host_pack(wfs), np.asarray(pos, np.float64)))


def position_hwf_host(wfs, pos, want_evec=False, orbital_basis=False):
    """Host wrapper for hybrid-Wannier centers (and functions)."""
    pos = np.asarray(pos, np.float64)
    if not want_evec:
        out = _pos_hwf_jit(host_pack(wfs), pos, False, False)
        return np.asarray(out, dtype=np.float64)
    hwfc, hwf = jax.device_get(  # one d2h round trip for both
        _pos_hwf_jit(host_pack(wfs), pos, True, bool(orbital_basis))
    )
    return np.asarray(hwfc, dtype=np.float64), host_unpack(hwf)
