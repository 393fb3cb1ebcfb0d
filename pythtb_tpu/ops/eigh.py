"""Batched Hermitian eigensolvers.

The reference calls LAPACK per k-point inside a Python loop
(/root/reference/pythtb.py:927-953).  Here the entire k-batch is
diagonalized in one compiled call:

* ``nsta == 1``: trivial.
* ``nsta == 2``: closed-form Hermitian 2x2 eigendecomposition.  This is
  pure VPU element-wise math (no iterative factorization), which is the
  speed-of-light path for the dominant 2-band workloads (Haldane &c).
* otherwise: ``jnp.linalg.eigh`` vmapped over the batch (XLA's QDWH /
  divide-and-conquer on device).

Eigenvalues are returned ascending with eigenvectors as *rows*
(``v[b, s, :]`` is the s-th state), matching the reference's
``_nicefy_eig`` + transpose semantics (pythtb.py:944-947, 3765-3775).
Note ``jnp.linalg.eigh`` already sorts ascending, so the reference's
argsort is the identity here.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config

__all__ = ["eigh_batched", "eigvalsh_batched"]


def _eig2_analytic(H, want_vectors):
    """Closed-form eigendecomposition of a batch of 2x2 Hermitian matrices.

    H: (..., 2, 2) complex.  Returns (w, v) with w ascending and v rows
    as states, or w alone.
    """
    ftype = config.float_dtype()
    a = jnp.real(H[..., 0, 0])
    b = jnp.real(H[..., 1, 1])
    c = H[..., 0, 1]
    mid = 0.5 * (a + b)
    delta = 0.5 * (a - b)
    absc = jnp.abs(c)
    r = jnp.hypot(delta, absc)
    w = jnp.stack([mid - r, mid + r], axis=-1).astype(ftype)
    if not want_vectors:
        return w

    # Eigenvector for the + branch, choosing the numerically stable form
    # based on the sign of delta (avoids catastrophic cancellation):
    #   delta >= 0:  v+ ~ [delta + r, conj(c)]
    #   delta <  0:  v+ ~ [c, r - delta]
    ctype = config.complex_dtype()
    pos = delta >= 0
    p = jnp.where(pos, (delta + r).astype(ctype), c)
    q = jnp.where(pos, jnp.conj(c), (r - delta).astype(ctype))
    nrm = jnp.sqrt(jnp.abs(p) ** 2 + jnp.abs(q) ** 2)
    # Exactly degenerate (r == 0): any orthonormal basis; use identity.
    degen = nrm == 0
    safe = jnp.where(degen, jnp.ones_like(nrm), nrm).astype(ctype)
    p = jnp.where(degen, jnp.ones_like(p), p / safe)
    q = jnp.where(degen, jnp.zeros_like(q), q / safe)
    # v- = [-conj(q), conj(p)] is orthonormal to v+.
    v_minus = jnp.stack([-jnp.conj(q), jnp.conj(p)], axis=-1)
    v_plus = jnp.stack([p, q], axis=-1)
    v = jnp.stack([v_minus, v_plus], axis=-2)  # rows are states; ascending
    return w, v


def eigh_batched(H):
    """(w, v): ascending eigenvalues and row-eigenvectors of (..., m, m)."""
    m = H.shape[-1]
    if m == 1:
        w = jnp.real(H[..., 0, 0])[..., None].astype(config.float_dtype())
        v = jnp.ones_like(H)
        return w, v
    if m == 2:
        return _eig2_analytic(H, True)
    w, v = jnp.linalg.eigh(H)
    return w.astype(config.float_dtype()), jnp.swapaxes(v, -1, -2)


def eigvalsh_batched(H):
    m = H.shape[-1]
    if m == 1:
        return jnp.real(H[..., 0, 0])[..., None].astype(config.float_dtype())
    if m == 2:
        return _eig2_analytic(H, False)
    return jnp.linalg.eigvalsh(H).astype(config.float_dtype())
