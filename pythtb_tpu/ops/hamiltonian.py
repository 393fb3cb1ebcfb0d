"""Batched Bloch-Hamiltonian assembly.

Replaces the reference's per-k, per-hopping Python loop
(/root/reference/pythtb.py:874-925) with a single batched XLA program:

* phases for a whole k-batch at once:
  ``ang = 2*pi * k @ rv^T`` -> ``(B, nhop)`` (pythtb.py:916 vectorized);
* assembly either as an MXU-friendly dense matmul against a one-hot
  "pattern" matrix (the default; turns sparse accumulation into
  ``(B, nhop) @ (nhop, norb^2)``), or as a scatter-add for very large
  models where the pattern would not fit;
* the Hermitian-conjugate partner of every hopping is added exactly as
  the reference does (pythtb.py:918-924).

All inputs/outputs at this level are device complex; marshalling to
ri-packed floats happens in the solver wrappers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..core import BlochData, ModelStatic
from ..utils.xfer import unpack_cplx

__all__ = ["assemble"]


def _phases(static: ModelStatic, rv, kpts):
    """Per-(k, hopping) Bloch phase factors exp(2j*pi*k.rv), (B, nhop)."""
    ftype = config.float_dtype()
    if static.dim_k == 0 or static.nhop == 0:
        B = kpts.shape[0]
        ones = jnp.ones((B, static.nhop), dtype=ftype)
        return jax.lax.complex(ones, jnp.zeros_like(ones))
    ang = (2.0 * np.pi) * jnp.dot(
        jnp.asarray(kpts, ftype), jnp.asarray(rv, ftype).T,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, nhop)
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def assemble(static: ModelStatic, data: BlochData, kpts):
    """Assemble H(k) for a k-batch.

    Parameters
    ----------
    kpts : (B, dim_k) float device array, reduced coordinates.

    Returns
    -------
    (B, nsta, nsta) complex device array, Hermitian.  For nspin=2 the
    basis ordering is (orb0_up, orb0_dn, orb1_up, ...), i.e. the
    reference's (norb,2,norb,2) tensor flattened (pythtb.py:933).
    """
    ctype = config.complex_dtype()
    B = kpts.shape[0]
    n = static.norb
    nsta = static.nsta

    diag = unpack_cplx(jnp.asarray(data.diag))  # (nsta, nsta)

    if static.nhop == 0:
        return jnp.broadcast_to(diag, (B, nsta, nsta)).astype(ctype)

    ph = _phases(static, data.rv, kpts)  # (B, nhop) complex
    amps = unpack_cplx(jnp.asarray(data.amps))  # (nhop,) or (nhop,2,2)

    if static.nspin == 1:
        vals = ph * amps[None, :]  # (B, nhop)
        if static.use_pattern:
            P = jnp.asarray(data.pattern, config.float_dtype())  # (nhop, n*n)
            PT = P.reshape(static.nhop, n, n).transpose(0, 2, 1).reshape(
                static.nhop, n * n
            )
            # vals @ P + conj(vals) @ PT, done as two *real* matmuls:
            #   Re part couples to (P + PT), Im part to (P - PT).
            Hr = jnp.dot(jnp.real(vals), P + PT, precision=jax.lax.Precision.HIGHEST)
            Hi = jnp.dot(jnp.imag(vals), P - PT, precision=jax.lax.Precision.HIGHEST)
            H = jax.lax.complex(Hr, Hi).reshape(B, n, n)
        else:
            H = jnp.zeros((B, n, n), dtype=ctype)
            H = H.at[:, data.ii, data.jj].add(vals)
            H = H.at[:, data.jj, data.ii].add(jnp.conj(vals))
        return H + diag[None]

    # ---- nspin == 2 ---------------------------------------------------
    vals = ph[:, :, None, None] * amps[None]  # (B, nhop, 2, 2)
    if static.use_pattern:
        P = jnp.asarray(data.pattern, config.float_dtype())
        PT = P.reshape(static.nhop, n, n).transpose(0, 2, 1).reshape(
            static.nhop, n * n
        )
        Pc = jnp.asarray(P, ctype)
        PTc = jnp.asarray(PT, ctype)
        # direct term lands at (i, j) with spin block [s, t];
        # conjugate term lands at (j, i) with spin block conj^T.
        Hdir = jnp.einsum("bhst,hp->bpst", vals, Pc, precision=jax.lax.Precision.HIGHEST)
        Hcj = jnp.einsum("bhst,hp->bpts", jnp.conj(vals), PTc, precision=jax.lax.Precision.HIGHEST)
        Hblk = (Hdir + Hcj).reshape(B, n, n, 2, 2)
    else:
        Hblk = jnp.zeros((B, n, n, 2, 2), dtype=ctype)
        Hblk = Hblk.at[:, data.ii, data.jj].add(vals)
        Hblk = Hblk.at[:, data.jj, data.ii].add(
            jnp.conj(jnp.swapaxes(vals, -1, -2))
        )
    # (B, i, j, s, t) -> (B, i, s, j, t) -> (B, 2n, 2n)
    H = Hblk.transpose(0, 1, 3, 2, 4).reshape(B, nsta, nsta)
    return H + diag[None]
