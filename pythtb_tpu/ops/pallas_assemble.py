"""Pallas TPU kernel: fused Bloch-phase x pattern matmul H(k) assembly.

The XLA pattern-matmul path (ops/hamiltonian.py) materializes the
per-(k, hopping) phase matrix ``exp(2j*pi*k.rv)`` of shape (B, nhop) in
HBM before the matmul.  For ab-initio-sized hopping tables (Wannier90
silicon: nhop ~ 1200; bigger systems: 10^4+) at large k-batches this
intermediate dominates HBM traffic (e.g. B=10^5, nhop=1200 -> ~1 GB of
phase traffic per solve).

This kernel fuses the pipeline per k-tile entirely in VMEM:

    ang  = 2*pi * k_tile @ rv_chunk^T          (MXU)
    c, s = cos(ang), sin(ang)                  (VPU, never leaves VMEM)
    vr   = c*Re(amp) - s*Im(amp)
    vi   = s*Re(amp) + c*Im(amp)
    Hr  += vr @ (P + P^T)_chunk                (MXU)
    Hi  += vi @ (P - P^T)_chunk                (MXU)

so HBM sees only the inputs once and the (B, norb^2) output.  The
Hermitian-conjugate partner of every hopping is folded into the
symmetric/antisymmetric pattern combinations exactly as in the XLA path.

Scope: nspin=1 models with the dense-pattern representation, float32,
TPU backends.  Everything else falls back to the XLA path; results are
bit-comparable up to transcendental rounding.  Enable/disable with
PYTHTB_TPU_PALLAS=1/0 (default: on, on TPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_available", "assemble_pallas_nspin1"]

# tile sizes: k-batch rows per program, hoppings per inner chunk
TILE_B = 256
CHUNK_H = 512
# keep resident pattern blocks within a VMEM budget
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _enabled() -> bool:
    flag = os.environ.get("PYTHTB_TPU_PALLAS", "1")
    return flag not in ("0", "false", "False")


def pallas_available(static, B: int) -> bool:
    """Can/should this model+batch use the Pallas assembly kernel?"""
    if not _enabled():
        return False
    if jax.default_backend() != "tpu":
        return False
    if static.nspin != 1 or not static.use_pattern or static.nhop == 0:
        return False
    if static.dim_k == 0:
        return False
    # kernel pays off when the phase intermediate is large
    if static.nhop < 128 or B < 512:
        return False
    n2 = static.norb * static.norb
    n2_pad = max(128, -(-n2 // 128) * 128)
    nhop_pad = -(-static.nhop // CHUNK_H) * CHUNK_H
    # resident VMEM: two pattern blocks + rv + amps (f32)
    resident = 2 * CHUNK_H * n2_pad * 4 + nhop_pad * (static.dim_k + 2) * 4
    per_tile = TILE_B * (2 * n2_pad + 2 * CHUNK_H) * 4
    return resident + per_tile < VMEM_BUDGET_BYTES


def _kernel(nchunks, dim_k, k_ref, rv_ref, amps_ref, psym_ref, pasym_ref, hr_ref, hi_ref):
    from jax.experimental import pallas as pl  # noqa: F401  (doc import)

    kt = k_ref[:]  # (TILE_B, dim_k)
    acc_r = jnp.zeros(hr_ref.shape, dtype=jnp.float32)
    acc_i = jnp.zeros(hi_ref.shape, dtype=jnp.float32)
    two_pi = jnp.float32(2.0 * np.pi)
    for c in range(nchunks):
        sl = slice(c * CHUNK_H, (c + 1) * CHUNK_H)
        rv_c = rv_ref[sl, :]  # (CHUNK_H, dim_k)
        ang = two_pi * jax.lax.dot_general(
            kt, rv_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TILE_B, CHUNK_H)
        cc = jnp.cos(ang)
        ss = jnp.sin(ang)
        ar = amps_ref[sl, 0][None, :]
        ai = amps_ref[sl, 1][None, :]
        vr = cc * ar - ss * ai
        vi = ss * ar + cc * ai
        acc_r = acc_r + jax.lax.dot_general(
            vr, psym_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc_i = acc_i + jax.lax.dot_general(
            vi, pasym_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    hr_ref[:] = acc_r
    hi_ref[:] = acc_i


@functools.partial(jax.jit, static_argnums=(0,))
def _prep_padded(static, data):
    """Pad hopping-table arrays to kernel tile multiples (zero-amp rows
    are exact no-ops) and build the sym/antisym pattern combinations."""
    n = static.norb
    nhop = static.nhop
    nhop_pad = -(-nhop // CHUNK_H) * CHUNK_H
    n2 = n * n
    n2_pad = max(128, -(-n2 // 128) * 128)

    rv = jnp.asarray(data.rv, jnp.float32)
    amps = jnp.asarray(data.amps, jnp.float32)  # (nhop, 2) ri
    P = jnp.asarray(data.pattern, jnp.float32)
    PT = P.reshape(nhop, n, n).transpose(0, 2, 1).reshape(nhop, n2)
    psym = P + PT
    pasym = P - PT

    rv = jnp.pad(rv, ((0, nhop_pad - nhop), (0, 0)))
    amps = jnp.pad(amps, ((0, nhop_pad - nhop), (0, 0)))
    psym = jnp.pad(psym, ((0, nhop_pad - nhop), (0, n2_pad - n2)))
    pasym = jnp.pad(pasym, ((0, nhop_pad - nhop), (0, n2_pad - n2)))
    return rv, amps, psym, pasym


def assemble_pallas_nspin1(static, data, kpts, diag, interpret=False):
    """Fused assembly for an nspin=1 model.

    kpts: (B, dim_k) float device array (inside jit).  Returns
    (B, norb, norb) complex Hermitian H including the site-energy
    diagonal.  ``interpret=True`` runs the kernel in the Pallas
    interpreter (for CPU-side validation of the kernel logic).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import config

    n = static.norb
    n2 = n * n
    B = kpts.shape[0]
    B_pad = -(-B // TILE_B) * TILE_B
    rv, amps, psym, pasym = _prep_padded(static, data)
    nhop_pad, n2_pad = rv.shape[0], psym.shape[1]
    nchunks = nhop_pad // CHUNK_H

    k32 = jnp.pad(jnp.asarray(kpts, jnp.float32), ((0, B_pad - B), (0, 0)))

    kernel = functools.partial(_kernel, nchunks, static.dim_k)
    hr, hi = pl.pallas_call(
        kernel,
        grid=(B_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, static.dim_k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhop_pad, static.dim_k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhop_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhop_pad, n2_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhop_pad, n2_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, n2_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, n2_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, n2_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, n2_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * nhop_pad * (static.dim_k + 2 * n2_pad),
            bytes_accessed=B_pad * (2 * n2_pad + static.dim_k) * 4
            + nhop_pad * (2 * n2_pad + static.dim_k + 2) * 4,
            transcendentals=2 * B_pad * nhop_pad,
        ),
        interpret=interpret,
    )(k32, rv, amps, psym, pasym)

    ftype = config.float_dtype()
    H = jax.lax.complex(
        jnp.asarray(hr[:B, :n2], ftype), jnp.asarray(hi[:B, :n2], ftype)
    ).reshape(B, n, n)
    return H + diag[None]
