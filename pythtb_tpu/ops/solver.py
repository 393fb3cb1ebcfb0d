"""Jitted end-to-end k-batch solver: assemble H(k) -> diagonalize.

This is the compiled replacement for the reference's hot loop
``solve_all`` (/root/reference/pythtb.py:955-1079, loop at 1047): one
traced program handles the whole k-batch, optionally sharded over a
device mesh (pure data parallelism over k; see
:mod:`pythtb_tpu.parallel.mesh`).

Host-facing entry points accept/return NumPy (complex eigenvectors are
ri-packed across the device boundary and re-joined on host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..core import BlochData, ModelStatic
from ..parallel import mesh as pmesh
from ..utils.xfer import host_unpack, pack_cplx
from .eigh import eigh_batched, eigvalsh_batched
from .hamiltonian import assemble

__all__ = ["solve_kpts", "hamiltonian_kpts"]


@partial(jax.jit, static_argnums=(0,))
def _ham_jit(static: ModelStatic, data: BlochData, kpts):
    return pack_cplx(assemble(static, data, kpts))


@partial(jax.jit, static_argnums=(0,))
def _solve_vals_jit(static: ModelStatic, data: BlochData, kpts):
    H = assemble(static, data, kpts)
    return eigvalsh_batched(H)


@partial(jax.jit, static_argnums=(0,))
def _solve_vecs_jit(static: ModelStatic, data: BlochData, kpts):
    H = assemble(static, data, kpts)
    w, v = eigh_batched(H)  # v: (B, nsta, nsta) rows = states
    if static.nspin == 2:
        v = v.reshape(v.shape[0], static.nsta, static.norb, 2)
    return w, pack_cplx(v)


def _prep_kpts(static: ModelStatic, k_list, mesh):
    """Validate/convert the k-list; pad the batch for sharding."""
    if static.dim_k == 0:
        kpts = np.zeros((1, 0), dtype=np.float64)
    else:
        kpts = np.asarray(k_list, dtype=np.float64)
        if kpts.ndim == 1:
            kpts = kpts[:, None] if static.dim_k == 1 else kpts[None, :]
        if kpts.shape[1] != static.dim_k:
            raise ValueError(
                "k-vectors have wrong dimension: expected dim_k=%d, got %d"
                % (static.dim_k, kpts.shape[1])
            )
    nkp = kpts.shape[0]
    pad = 0
    if mesh is not None:
        nd = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        padded = pmesh.pad_to_multiple(max(nkp, 1), nd)
        pad = padded - nkp
        if pad:
            kpts = np.concatenate([kpts, np.tile(kpts[-1:], (pad, 1))], axis=0)
    return pmesh.shard_batch(kpts, mesh), nkp, pad


def hamiltonian_kpts(static: ModelStatic, data: BlochData, k_list, mesh=None):
    """Host API: dense H(k) for a k-list -> (nkp, nsta, nsta) complex128."""
    if mesh is None:
        mesh = pmesh.current_mesh()
    kpts, nkp, _ = _prep_kpts(static, k_list, mesh)
    H = host_unpack(_ham_jit(static, data, kpts))
    return H[:nkp]


def solve_kpts(static: ModelStatic, data: BlochData, k_list, eig_vectors=False, mesh=None):
    """Host API: batched solve.

    Returns (internal layout, k-batch leading):
      eval: (nkp, nsta) float64
      evec: (nkp, nsta, norb[,2]) complex128   [if eig_vectors]
    """
    if mesh is None:
        mesh = pmesh.current_mesh()
    kpts, nkp, _ = _prep_kpts(static, k_list, mesh)
    if not eig_vectors:
        w = np.asarray(_solve_vals_jit(static, data, kpts), dtype=np.float64)
        return w[:nkp]
    w, v = _solve_vecs_jit(static, data, kpts)
    w = np.asarray(w, dtype=np.float64)[:nkp]
    v = host_unpack(v)[:nkp]
    return w, v
