"""Jitted end-to-end k-batch solvers: assemble H(k) -> diagonalize.

This is the compiled replacement for the reference's hot loop
``solve_all`` (/root/reference/pythtb.py:955-1079, loop at 1047) and for
``wf_array.solve_on_grid``'s nested loops (pythtb.py:2472-2527): one
traced program handles the whole k-batch / k-grid, optionally sharded
over a device mesh (pure data parallelism over k; see
:mod:`pythtb_tpu.parallel.mesh`).

Two families:

* ``solve_kpts`` / ``hamiltonian_kpts`` -- arbitrary host-provided
  k-lists (bands along paths, user meshes);
* ``solve_grid_device`` -- uniform BZ grids built **on device** from
  iota (only scalars cross the host boundary) with the periodic-gauge
  boundary slices appended in-program; feeds device-resident wf_array
  storage with zero host round-trips.

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
from ..utils.xfer import host_unpack, pack_cplx, unpack_cplx
from .eigh import eigh_batched, eigvalsh_batched
from .hamiltonian import assemble

__all__ = ["solve_kpts", "hamiltonian_kpts", "solve_grid_device", "device_uniform_grid", "extend_pbc_seq"]


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
        if k_list is not None:
            raise ValueError(
                "k-vector of wrong shape: this model has dim_k=0 "
                "(no k-points should be provided)"
            )
        kpts = np.zeros((1, 0), dtype=np.float64)
    elif k_list is None:
        raise ValueError("Have to provide a k-vector (model has dim_k=%d)!" % static.dim_k)
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
    w, v = jax.device_get(  # one d2h round trip for both outputs
        _solve_vecs_jit(static, data, kpts)
    )
    w = np.asarray(w, dtype=np.float64)[:nkp]
    v = host_unpack(v)[:nkp]
    return w, v


# ---------------------------------------------------------------------------
# Device-built uniform grids with periodic-gauge extension
# ---------------------------------------------------------------------------


def device_uniform_grid(shape, start, denoms=None):
    """Uniform grid built on device from iota: point[i_1..i_d, d] =
    i_d / denoms[d] + start[d].  Only ``start`` crosses the host
    boundary (shipping 2*B floats through a tunneled runtime would
    dominate wall time)."""
    ftype = config.float_dtype()
    if denoms is None:
        denoms = shape
    cols = []
    for d in range(len(shape)):
        ax = jax.lax.broadcasted_iota(ftype, tuple(shape), d)
        cols.append(ax / float(denoms[d]) + start[d])
    return jnp.stack([c.reshape(-1) for c in cols], axis=-1)


def extend_pbc_seq(w, phases):
    """Append the wrapped-around boundary slice per grid dimension with
    periodic-gauge phases, sequentially in dimension order (matching
    wf_array.solve_on_grid + impose_pbc; reference pythtb.py:2472-2527,
    2728-2747).  ``phases[d]`` broadcasts against the trailing
    orbital(/spin) axes."""
    for d in range(len(phases)):
        first = jax.lax.slice_in_dim(w, 0, 1, axis=d)
        w = jnp.concatenate([w, first * phases[d]], axis=d)
    return w


def shard_axis(x, mesh, axis):
    """Constrain a device value to be sharded over ``mesh``'s first axis
    along dimension ``axis``, replicated elsewhere.  In-jit GSPMD
    annotation: no host data moves; XLA inserts the resharding (and any
    later halo exchanges) on ICI."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = [None] * x.ndim
    spec[axis] = mesh.axis_names[0]
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*spec))
    )


def shard_grid_axis0(x, mesh):
    """Shard the leading (grid/batch) axis over the mesh; see
    :func:`shard_axis`."""
    return shard_axis(x, mesh, 0)


def _solve_grid_core(static: ModelStatic, data: BlochData, interior, start, phases_ri, mesh=None):
    """Solve on a uniform grid of shape ``interior`` (per-dim sizes
    n_d - 1) anchored at ``start``, then append the wrapped boundary
    slice per dimension with periodic-gauge phases, sequentially in
    dimension order (matching wf_array.solve_on_grid + impose_pbc;
    reference pythtb.py:2472-2527, 2728-2747).

    With a (static, hashable) ``mesh``, the k-batch -- built on device
    from iota, so nothing but scalars crosses the host boundary -- is
    sharded over the mesh's first axis, and so is the leading grid axis
    of the stored states; gauge fixups and the gap reduction stay
    in-program (GSPMD inserts the collectives).

    Returns (min_gaps (nsta-1,) float, evals (*mesh, nsta),
    wfs_packed (*mesh, nsta, norb[,spin], 2)).
    """
    kpts = device_uniform_grid(tuple(interior), start)  # (B, dim)
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    H = assemble(static, data, kpts)
    evals, v = eigh_batched(H)  # (B, nsta), (B, nsta, nsta)
    if static.nspin == 2:
        v = v.reshape(v.shape[0], static.nsta, static.norb, 2)
    w = v.reshape(tuple(interior) + v.shape[1:])
    if mesh is not None:
        # re-anchor the sharding on the leading grid axis after the
        # batch -> grid reshape
        w = shard_grid_axis0(w, mesh)

    phases = unpack_cplx(phases_ri)  # (dim, norb[, spin])
    w = extend_pbc_seq(w, [phases[d] for d in range(len(interior))])
    # band energies on the full grid (boundary = periodic copy of the
    # first slice); stays on device until wf_array.energies is read
    eg = evals.reshape(tuple(interior) + (static.nsta,))
    for d in range(len(interior)):
        first = eg[(slice(None),) * d + (slice(0, 1),)]
        eg = jnp.concatenate([eg, first], axis=d)
    # minimum direct gaps, reduced on device (only nsta-1 floats leave)
    if static.nsta > 1:
        min_gaps = jnp.min(evals[:, 1:] - evals[:, :-1], axis=0)
    else:
        min_gaps = jnp.zeros((0,), evals.dtype)
    return min_gaps, eg, pack_cplx(w)


_solve_grid_jit = partial(jax.jit, static_argnums=(0, 2, 5))(_solve_grid_core)


@partial(jax.jit, static_argnums=(0, 2))
def _solve_grid_family_jit(static: ModelStatic, datas: BlochData, interior, start, phases_ri):
    """Family variant: ``datas`` is a BlochData pytree whose leaves carry
    a leading lambda axis (one model per parameter value, identical
    static shape); the whole lambda x k-grid solve is one vmapped
    program.  Returns per-lambda (min_gaps, evals, wfs_packed) with the
    lambda axis leading."""
    return jax.vmap(
        lambda d: _solve_grid_core(static, d, interior, start, phases_ri)
    )(datas)


def _grid_phases(interior, orb, per, nspin):
    """Periodic-gauge boundary phases, ri-packed, one row per grid dim."""
    phases = []
    for d in range(len(interior)):
        ffac = np.exp(-2.0j * np.pi * np.asarray(orb)[:, per[d]])
        if nspin == 2:
            ffac = np.repeat(ffac[:, None], 2, axis=1)
        phases.append(ffac)
    phases = np.stack(phases, axis=0)
    return np.stack([phases.real, phases.imag], axis=-1)


def solve_grid_family(static: ModelStatic, datas_stacked: BlochData, mesh_sizes, start_k, orb, per, nspin):
    """One-program lambda-family grid solve (see _solve_grid_family_jit).

    ``mesh_sizes`` are the k-grid sizes (without the lambda axis).
    Returns (min_gaps (nsta-1,) float64 host, evals device
    (L, *mesh_sizes, nsta), wfs device (L, *mesh_sizes, nsta, ...))."""
    interior = tuple(int(m) - 1 for m in mesh_sizes)
    start = np.asarray(start_k, dtype=np.float64).reshape(len(interior))
    phases_ri = _grid_phases(interior, orb, per, nspin)
    min_gaps, evals, wfs = _solve_grid_family_jit(
        static, datas_stacked, interior, start, phases_ri
    )
    min_gaps = np.asarray(jax.device_get(min_gaps), dtype=np.float64)
    return (min_gaps.min(axis=0) if min_gaps.size else min_gaps[0:0].reshape(0)), evals, wfs


def solve_grid_device(static: ModelStatic, data: BlochData, mesh_sizes, start_k, orb, per, nspin, mesh=None):
    """Device-resident uniform-grid solve.

    Returns (min_gaps (nsta-1,) float64 on host, evals device array of
    shape (*mesh_sizes, nsta), wfs_packed device array of shape
    (*mesh_sizes, nsta, norb[, spin], 2)).  ``mesh``: optional
    jax.sharding.Mesh to shard the solve (and the resulting state grid)
    over.
    """
    interior = tuple(int(m) - 1 for m in mesh_sizes)
    start = np.asarray(start_k, dtype=np.float64).reshape(len(interior))
    # periodic-gauge phases, unflattened (norb, spin) layout to broadcast
    # against (..., nsta, norb, spin) state storage
    phases_ri = _grid_phases(interior, orb, per, nspin)
    min_gaps, evals, wfs = _solve_grid_jit(static, data, interior, start, phases_ri, mesh)
    return np.asarray(min_gaps, dtype=np.float64), evals, wfs
