"""Device-mesh distribution context for pythtb_tpu.

The reference is strictly serial (its authors' own TODO wish-lists
"Paralellize over k-points matrix diagonalization",
/root/reference/notes/TODO:74).  The natural data-parallel axis of the
domain is the k-point batch: every H(k) is independent, so the batch
axis of every solver call shards cleanly over a 1-D device mesh with no
communication except at reductions (Berry-flux sums, Wilson-loop
products).  We lean on GSPMD: inputs are placed with a
``NamedSharding`` and XLA inserts the (ICI) collectives -- including the
1-column halo exchanges needed by neighbor-overlap stencils in the
Berry-phase engine.

Usage::

    mesh = pythtb_tpu.parallel.auto_mesh()      # all visible devices
    with pythtb_tpu.parallel.use_mesh(mesh):
        evals = model.solve_all(kpts)           # k-batch sharded

or ``set_mesh(mesh)`` for a process-wide default.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "auto_mesh",
    "set_mesh",
    "use_mesh",
    "current_mesh",
    "shard_batch",
    "pad_to_multiple",
    "KAXIS",
]

KAXIS = "k"

_ACTIVE_MESH: Optional[Mesh] = None


def auto_mesh(n_devices: Optional[int] = None, axis_name: str = KAXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` visible devices (default all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def set_mesh(mesh: Optional[Mesh]) -> None:
    """Set (or clear, with None) the process-wide default mesh."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Scoped default mesh."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n."""
    return ((n + m - 1) // m) * m


def shard_batch(x: np.ndarray, mesh: Optional[Mesh], axis: int = 0):
    """Place ``x`` with its ``axis`` sharded over the mesh's first axis.

    The caller is responsible for having padded ``axis`` to a multiple of
    the mesh size.  With ``mesh is None`` this is a plain host array
    pass-through (jit will commit it to the default device).
    """
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = mesh.axis_names[0]
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
