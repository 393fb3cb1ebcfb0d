"""pythtb_tpu -- a TPU-native tight-binding framework.

A from-scratch JAX/XLA re-design with the full capabilities of PythTB
1.8.0 (reference at /root/reference/pythtb.py): build tight-binding
models, diagonalize H(k) on k-lists/meshes, compute Berry phases /
fluxes / Chern numbers / Wilson loops / hybrid Wannier centers, perform
model surgery (supercells, finite cuts, dimensional reduction), and
import Wannier90 output.

Key architectural differences from the reference:

* the k-batch is the leading axis of everything: Hamiltonian assembly
  and diagonalization run as single compiled XLA programs over whole
  k-meshes (MXU matmuls + batched eigh) instead of Python loops;
* the Berry engine computes all link overlaps once, batched, with a
  log-depth Wilson-loop scan;
* k-batches shard over a ``jax.sharding.Mesh`` (see
  :mod:`pythtb_tpu.parallel`) -- pure data parallelism over ICI;
* complex data is marshalled across the host<->device boundary as
  real/imag pairs so TPU runtimes without complex-transfer support work.

Precision: device kernels follow JAX's x64 mode.  For bit-tight parity
with the float64 reference, enable ``jax.config.update("jax_enable_x64",
True)`` on a CPU backend; on TPUs (f32) expect ~1e-5 accuracy, ample for
topological invariants.

Public API (PythTB-compatible): :class:`tb_model`, :class:`wf_array`,
:class:`w90`.
"""

from .model import tb_model, PythtbError
from .utils.continuity import no_2pi
from .wf_array import wf_array
from .w90 import w90
from . import models, parallel
from . import bdg, boltzmann, disorder, dmft, dynamics, ed, eph, entanglement, exciton, fermisurface, floquet, geometry, impurity, localization, magnetic, magnon, meanfield, negf, optical, phonon, realspace, response, surface, symmetry, unfold, wannier
from .family import family, ModelFamily

__version__ = "0.2.0"
# feature parity target (the reference release this framework mirrors)
PYTHTB_COMPAT_VERSION = "1.8.0"

__all__ = [
    "tb_model",
    "bdg",
    "boltzmann",
    "fermisurface",
    "disorder",
    "wf_array",
    "w90",
    "models",
    "parallel",
    "dynamics",
    "entanglement",
    "floquet",
    "geometry",
    "impurity",
    "magnetic",
    "magnon",
    "meanfield",
    "negf",
    "optical",
    "phonon",
    "realspace",
    "surface",
    "ed",
    "dmft",
    "exciton",
    "response",
    "unfold",
    "wannier",
    "no_2pi",
    "PythtbError",
    "__version__",
]
