"""Precision / backend policy for pythtb_tpu.

Design
------
The host-side model builder always works in NumPy float64/complex128 --
model construction is not hot and reference parity (PythTB 1.8.0,
/root/reference/pythtb.py) requires double precision semantics when
available.

Device computation uses whatever precision JAX's x64 mode currently
allows: with ``jax_enable_x64`` on (the default for CPU test runs) all
kernels run in float64/complex128; with it off (the only option on the
TPU backends we target, where f64 is unsupported) everything runs in
float32/complex64.  All dtypes are derived *lazily* through
:func:`jax.dtypes.canonicalize_dtype` so flipping the x64 flag between
calls behaves correctly.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = [
    "float_dtype",
    "complex_dtype",
    "int_dtype",
    "is_x64",
    "cpu_like_backend",
]


def float_dtype():
    """Device float dtype under the current x64 setting."""
    return jax.dtypes.canonicalize_dtype(np.float64)


def complex_dtype():
    """Device complex dtype under the current x64 setting."""
    return jax.dtypes.canonicalize_dtype(np.complex128)


def int_dtype():
    return jax.dtypes.canonicalize_dtype(np.int64)


def is_x64() -> bool:
    return float_dtype() == np.dtype(np.float64)


def cpu_like_backend() -> bool:
    """True when the default backend keeps data in host memory."""
    return jax.default_backend() == "cpu"


# Size threshold (in elements of the dense one-hot "pattern" matrix,
# nhop * norb * norb) above which Hamiltonian assembly falls back from the
# MXU-friendly dense pattern matmul to a scatter-add.  The pattern path
# materializes two (nhop, norb*norb) float arrays; 2**24 elements is
# 64 MB each in f32 which comfortably fits HBM but avoids silly blowups
# for large finite models (norb ~ 10^3) where assembly is cold anyway.
PATTERN_MAX_ELEMS = int(os.environ.get("PYTHTB_TPU_PATTERN_MAX", 2**24))
