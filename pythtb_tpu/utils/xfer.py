"""Complex-safe host<->device marshalling.

Some TPU runtimes (notably the tunneled "axon" platform this framework
targets) cannot transfer complex-typed buffers between host and device:
``device_put``/``__array__`` of a complex64 array raises UNIMPLEMENTED and
poisons the transfer stream.  Complex *compute* on device is fine.

The rule used throughout pythtb_tpu is therefore:

* every array crossing the host<->device boundary is real-typed;
* complex data is carried as a trailing length-2 real/imag axis
  ("ri-packed") and split/combined *inside* jitted code.

These helpers implement that convention.  On CPU backends this costs one
extra copy, which is irrelevant next to the eigensolves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config

__all__ = [
    "pack_cplx",
    "unpack_cplx",
    "host_pack",
    "host_unpack",
]


def pack_cplx(z):
    """Inside-jit: complex array -> float array with trailing [re, im] axis."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def unpack_cplx(x):
    """ri-packed float array -> complex array.

    Built with ``lax.complex`` (no complex python constants), so it is
    safe both inside jit and in eager mode on TPU runtimes that cannot
    device_put complex scalars."""
    import jax

    ftype = config.float_dtype()
    return jax.lax.complex(
        jnp.asarray(x[..., 0], ftype), jnp.asarray(x[..., 1], ftype)
    )


def host_pack(z: np.ndarray) -> np.ndarray:
    """Host: complex128 ndarray -> float64 ndarray with trailing [re, im]."""
    z = np.asarray(z, dtype=np.complex128)
    return np.stack([z.real, z.imag], axis=-1)


def host_unpack(x) -> np.ndarray:
    """Host: ri-packed (device or host) array -> complex128 ndarray."""
    x = np.asarray(x, dtype=np.float64)
    return x[..., 0] + 1j * x[..., 1]
