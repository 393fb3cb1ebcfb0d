"""Compiled compute kernels (device-side) for pythtb_tpu."""
from . import hamiltonian, eigh, solver, berry, position  # noqa: F401
