"""Host-side utilities for pythtb_tpu."""
from . import continuity, profiling, serialization, xfer  # noqa: F401
