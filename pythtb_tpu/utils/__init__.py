"""Host-side utilities for pythtb_tpu."""
from . import continuity, xfer  # noqa: F401
