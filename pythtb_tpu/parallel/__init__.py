"""Device-mesh distribution utilities for pythtb_tpu."""
from .mesh import auto_mesh, set_mesh, use_mesh, current_mesh, KAXIS  # noqa: F401
