"""Test configuration: CPU backend, float64, 8 virtual devices.

Parity tests against the PythTB 1.8.0 reference require float64
(tolerance 1e-8; see BASELINE.md), so tests run on the CPU backend with
x64 enabled.  Sharding tests use a virtual 8-device CPU mesh via
--xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import importlib.util
import pathlib

import pytest


@pytest.fixture(scope="module", autouse=True)
def _bound_compile_state(request):
    """Drop XLA compile caches after every test module.

    The full 54-file suite compiles thousands of XLA:CPU executables in
    one process; round 3 ended with a reproducible SIGSEGV inside
    ``backend_compile`` at ~97% of the suite (test_wilson_device, via
    ops/berry.unitary_eig) that never fires in isolation -- i.e. a
    compile-state-accumulation crash, not a code bug.  Clearing the
    caches per module bounds the resident executable count (and the
    process memory-map count, which is capped at vm.max_map_count =
    65530 in this container).  Set PYTHTB_TEST_DIAG=1 to log per-module
    map/cache growth to /tmp/pythtb_test_diag.log.
    """
    yield
    if os.environ.get("PYTHTB_TEST_DIAG"):
        try:
            with open("/proc/self/maps") as fh:
                nmaps = sum(1 for _ in fh)
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            with open("/tmp/pythtb_test_diag.log", "a") as fh:
                fh.write(
                    "%s maps=%d maxrss=%dMB\n"
                    % (request.module.__name__, nmaps, rss)
                )
        except OSError:
            pass
    jax.clear_caches()

REFERENCE_PATH = os.environ.get("PYTHTB_REFERENCE", "/root/reference/pythtb.py")
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden" / "data"


def load_reference():
    """Import the reference PythTB module, or None if unavailable."""
    if not os.path.exists(REFERENCE_PATH):
        return None
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        spec = importlib.util.spec_from_file_location("pythtb_ref", REFERENCE_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref():
    mod = load_reference()
    if mod is None:
        pytest.skip("reference PythTB not available")
    return mod


@pytest.fixture(scope="session")
def golden():
    """Dict-like access to committed golden arrays."""
    import numpy as np

    class Golden:
        def __call__(self, name):
            path = GOLDEN_DIR / (name + ".npz")
            if not path.exists():
                pytest.skip("golden data %s not generated" % name)
            return np.load(path)

    return Golden()
