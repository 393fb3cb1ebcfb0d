"""Profiling / tracing helpers.

The reference has no instrumentation at all (SURVEY.md section 5.1).
TPU-native equivalent: thin wrappers over ``jax.profiler`` for
TensorBoard-compatible device traces, plus a synchronization-aware
wall-clock timer (naive ``time.time`` around async dispatch measures
nothing).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["trace", "timed", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    Example::

        with pythtb_tpu.utils.profiling.trace("/tmp/tb"):
            model.solve_all(kpts)
    """
    with jax.profiler.trace(log_dir):
        yield


def _device_sync():
    """Block until all previously dispatched device work completes.

    jax.effects_barrier() only waits for *effectful* computations, so a
    pure jitted program could still be in flight; instead enqueue a tiny
    computation (executed in launch order on the stream) and block on
    its result."""
    jax.block_until_ready(jnp.zeros(()) + 0.0)


@contextlib.contextmanager
def timed(label: str = "block", sync: bool = True, out: list = None):
    """Wall-clock a block, synchronizing outstanding device work first/after."""
    if sync:
        _device_sync()
    t0 = time.perf_counter()
    yield
    if sync:
        _device_sync()
    dt = time.perf_counter() - t0
    if out is not None:
        out.append(dt)
    else:
        print("[pythtb_tpu] %s: %.4f s" % (label, dt))


def benchmark(fn, *args, warmup: int = 1, iters: int = 3):
    """Best-of-iters steady-state wall time of ``fn(*args)``.

    The result of ``fn`` is block_until_ready'd so asynchronous dispatch
    is included in the measurement.  Returns (best_seconds, result).
    """
    result = None
    for _ in range(max(warmup, 0)):
        result = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, result
