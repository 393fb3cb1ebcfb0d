#!/usr/bin/env python
"""Benchmark: the north-star workload from BASELINE.md.

Workload: Haldane model, ``wf_array.solve_on_grid`` on a 301x301 BZ grid
plus ``berry_flux`` (Chern number) -- the reference (PythTB 1.8.0, pure
NumPy, serial k-loop) takes 12.74 s on one CPU core of this container
(BASELINE.md).  We run the identical computation with pythtb_tpu's
fused device pipeline (single compiled XLA program:
assemble H(k) -> batched analytic 2x2 eigh -> periodic-gauge extension
-> link determinants -> plaquette phases -> sum) and report wall time of
a steady-state run (one warm-up to populate the compile cache).

Prints ONE JSON line:
  {"metric": ..., "value": <secs>, "unit": "s", "vs_baseline": <speedup>}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_SECONDS = 12.74  # reference north star (BASELINE.md)
GRID = 301
CHILD_TIMEOUT_S = 520  # remote TPU compiles are flaky (3 s - 300 s observed)
PROBE_TIMEOUT_S = 45  # device enumeration is instant when the tunnel is up


def probe_tunnel():
    """Fast liveness probe for the remote TPU tunnel, in a subprocess.

    ``jax.devices()`` blocks FOREVER in-process when the axon tunnel is
    down (round 3 burned 2x520 s of watchdog budget learning nothing);
    enumerating devices takes <5 s when it is up.  Returns the backend
    name ('tpu'/'axon'/'cpu'/...) or None if the probe hung/failed --
    which distinguishes "tunnel dead" from the watchdog's "remote
    compiler stall" diagnosis.
    """
    code = "import jax; jax.devices(); print('BACKEND=' + jax.default_backend())"
    try:
        result = subprocess.run(
            [sys.executable, "-c", code],
            timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in result.stdout.splitlines():
        if line.startswith("BACKEND="):
            return line.split("=", 1)[1]
    return None


def main():
    """Watchdog wrapper: the measurement runs in a child process because
    the remote TPU compiler occasionally stalls for minutes; a fresh
    process retry typically compiles in seconds.  A fast dead-tunnel
    probe runs first; if the tunnel is down, the benchmark falls back to
    an honestly-labeled CPU measurement instead of failing after 17 min."""
    if "--child" in sys.argv:
        run_benchmark(force_cpu="--cpu" in sys.argv)
        return
    backend = probe_tunnel()
    cpu_fallback = backend is None
    if cpu_fallback:
        print(
            "TPU tunnel DEAD (device enumeration hung %ds); falling back to "
            "the CPU backend -- the reported number is a CPU wall time, not "
            "the TPU headline" % PROBE_TIMEOUT_S,
            file=sys.stderr,
        )
    else:
        print("tunnel probe ok (backend=%s)" % backend, file=sys.stderr)
    child_cmd = [sys.executable, os.path.abspath(__file__), "--child"]
    if cpu_fallback:
        child_cmd.append("--cpu")
    for attempt in (1, 2):
        try:
            result = subprocess.run(
                child_cmd, timeout=CHILD_TIMEOUT_S, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print("attempt %d timed out after %ds (tunnel was alive at probe "
                  "time => remote compiler stall); %s"
                  % (attempt, CHILD_TIMEOUT_S,
                     "retrying in a fresh process" if attempt == 1 else "giving up"),
                  file=sys.stderr)
            continue
        sys.stderr.write(result.stderr)
        line = [l for l in result.stdout.splitlines() if l.startswith("{")]
        if result.returncode == 0 and line:
            print(line[-1])
            return
        print("attempt %d failed (rc=%d)" % (attempt, result.returncode), file=sys.stderr)
    sys.exit(1)


def run_benchmark(force_cpu=False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import pythtb_tpu as ptt
    from pythtb_tpu import flows

    backend = jax.default_backend()

    # Haldane parameters from examples/haldane.py:23-40 (see BASELINE.md)
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = ptt.tb_model(2, 2, lat, orb)
    delta, t, t2 = 0.2, -1.0, 0.15 * np.exp(1.0j * np.pi / 2.0)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2, 0, 0, lv)
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2.conjugate(), 1, 1, lv)

    # warm-up (compile)
    t0 = time.perf_counter()
    chern = flows.chern_number(m, [0], nk=(GRID, GRID), start_k=(-0.5, -0.5))
    compile_and_first = time.perf_counter() - t0

    # steady state
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        chern = flows.chern_number(m, [0], nk=(GRID, GRID), start_k=(-0.5, -0.5))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    err = abs(abs(chern) - 1.0)
    print(
        "backend=%s first(+compile)=%.3fs steady=%.4fs chern=%.8f (|err|=%.2e)"
        % (backend, compile_and_first, wall, chern, err),
        file=sys.stderr,
    )

    # secondary: the same workload through the PythTB-compatible
    # wf_array API (device-resident storage; reported to stderr only)
    def wf_pipeline():
        wf = ptt.wf_array(m, [GRID, GRID])
        wf.solve_on_grid([-0.5, -0.5])
        return wf.berry_flux([0]) / (2.0 * np.pi)

    wf_pipeline()
    t0 = time.perf_counter()
    chern2 = wf_pipeline()
    print(
        "wf_array-API pipeline: %.4fs (chern=%.8f)"
        % (time.perf_counter() - t0, chern2),
        file=sys.stderr,
    )
    if err > 1e-3:
        print("WARNING: Chern number off (%.6f)" % chern, file=sys.stderr)

    record = {
        "metric": "haldane_chern_301x301_wall",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 2),
    }
    if force_cpu:
        # honest labeling: the TPU tunnel was dead, this is a CPU number
        record["backend"] = "cpu-fallback-tunnel-dead"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
