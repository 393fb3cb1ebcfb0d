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
PROBE_TIMEOUT_S = 90  # enum is instant; a trivial compile+d2h is seconds


def probe_tunnel():
    """Liveness probe for the remote TPU tunnel, in a subprocess.

    ``jax.devices()`` blocks FOREVER in-process when the axon tunnel is
    down (round 3 burned 2x520 s of watchdog budget learning nothing).
    Round 4 found a HALF-DEAD state where enumeration answers instantly
    but any compute/d2h hangs forever -- so the probe must do a full
    tiny compute + fetch roundtrip, not just enumerate.  Returns
    'ok:<backend>', 'half-dead', or 'dead'.
    """
    code = (
        "import jax, sys; jax.devices();"
        "print('ENUM_OK', flush=True);"
        "import jax.numpy as jnp;"
        "v = float((jnp.ones((4,)) + 1).sum());"
        "print('COMPUTE_OK=' + jax.default_backend(), flush=True)"
    )
    try:
        result = subprocess.run(
            [sys.executable, "-c", code],
            timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
        )
        stdout = result.stdout
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
    for line in stdout.splitlines():
        if line.startswith("COMPUTE_OK="):
            return "ok:" + line.split("=", 1)[1]
    return "half-dead" if "ENUM_OK" in stdout else "dead"


def main():
    """Watchdog wrapper: the measurement runs in a child process because
    the remote TPU compiler occasionally stalls for minutes; a fresh
    process retry typically compiles in seconds.  A fast dead-tunnel
    probe runs first; if the tunnel is down, the benchmark falls back to
    an honestly-labeled CPU measurement instead of failing after 17 min."""
    if "--child" in sys.argv:
        run_benchmark(force_cpu="--cpu" in sys.argv)
        return
    probe = probe_tunnel()
    if probe.startswith("ok:"):
        print("tunnel probe ok (backend=%s)" % probe[3:], file=sys.stderr)
        tpu_attempts = 2
    elif probe == "half-dead":
        # enumeration answered but a trivial compute+fetch hung: either the
        # tunnel data path is down or the remote compiler is stalling hard.
        # One watchdog attempt in case it was a transient stall, then CPU.
        print(
            "TPU tunnel HALF-DEAD (enumeration ok, tiny compute+d2h hung "
            "%ds); one watchdog TPU attempt, then CPU fallback" % PROBE_TIMEOUT_S,
            file=sys.stderr,
        )
        tpu_attempts = 1
    else:
        print(
            "TPU tunnel DEAD (device enumeration hung %ds); falling back to "
            "the CPU backend -- the reported number is a CPU wall time, not "
            "the TPU headline" % PROBE_TIMEOUT_S,
            file=sys.stderr,
        )
        tpu_attempts = 0

    def try_child(cpu):
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if cpu:
            cmd.append("--cpu")
        try:
            result = subprocess.run(
                cmd, timeout=CHILD_TIMEOUT_S, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print("child timed out after %ds" % CHILD_TIMEOUT_S, file=sys.stderr)
            return None
        sys.stderr.write(result.stderr)
        line = [l for l in result.stdout.splitlines() if l.startswith("{")]
        if result.returncode == 0 and line:
            return line[-1]
        print("child failed (rc=%d)" % result.returncode, file=sys.stderr)
        return None

    for attempt in range(tpu_attempts):
        out = try_child(cpu=False)
        if out is not None:
            print(out)
            return
        print("TPU attempt %d/%d failed%s"
              % (attempt + 1, tpu_attempts,
                 "; retrying in a fresh process" if attempt + 1 < tpu_attempts
                 else "; falling back to CPU"),
              file=sys.stderr)
    # The CPU fallback must always produce a JSON line: a red bench
    # artifact helps nobody, and the workload is dispatch-bound anyway.
    out = try_child(cpu=True)
    if out is not None:
        print(out)
        return
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
