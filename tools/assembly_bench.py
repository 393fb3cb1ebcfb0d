#!/usr/bin/env python
"""Benchmark H(k) assembly on the real TPU across hopping-table sizes.

History: round 2 used this tool (then `pallas_bench.py`) to measure the
round-1 Pallas fused-assembly kernel against the XLA pattern path; the
kernel came out at 0.9-1.2x and VMEM-OOMed at nhop=8192, so it was
removed (measured table + rationale: docs/PALLAS_BENCH.md).  The tool
remains so future rounds can re-make that decision against data: it
times the two XLA assembly strategies (dense pattern matmul vs
scatter-add; see ops/hamiltonian.py) for nhop in {512, 2048, 8192} x
B in {1e4, 1e5} plus the w90 silicon table.  Reference hot path:
/root/reference/pythtb.py:874-925.

Run from the repo root:  python tools/assembly_bench.py
"""

import pathlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_model(nhop, norb=16, dim=3, seed=0):
    import pythtb_tpu as ptt

    rng = np.random.RandomState(seed)
    m = ptt.tb_model(dim, dim, np.eye(dim).tolist(),
                     rng.uniform(0, 1, size=(norb, dim)).tolist())
    m.set_onsite(rng.randn(norb).tolist())
    seen = set()
    added = 0
    while added < nhop:
        i = rng.randint(norb)
        j = rng.randint(norb)
        R = tuple(rng.randint(-3, 4, size=dim).tolist())
        if i == j and all(r == 0 for r in R):
            continue
        key = (i, j, R)
        conj_key = (j, i, tuple(-r for r in R))
        if key in seen or conj_key in seen:
            continue
        seen.add(key)
        m.set_hop(rng.randn() + 1j * rng.randn(), i, j, list(R))
        added += 1
    return m


def time_assembly(static, data, kpts_dev, n_iter=8):
    """Steady-state seconds per assembly.  Dispatch through the tunnel
    costs ~25 ms/call, so n_iter calls are issued asynchronously and the
    block happens once at the end: dispatch pipelines against device
    compute and the per-call figure approaches pure device time."""
    import jax

    from pythtb_tpu.ops.hamiltonian import assemble
    from pythtb_tpu.utils.xfer import pack_cplx

    fn = jax.jit(lambda k: pack_cplx(assemble(static, data, k)))
    jax.block_until_ready(fn(kpts_dev))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(kpts_dev) for _ in range(n_iter)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_model(name, m, Bs, rows):
    import jax
    import jax.numpy as jnp

    static, data = m._get_finalized()
    variants = [("pattern", static._replace(use_pattern=True))]
    if static.nspin == 1:
        variants.append(("scatter", static._replace(use_pattern=False)))
    for B in Bs:
        rng = np.random.RandomState(1)
        kpts = rng.uniform(-0.5, 0.5, size=(B, static.dim_k))
        kpts_dev = jax.device_put(jnp.asarray(kpts))
        times = {
            mode: time_assembly(st, data, kpts_dev) for mode, st in variants
        }
        row = {"model": name, "nhop": static.nhop, "norb": static.norb, "B": B}
        row.update({mode + "_s": t for mode, t in times.items()})
        rows.append(row)
        print(json.dumps(row), flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    rows = []
    for nhop in (512, 2048, 8192):
        m = synthetic_model(nhop)
        bench_model("synthetic_norb16", m, (10_000, 100_000), rows)

    try:
        import pythtb_tpu as ptt

        si = ptt.w90(str(pathlib.Path(__file__).resolve().parents[1] / "tests" / "data" / "w90_silicon"), "silicon")
        bench_model("w90_silicon", si.model(), (10_000, 100_000), rows)
    except FileNotFoundError:
        print("w90 silicon data not available; skipping", flush=True)

    print("\n| model | nhop | norb | B | pattern (s) | scatter (s) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        sc = "%.4f" % r["scatter_s"] if "scatter_s" in r else "-"
        print("| %s | %d | %d | %d | %.4f | %s |" % (
            r["model"], r["nhop"], r["norb"], r["B"], r["pattern_s"], sc))


if __name__ == "__main__":
    main()
