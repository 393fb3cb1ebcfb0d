"""Generate golden parity data by running the reference PythTB.

Usage:  python -m tests.golden.generate_golden   (from the repo root)

Writes tests/golden/data/<workload>.npz.  The reference module location
can be overridden with the PYTHTB_REFERENCE environment variable
(default /root/reference/pythtb.py).  Following the strategy in
SURVEY.md section 4, goldens are produced by the reference itself, so
these files encode the reference's exact float64 numerics.
"""

import io
import os
import pathlib
import sys
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from tests import workloads  # noqa: E402
from tests.conftest import load_reference  # noqa: E402


def main():
    ref = load_reference()
    if ref is None:
        raise SystemExit("reference PythTB not found; set PYTHTB_REFERENCE")
    out_dir = pathlib.Path(__file__).parent / "data"
    out_dir.mkdir(exist_ok=True)
    for name, fn in workloads.ALL.items():
        with redirect_stdout(io.StringIO()):
            result = fn(ref)
        np.savez_compressed(out_dir / (name + ".npz"), **result)
        print("wrote", name, "->", sorted(result.keys()))
    if os.path.isdir(workloads.W90_DATA_DIR):
        with redirect_stdout(io.StringIO()):
            result = workloads.w90_silicon(ref, workloads.W90_DATA_DIR)
        np.savez_compressed(out_dir / "w90_silicon.npz", **result)
        print("wrote w90_silicon ->", sorted(result.keys()))
    with redirect_stdout(io.StringIO()):
        result = workloads.w90_synthetic(ref)
    np.savez_compressed(out_dir / "w90_synthetic.npz", **result)
    print("wrote w90_synthetic ->", sorted(result.keys()))


if __name__ == "__main__":
    main()
