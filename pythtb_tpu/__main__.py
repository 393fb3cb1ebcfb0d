"""Diagnostics entry point: ``python -m pythtb_tpu``.

Prints versions, backend/device inventory, precision mode, and runs a
one-line self-check (Haldane Chern number) so deployments can validate
an installation in one command.
"""

import sys
import time


def main():
    import jax
    import numpy as np

    import pythtb_tpu as ptt

    print("pythtb_tpu %s (PythTB-compatible API %s)" % (ptt.__version__, ptt.PYTHTB_COMPAT_VERSION))
    print("jax %s | backend: %s | devices: %s" % (
        jax.__version__, jax.default_backend(),
        ", ".join(str(d) for d in jax.devices())))
    from pythtb_tpu import config
    print("device float dtype: %s (x64 %s)" % (
        np.dtype(config.float_dtype()).name, "on" if config.is_x64() else "off"))

    from pythtb_tpu import flows, models
    t0 = time.perf_counter()
    c = flows.chern_number(models.haldane(), [0], nk=(31, 31))
    dt = time.perf_counter() - t0
    ok = abs(abs(c) - 1.0) < 1e-3
    print("self-check: Haldane Chern = %.6f in %.2fs -> %s" % (c, dt, "OK" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
