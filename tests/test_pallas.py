"""Pallas assembly kernel: logic validation via the interpreter.

The kernel itself only activates on TPU backends for large hopping
tables (ops/pallas_assemble.py gate); here its numerics are checked
against the XLA pattern-matmul path using interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu.ops import pallas_assemble
from pythtb_tpu.ops.hamiltonian import assemble
from pythtb_tpu.utils.xfer import unpack_cplx

from . import zoo


def _random_big_model(nhop_target=200, norb=6, seed=0):
    rng = np.random.RandomState(seed)
    m = ptt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]],
                     rng.rand(norb, 2).tolist())
    m.set_onsite(rng.randn(norb).tolist())
    seen = set()
    while len(m._hoppings) < nhop_target:
        i, j = rng.randint(norb), rng.randint(norb)
        R = (rng.randint(-3, 4), rng.randint(-3, 4))
        if i == j and R == (0, 0):
            continue
        key = (i, j, R)
        ckey = (j, i, (-R[0], -R[1]))
        if key in seen or ckey in seen:
            continue
        seen.add(key)
        amp = rng.randn() + 1j * rng.randn()
        m.set_hop(amp, i, j, list(R))
    return m


def test_pallas_kernel_matches_xla_interpret():
    m = _random_big_model()
    static, data = m._get_finalized()
    kpts = np.random.RandomState(1).rand(32, 2)

    # XLA reference path
    Hx = jax.jit(lambda k: jnp.stack(
        [assemble(static, data, k).real, assemble(static, data, k).imag], -1))(kpts)
    Hx = np.asarray(Hx)[..., 0] + 1j * np.asarray(Hx)[..., 1]

    diag = unpack_cplx(jnp.asarray(data.diag))
    Hp = pallas_assemble.assemble_pallas_nspin1(
        static, data, jnp.asarray(kpts), diag, interpret=True
    )
    Hp = np.asarray(jnp.stack([Hp.real, Hp.imag], -1))
    Hp = Hp[..., 0] + 1j * Hp[..., 1]

    assert np.abs(Hp - Hx).max() < 1e-5 * max(1.0, np.abs(Hx).max())
    # hermiticity
    assert np.abs(Hp - np.conj(np.swapaxes(Hp, -1, -2))).max() < 1e-5


def test_pallas_gate_logic():
    m = zoo.haldane(ptt)
    static, _ = m._get_finalized()
    # tiny models never take the pallas path
    assert not pallas_assemble.pallas_available(static, 10 ** 6) or (
        jax.default_backend() == "tpu" and static.nhop >= 128
    )
