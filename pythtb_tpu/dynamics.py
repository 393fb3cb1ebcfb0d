"""Real-time quantum dynamics: Chebyshev propagation and quench echoes.

The reference is purely spectral -- it can diagonalize H but not watch
anything move.  This module adds time as a first-class axis, TPU-first:

* :func:`evolve` -- ``psi(t) = e^{-i H t} psi(0)`` for FINITE models at
  matrix-free scale: the Chebyshev expansion of the propagator
  (Tal-Ezer & Kosloff, J. Chem. Phys. 81, 3967 (1984)),

      e^{-i H dt} = sum_n c_n T_n(Ht),   c_n = (2 - d_n0) (-i)^n
                    e^{-i b dt} J_n(a dt),

  with ``Ht = (H - b)/a`` the Gershgorin-rescaled Hamiltonian and J_n
  Bessel functions (host-side scipy).  The Bessel tail decays
  SUPERexponentially past ``n = a dt``, so a fixed order ``M ~ a dt +
  40`` reaches machine precision; every time step is then ``M``
  ELL-table matvecs (:mod:`pythtb_tpu.ops.matvec` -- gathers + dense
  contractions, no scatters) under one ``lax.scan``: 10^5-site flakes
  propagate in seconds on a chip.  Chiral edge transport of a Chern
  insulator -- one-way motion around corners -- is the committed
  example.

* :func:`quench_echo` -- the Loschmidt echo / dynamical quantum phase
  transition diagnostic for periodic models (Heyl, Polkovnikov &
  Kehrein, PRL 110, 135704 (2013)): prepare the ground state of
  ``model_i``, evolve with ``model_f``,

      L(t) = prod_k |det M_k(t)|^2,
      M_k(t)_mn = <u^i_m(k)| e^{-i H_f(k) t} |u^i_n(k)>,

  and return the rate function ``g(t) = -(1/(N_k n_occ)) ln L``.
  After a quench across a topological transition g(t) shows
  nonanalytic cusps at critical times ``t*_n = (2n+1) pi / (2
  eps_f(k*))`` where the old and new Bloch vectors are orthogonal --
  tested against the closed two-band formula (an independent
  derivation) and the predicted cusp times on the SSH chain.

Complex never crosses the host<->device boundary raw (ri-packed,
utils/xfer.py); Chebyshev coefficients are computed on host in float64.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx

__all__ = ["evolve", "quench_echo"]


@partial(jax.jit, static_argnums=(5,))
def _cheb_evolve_seeded_jit(h, ab, seed_coef_ri, coef_ri, psi0_ri, nsteps):
    """Seeded variant: one fractional step with its own (independently
    sized) coefficient vector, then the uniform scan -- all on device,
    no host round trip for the seeded state."""
    from .ops.matvec import matvec

    seed = unpack_cplx(seed_coef_ri)
    psi0 = unpack_cplx(psi0_ri)

    def scaled(v):
        return (matvec(h, v) - ab[1] * v) / ab[0]

    def one_step(psi, coef):
        t0 = psi
        t1 = scaled(psi)

        def cheb(carry, c):
            tm, tc, acc = carry
            tn = 2.0 * scaled(tc) - tm
            return (tc, tn, acc + c * tn), None

        acc0 = coef[0] * t0 + coef[1] * t1
        (_, _, acc), _ = jax.lax.scan(cheb, (t0, t1, acc0), coef[2:])
        return acc

    start = one_step(psi0, seed)
    coef = unpack_cplx(coef_ri)

    def step(psi, _):
        out = one_step(psi, coef)
        return out, out

    _, hist = jax.lax.scan(step, start, None, length=nsteps)
    return pack_cplx(hist)


@partial(jax.jit, static_argnums=(4,))
def _cheb_evolve_jit(h, ab, coef_ri, psi0_ri, nsteps):
    """Chebyshev time stepping: apply e^{-i H dt} ``nsteps`` times to a
    block of states, collecting the state after every step.

    coef_ri: (M,) ri-packed complex step coefficients c_n.
    psi0_ri: ri-packed (norb, [2,] B) state block.
    Returns ri-packed (nsteps, norb, [2,] B)."""
    from .ops.matvec import matvec

    coef = unpack_cplx(coef_ri)
    psi0 = unpack_cplx(psi0_ri)
    M = coef.shape[0]

    def scaled(v):
        return (matvec(h, v) - ab[1] * v) / ab[0]

    def step(psi, _):
        t0 = psi
        t1 = scaled(psi)

        def cheb(carry, c):
            tm, tc, acc = carry
            tn = 2.0 * scaled(tc) - tm
            return (tc, tn, acc + c * tn), None

        acc0 = coef[0] * t0 + coef[1] * t1
        (_, _, acc), _ = jax.lax.scan(cheb, (t0, t1, acc0), coef[2:])
        return acc, acc

    _, hist = jax.lax.scan(step, psi0, None, length=nsteps)
    return pack_cplx(hist)


def _cheb_order(a, dt):
    """Bessel tail: J_n(x) decays superexponentially for n > x, but
    the turning-point width grows like x^(1/3) -- a fixed +40 buffer
    left ~1e-7 errors at x ~ 350 (review).  x + 12 x^(1/3) + 40 holds
    double-precision round-off at any step length."""
    x = abs(a * dt)
    return int(np.ceil(x + 12.0 * x ** (1.0 / 3.0))) + 40


def evolve(model, psi0, times, order=None):
    """Propagate states of a FINITE model: ``psi(t_s) = e^{-i H t_s}
    psi0`` at uniformly spaced times, one compiled device program.

    :param model: finite (dim_k == 0) tb_model, or a
      :class:`pythtb_tpu.realspace.TorusSample`
    :param psi0: (nsta,) or (nsta, B) complex initial states (flat
      spin-fastest layout for spinful models); normalization is
      preserved exactly by unitarity (checked in tests to 1e-12)
    :param times: 1-D array of UNIFORMLY spaced times (any start,
      including 0); the step is ``times[1] - times[0]`` and an
      initial fractional step seeds the series at ``times[0]``
    :param order: Chebyshev order per step (default: Bessel-safe
      ``a dt + 40``)
    :returns: (ntimes, nsta) or (ntimes, nsta, B) complex array
    """
    from .ops.matvec import gershgorin_window, sparse_h
    from .realspace import TorusSample

    h = sparse_h(model) if not isinstance(model, TorusSample) else model.h
    times = np.asarray(times, dtype=np.float64)
    if times.ndim != 1 or len(times) < 1:
        raise PythtbError("times must be a nonempty 1-D array")
    if len(times) > 1:
        dt = float(times[1] - times[0])
        if dt <= 0 or np.abs(np.diff(times) - dt).max() > 1e-9 * abs(dt):
            raise PythtbError("times must be uniformly spaced and "
                              "increasing")
    else:
        dt = float(times[0])
        if dt == 0.0:
            raise PythtbError("a single requested time must be nonzero")
    seed_dt = float(times[0]) - dt  # fractional step to reach times[0]
    psi0 = np.asarray(psi0, dtype=np.complex128)
    squeeze = psi0.ndim == 1
    if squeeze:
        psi0 = psi0[:, None]
    if psi0.shape[0] != h.nsta:
        raise PythtbError("psi0 must have %d components" % h.nsta)
    B = psi0.shape[1]
    shape = (h.norb, 2, B) if h.nspin == 2 else (h.norb, B)
    lo, hi = gershgorin_window(h)
    a = 0.5 * (hi - lo) + 1e-12
    b = 0.5 * (hi + lo)
    M = _cheb_order(a, dt) if order is None else int(order)
    if M < 2:
        raise PythtbError("order must be >= 2 (got %d)" % M)
    # the seed step can be much longer than dt (times[0] >> step); it
    # always gets its own Bessel-safe order -- truncating it at M gave
    # silently non-unitary states (code review)
    M_seed = _cheb_order(a, seed_dt)
    from scipy.special import jv

    def _coef(step, order_):
        nn = np.arange(order_)
        return ((2.0 - (nn == 0)) * (-1.0j) ** nn * jv(nn, a * step)
                * np.exp(-1.0j * b * step))

    ftype = config.float_dtype()
    start = psi0.reshape(shape)
    if abs(seed_dt) > 1e-12 * max(abs(dt), 1.0):
        # one fractional (possibly backward) Bessel-safe step so the
        # scan lands exactly on times[0], times[0] + dt, ... -- fused
        # with the scan in one device program
        out = jax.device_get(_cheb_evolve_seeded_jit(
            h, jnp.asarray([a, b], ftype),
            host_pack(_coef(seed_dt, M_seed)), host_pack(_coef(dt, M)),
            host_pack(start), len(times),
        ))
    else:
        out = jax.device_get(_cheb_evolve_jit(
            h, jnp.asarray([a, b], ftype), host_pack(_coef(dt, M)),
            host_pack(start), len(times),
        ))
    psi_t = host_unpack(out).reshape(len(times), h.nsta, B)
    return psi_t[:, :, 0] if squeeze else psi_t


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _init_states_jit(static, data, occ, nk, mesh=None):
    """Occupied eigenstates on the grid, ri-packed (B, nocc, S); with
    a mesh the k-batch is GSPMD-sharded."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    kpts = device_uniform_grid(nk, jnp.zeros((static.dim_k,),
                                             config.float_dtype()))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    _, v = eigh_batched(assemble(static, data, kpts))
    return pack_cplx(v[:, jnp.asarray(occ, jnp.int32), :])


@partial(jax.jit, static_argnums=(0, 3, 5))
def _echo_jit(static_f, data_f, u0_ri, nk, times, mesh=None):
    """ln L(t) for the whole time batch: eigendecompose H_f on the
    grid once, build overlap determinants det M_k(t) for every time by
    phase-twisted projection.  With a mesh the k-batch (and hence the
    determinant products) run data-parallel; the time reduction psums."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    hp = jax.lax.Precision.HIGHEST
    kpts = device_uniform_grid(nk, jnp.zeros((static_f.dim_k,),
                                             config.float_dtype()))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    Hf = assemble(static_f, data_f, kpts)
    ef, vf = eigh_batched(Hf)  # rows are states
    u0 = unpack_cplx(u0_ri)  # (B, nocc, S) initial occupied states
    # A[k, m, j] = <u0_m | f_j>: expansion of the initial states in the
    # final eigenbasis
    A = jnp.einsum("bms,bjs->bmj", jnp.conj(u0), vf, precision=hp)
    # M_k(t) = A e^{-i e_f t} A^H ; ln L = 2 sum_k ln |det M_k|
    def one_t(t):
        ph = jnp.exp(jax.lax.complex(jnp.zeros_like(ef), -ef * t))
        Mt = jnp.einsum("bmj,bj,bnj->bmn", A, ph, jnp.conj(A),
                        precision=hp)
        sign, logdet = jnp.linalg.slogdet(Mt)
        return 2.0 * jnp.sum(logdet)

    return jax.vmap(one_t)(times)


def quench_echo(model_i, model_f, occ, nk, times):
    """Loschmidt rate function of a sudden quench, one device program.

    Prepare the filled ``occ`` bands of ``model_i`` at every point of
    an ``nk`` grid, evolve each Slater determinant with ``model_f``,
    and return ``g(t) = -(1/(N_k n_occ)) ln prod_k |det M_k(t)|^2``.

    Cusps in g(t) (dynamical quantum phase transitions) appear iff the
    quench crosses a topological transition in the standard two-band
    cases -- the SSH cusp times are a committed oracle.

    :param model_i: initial model (ground state source)
    :param model_f: final model (generator of the evolution); must
      share the initial model's state space and periodicity
    :param occ: occupied band indices
    :param nk: grid sizes, one per periodic direction
    :param times: (nt,) times
    :returns: (nt,) float rate function g(t)
    """
    si, di = model_i._get_finalized()
    sf, df = model_f._get_finalized()
    if si.dim_k == 0:
        raise PythtbError("quench_echo needs a periodic model (use "
                          "evolve() for finite samples)")
    if (si.nsta, si.dim_k) != (sf.nsta, sf.dim_k):
        raise PythtbError("model_i and model_f must share the state "
                          "space and periodic dimensions")
    if np.abs(np.asarray(model_i._orb) - np.asarray(model_f._orb)).max() > 1e-12:
        raise PythtbError("model_i and model_f must share orbital "
                          "positions (same cell geometry)")
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if (len(occ) == 0 or len(set(occ)) != len(occ)
            or min(occ) < 0 or max(occ) >= si.nsta):
        raise PythtbError(
            "occ must be distinct band indices in [0, %d)" % si.nsta)
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != si.dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % si.dim_k)
    times = np.asarray(times, dtype=np.float64)

    from .parallel import mesh as pmesh

    mesh = pmesh.current_mesh()
    u0_ri = _init_states_jit(si, di, occ, nk, mesh)
    lnL = jax.device_get(_echo_jit(
        sf, df, u0_ri, nk, jnp.asarray(times, config.float_dtype()), mesh
    ))
    N = int(np.prod(nk)) * len(occ)
    return -np.asarray(lnL, dtype=np.float64) / N
