"""Anderson / quasiperiodic localization toolkit.

Beyond-reference capability (the reference at
``/root/reference/pythtb.py`` has no disorder or transport machinery at
all): quantitative localization physics for 1-D chains and quasi-1-D
strips built from any :class:`~pythtb_tpu.tb_model` with one periodic
direction.

* :func:`lyapunov_spectrum` / :func:`localization_length` -- the full
  Lyapunov spectrum of the transfer-matrix product over ``length``
  principal layers, QR-re-orthonormalized every ``stride`` steps.  The
  whole (realizations x energies) batch advances through ONE
  ``lax.scan`` program: per step a batched (2S, 2S) matmul, per macro
  step a batched QR -- both MXU-native.  The localization length is
  ``1 / gamma_min`` with ``gamma_min`` the smallest positive exponent
  (exponents come in +-pairs by the symplectic structure of the
  transfer matrix).
* :func:`participation_ratio` -- (generalized) participation ratios of
  eigenstates of finite samples.
* :func:`level_spacing_ratio` -- the Oganesyan-Huse consecutive-gap
  ratio ``r = <min(s_n, s_n+1) / max(s_n, s_n+1)>`` (no unfolding
  needed); Poisson = 2 ln 2 - 1 = 0.386294, GOE = 0.53070,
  GUE = 0.59975.

Oracle strategy (``tests/test_localization.py``):

* clean chain outside the band: ``gamma(E) = arccosh(|E| / 2|t|)``
  exactly (constant transfer matrix);
* clean strip: transverse channels decouple, so
  ``gamma_min(E) = min_c gamma_chain(E - eps_c)`` over the transverse
  eigenvalues ``eps_c`` -- an independent pin of the S > 1 block
  bookkeeping;
* the THOULESS identity on one frozen disorder realization:
  ``gamma_max = (1/L) sum_j ln|E - eps_j| - ln|t|`` with ``eps_j`` the
  exact eigenvalues of the SAME open chain (an algebraic identity up
  to O(1/L) boundary terms -- a differential oracle against the dense
  eigensolver, no statistics involved);
* Aubry-Andre: ``gamma = ln(lambda / 2t)`` for every energy in the
  spectrum when ``lambda > 2t`` (Aubry duality; exact), ``gamma = 0``
  below the self-dual point.

Gotcha recorded for posterity: the transfer-matrix construction needs
an INVERTIBLE inter-layer block ``H01``.  Chains/strips with plain
nearest-layer hopping always qualify; models whose H01 is structurally
rank-deficient (orbitals that only couple within a layer) do not, and
:func:`lyapunov_spectrum` raises with the measured condition number
rather than silently amplifying roundoff.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .ops.hamiltonian import assemble
from .surface import _layer_blocks, _one_sided
from .utils.xfer import host_pack, unpack_cplx

__all__ = [
    "lyapunov_spectrum",
    "localization_length",
    "participation_ratio",
    "level_spacing_ratio",
]


@partial(jax.jit, static_argnums=(3, 4, 5, 9))
def _lyapunov_jit(h00_ri, h01_ri, energies, length, stride, ndis,
                  pot, W, key, mesh=None):
    """Batched QR-stabilized transfer-matrix scan.

    Returns Lyapunov log-sums ``(ndis, nE, 2S)`` (unsorted; the host
    divides by ``length`` and sorts).  The per-step onsite is
    ``pot[l % len(pot)] + W * uniform(-1/2, 1/2)``; one disorder draw
    is shared across all energies (one physical sample probed at every
    E) and distinct across realizations.  With a mesh, the energy
    batch is GSPMD-sharded (the scan carries no cross-energy terms, so
    no collectives are needed until the host fetch).
    """
    ctype = config.complex_dtype()
    ftype = config.float_dtype()
    hp = jax.lax.Precision.HIGHEST
    h00 = unpack_cplx(h00_ri)
    h01 = unpack_cplx(h01_ri)
    S = h00.shape[-1]
    nE = energies.shape[0]
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        energies = shard_grid_axis0(energies, mesh)

    h01inv = jnp.linalg.solve(h01, jnp.eye(S, dtype=ctype))
    # psi_{l+1} = H01^-1 (E - H00 - diag(w_l)) psi_l
    #           - H01^-1 H01^dag psi_{l-1}
    A_E = (energies.astype(ctype)[:, None, None] * h01inv[None]
           - (h01inv @ h00)[None])  # (nE, S, S)
    Bm = -h01inv @ jnp.conj(h01.T)  # (S, S)

    nmacro = length // stride
    tiny = jnp.asarray(np.finfo(np.dtype(ftype)).tiny, ftype)
    Q0 = jnp.broadcast_to(jnp.eye(2 * S, dtype=ctype)[None, None],
                          (ndis, nE, 2 * S, 2 * S))
    lyap0 = jnp.zeros((ndis, nE, 2 * S), dtype=ftype)
    plen = pot.shape[0]

    def macro(carry, im):
        Q, lyap = carry

        def step(Q, il):
            gstep = im * stride + il
            w = pot[gstep % plen][None, :]  # (1, S)
            kw = jax.random.fold_in(key, gstep)
            w = w + W * (jax.random.uniform(kw, (ndis, S),
                                            dtype=ftype) - 0.5)
            # H01^-1 diag(w): columns of H01^-1 scaled by w
            dcol = jnp.einsum("st,dt->dst", h01inv, w.astype(ctype),
                              precision=hp)
            Qt, Qb = Q[..., :S, :], Q[..., S:, :]
            top = jnp.einsum("est,detq->desq", A_E, Qt, precision=hp)
            top = top - jnp.einsum("dst,detq->desq", dcol, Qt,
                                   precision=hp)
            top = top + jnp.einsum("st,detq->desq", Bm, Qb,
                                   precision=hp)
            return jnp.concatenate([top, Qt], axis=-2), None

        Q, _ = jax.lax.scan(step, Q, jnp.arange(stride))
        Q, R = jnp.linalg.qr(Q)
        diag = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))
        lyap = lyap + jnp.log(jnp.maximum(diag.astype(ftype), tiny))
        return (Q, lyap), None

    (_, lyap), _ = jax.lax.scan(macro, (Q0, lyap0), jnp.arange(nmacro))
    return lyap


def _pack_dev(z):
    """ri-pack a complex device array (trailing [re, im] float axis)."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


@partial(jax.jit, static_argnums=(0,))
def _h00_jit(static, data, k0):
    return _pack_dev(assemble(static, data, k0))


@partial(jax.jit, static_argnums=(0,))
def _h01_jit(static, data, k0):
    return _pack_dev(_one_sided(static, data, k0))


def _blocks_dense(model):
    """Dense (H00, H01, m) principal-layer blocks of a dim_k == 1
    model (m = supercell factor used to reach nearest-layer form)."""
    if model._dim_k != 1:
        raise PythtbError(
            "lyapunov_spectrum needs a model with exactly one periodic "
            "direction (dim_k == 1); got dim_k = %d.  Cut or reduce "
            "the model to a chain / strip first." % model._dim_k)
    static00, static01, data00, data01, m = _layer_blocks(
        model, model._per[0])
    k0 = jnp.zeros((1, 0), config.float_dtype())
    h00 = np.asarray(jax.device_get(_h00_jit(static00, data00, k0)),
                     dtype=np.float64)
    h01 = np.asarray(jax.device_get(_h01_jit(static01, data01, k0)),
                     dtype=np.float64)
    H00 = h00[0, ..., 0] + 1j * h00[0, ..., 1]
    H01 = h01[0, ..., 0] + 1j * h01[0, ..., 1]
    return H00, H01, m


def lyapunov_spectrum(model, energies, length, disorder=0.0,
                      potential=None, realizations=1, seed=0,
                      stride=8):
    """Full Lyapunov spectrum of the principal-layer transfer-matrix
    product of a ``dim_k == 1`` model.

    The model's one periodic direction defines the chain of principal
    layers (hops of range > 1 are blocked into enlarged layers exactly
    as in :func:`pythtb_tpu.surface.spectral_function`); ``length``
    counts principal layers (= unit cells / m, reported when m > 1).
    One compiled program advances the whole (realizations, energies)
    batch; exponents are per principal-layer step.

    :param model: :class:`tb_model` with dim_k == 1 (any dim_r, nspin)
    :param energies: scalar or 1-D array of probe energies
    :param length: number of transfer steps (principal layers)
    :param disorder: uniform onsite disorder full width W (each state
      in each layer draws from ``[-W/2, W/2]`` independently per
      layer; all energies share the draw, realizations differ)
    :param potential: optional deterministic per-layer onsite sequence
      added on top: ``(L, S)``, or ``(L,)`` when S == 1 (the
      quasiperiodic-chain case), or ``(S,)`` for a layer-independent
      profile; L is tiled periodically if shorter than ``length``
    :param realizations: independent disorder samples
    :param seed: PRNG seed for the disorder draws
    :param stride: steps between QR re-orthonormalizations (8 is safe
      in f32 up to |gamma| ~ 2; lower it for strongly evanescent E)
    :returns: ``(realizations, nE, 2S)`` exponents per layer step,
      sorted descending along the last axis (``+-gamma`` pairs)
    """
    energies = np.atleast_1d(np.asarray(energies, dtype=float))
    if energies.ndim != 1:
        raise PythtbError("energies must be a scalar or 1-D array")
    H00, H01, _m = _blocks_dense(model)
    S = H00.shape[0]
    cond = np.linalg.cond(H01)
    if not np.isfinite(cond) or cond > 1e12:
        raise PythtbError(
            "the inter-layer block H01 is numerically singular "
            "(cond = %.2e): this model has no transfer-matrix "
            "formulation.  Orbitals that do not couple to the next "
            "layer must be eliminated (or grouped) first." % cond)
    length = int(length)
    stride = max(1, min(int(stride), length))
    length -= length % stride
    if length <= 0:
        raise PythtbError("length must be >= 1 step")
    disorder = float(disorder)
    if disorder < 0:
        raise PythtbError("disorder width must be >= 0")
    if potential is None:
        pot = np.zeros((1, S))
    else:
        pot = np.asarray(potential, dtype=float)
        if pot.ndim == 1:
            if S == 1:
                pot = pot[:, None]
            elif pot.shape[0] == S:
                pot = pot[None, :]
            else:
                raise PythtbError(
                    "1-D potential must have length S = %d (per-state "
                    "profile) for this strip; give (L, S) for a "
                    "layer-dependent sequence" % S)
        if pot.ndim != 2 or pot.shape[1] != S:
            raise PythtbError(
                "potential must be (L,), (S,) or (L, S) with S = %d "
                "states per principal layer" % S)
    ftype = config.float_dtype()
    from .parallel import mesh as pmesh

    lyap = np.asarray(jax.device_get(_lyapunov_jit(
        jnp.asarray(host_pack(H00), ftype),
        jnp.asarray(host_pack(H01), ftype),
        jnp.asarray(energies, ftype), length, stride,
        int(realizations), jnp.asarray(pot, ftype),
        jnp.asarray(disorder, ftype),
        jax.random.PRNGKey(int(seed)),
        pmesh.current_mesh())), dtype=np.float64)
    return -np.sort(-lyap / float(length), axis=-1)


def localization_length(model, energies, length, disorder=0.0,
                        potential=None, realizations=1, seed=0,
                        stride=8):
    """Localization length ``xi(E) = 1 / gamma_min(E)`` (in principal
    layers) from :func:`lyapunov_spectrum`.

    ``gamma_min`` is the smallest positive Lyapunov exponent -- rank
    S of the descending spectrum (the lower half mirrors it with a
    minus sign) -- averaged over realizations.  Returns ``(nE,)``
    lengths (``inf`` where ``gamma_min <= 0`` within roundoff, i.e.
    extended at this sample length).
    """
    lyap = lyapunov_spectrum(model, energies, length, disorder,
                             potential, realizations, seed, stride)
    S = lyap.shape[-1] // 2
    gmin = lyap[..., S - 1].mean(axis=0)
    with np.errstate(divide="ignore"):
        return np.where(gmin > 0.0, 1.0 / np.maximum(gmin, 1e-300),
                        np.inf)


def participation_ratio(states, q=2, spinful=False):
    """(Generalized) participation ratios of a batch of states.

    ``PR_q = (sum_i p_i)^q / sum_i p_i^q`` with ``p_i = |psi_i|^2``
    per site; for q = 2 this is the standard participation ratio (the
    number of sites a state effectively occupies: L for a plane wave
    on an L-site ring, 2L/3 for an open-chain standing wave, 1 for a
    single-site state).  States need not be normalized.

    :param states: (..., norb) amplitudes, or (..., norb, 2) with
      ``spinful=True`` (the layout :meth:`tb_model.solve_all` returns
      with ``eig_vectors=True``); spin is summed into the site weight
    :param q: moment order (q > 1; fractional is fine)
    :param spinful: collapse a trailing spin axis of length 2
    :returns: (...,) participation ratios
    """
    if float(q) <= 1:
        raise PythtbError("participation_ratio needs q > 1")
    p = np.abs(np.asarray(states)) ** 2
    if spinful:
        if p.shape[-1] != 2:
            raise PythtbError("spinful=True needs a trailing spin "
                              "axis of length 2")
        p = p.sum(axis=-1)
    norm = p.sum(axis=-1)
    return norm ** float(q) / (p ** float(q)).sum(axis=-1)


def level_spacing_ratio(evals, mean=True):
    """Oganesyan-Huse consecutive-gap ratio of a spectrum.

    ``r_n = min(s_n, s_{n+1}) / max(s_n, s_{n+1})`` with
    ``s_n = E_{n+1} - E_n``; unfolding-free.  Reference values:
    Poisson ``2 ln 2 - 1 = 0.386294``, GOE ``0.53070``, GUE
    ``0.59975`` (pinned by the committed random-matrix oracles).

    :param evals: (..., N) spectra (sorted along the last axis
      internally; leading axes = independent samples)
    :param mean: return the grand mean (default) or the (..., N-2)
      per-gap ratios
    """
    ev = np.sort(np.asarray(evals, dtype=np.float64), axis=-1)
    s = np.diff(ev, axis=-1)
    lo = np.minimum(s[..., :-1], s[..., 1:])
    hi = np.maximum(s[..., :-1], s[..., 1:])
    r = lo / np.maximum(hi, 1e-300)
    return float(r.mean()) if mean else r
