"""Coherent quantum transport: Landauer conductance by NEGF.

The reference has no transport story at all; this module adds the
standard two-terminal Landauer-Buttiker machinery on top of the
package's Sancho-Rubio decimation (:mod:`pythtb_tpu.surface`):

    T(E) = Tr[ Gamma_L G_D Gamma_R G_D^dag ],
    G_D = [(E + i eta) - H_D - Sigma_L - Sigma_R]^{-1},
    Sigma_L = V^dag g_L V,   Sigma_R = V g_R V^dag,
    Gamma = i (Sigma - Sigma^dag),

with ``g_L/R`` the left/right lead surface Green's functions from the
same fixed-depth decimation scan that powers
:func:`pythtb_tpu.surface.spectral_function` -- the whole energy batch
is ONE device program.

Leads are described by any 1-D periodic model (typically
``ribbon = model2d.cut_piece(W, 1)``): the principal-layer blocks
H00/H01 come from :func:`pythtb_tpu.surface._layer_blocks`, so
second-neighbor-and-beyond couplings along the wire are handled by the
same supercell enlargement the surface module uses.  The device region
defaults to one pristine principal layer and accepts any Hermitian
matrix of the same size (e.g. ``H00 + diag(disorder)``) -- enough for
quantum point contacts, single impurities, and Anderson wires.

Oracle (committed): a PRISTINE wire's transmission is EXACTLY the
number of propagating modes at E -- an integer staircase computed
independently by counting band crossings of the lead dispersion;
disorder can only reduce it (0 <= T <= T_pristine); a strong barrier
suppresses it exponentially.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx

__all__ = ["landauer_transmission", "thermoelectrics", "lead_blocks",
           "mode_count", "multi_terminal", "buttiker", "hall_bar"]


def lead_blocks(lead_model):
    """Principal-layer blocks of a 1-D lead: ``(H00, H01)`` dense
    complex matrices (H00 Hermitian intra-layer, H01 the one-sided
    coupling INTO the next layer along the wire).  Multi-cell hopping
    ranges are folded by the same supercell construction as
    :mod:`pythtb_tpu.surface`."""
    from .surface import _layer_blocks

    if lead_model._dim_k != 1:
        raise PythtbError(
            "lead_blocks needs a 1-D periodic lead (cut_piece a ribbon "
            "from a higher-dimensional model first)"
        )
    surf_dir = int(lead_model._per[0])
    s00, s01, d00, d01, _m = _layer_blocks(lead_model, surf_dir)
    H00_ri, H01_ri = jax.device_get(_lead_blocks_jit(s00, s01, d00, d01))
    return host_unpack(H00_ri), host_unpack(H01_ri)


@partial(jax.jit, static_argnums=(0, 1))
def _lead_blocks_jit(s00, s01, d00, d01):
    from .ops.hamiltonian import assemble
    from .surface import _one_sided

    kpar = jnp.zeros((1, 0), config.float_dtype())
    return (pack_cplx(assemble(s00, d00, kpar)[0]),
            pack_cplx(_one_sided(s01, d01, kpar)[0]))


def _sancho_scan(H00, a0, wI, iters):
    """Shared Sancho-Rubio decimation (same recursion as
    surface._spectral_jit, incl. its convergence diagnostics): returns
    (surface G, residual, peak coupling) -- residual is the final
    effective coupling over the bare scale; a huge peak marks eta -> 0
    overflow where the residual spuriously reads 0."""
    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)
    eye = jnp.eye(H00.shape[-1], dtype=H00.dtype)
    es = jnp.broadcast_to(H00, wI.shape)
    e = es
    a = jnp.broadcast_to(a0, wI.shape)
    b = jnp.conj(jnp.swapaxes(a, -1, -2))

    def step(carry, _):
        es, e, a, b, peak = carry
        g = jnp.linalg.solve(wI - e, jnp.broadcast_to(eye, e.shape))
        agb = mm(a, mm(g, b))
        bga = mm(b, mm(g, a))
        a_n = mm(a, mm(g, a))
        peak = jnp.maximum(peak, jnp.max(jnp.abs(a_n)))
        return (es + agb, e + agb + bga, a_n, mm(b, mm(g, b)), peak), None

    peak0 = jnp.max(jnp.abs(a))
    (es, _, a_f, _, peak), _ = jax.lax.scan(
        step, (es, e, a, b, peak0), None, length=iters)
    Gs = jnp.linalg.solve(wI - es, jnp.broadcast_to(eye, es.shape))
    scale = jnp.maximum(jnp.max(jnp.abs(a0)), 1e-30)
    res = jnp.max(jnp.abs(a_f)) / scale
    blow = (1e30 if jnp.real(jnp.zeros(0, H00.dtype)).dtype
            == jnp.float32 else 1e50)
    res = jnp.where(peak / scale > blow, jnp.inf, res)
    return Gs, res


@partial(jax.jit, static_argnums=(0, 1, 7, 8))
def _landauer_jit(s00, s01, d00, d01, Hd_ri, energies, eta, iters,
                  mesh=None):
    """T(E) for the whole energy batch in ONE program: lead blocks
    assembled in-jit, BOTH lead orientations decimated in one stacked
    scan, and the multi-layer device solved by the recursive Green's
    function sweep (O(nlay S^3) per energy, only G_{N1} formed).  With
    a (static) ``mesh``, the energy batch is GSPMD-sharded over the
    devices -- every downstream solve/matmul is data-parallel in E, so
    the only collective is the final gather."""
    from .ops.hamiltonian import assemble
    from .surface import _one_sided

    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)
    kpar = jnp.zeros((1, 0), config.float_dtype())
    H00 = assemble(s00, d00, kpar)[0]
    H01 = _one_sided(s01, d01, kpar)[0]
    Hd = unpack_cplx(Hd_ri)  # (nlay, S, S)
    nlay = Hd.shape[0]
    S = H00.shape[-1]
    ctype = H00.dtype
    eye = jnp.eye(S, dtype=ctype)
    w = (energies.astype(jnp.real(jnp.zeros(0, ctype)).dtype)
         + 1j * jnp.asarray(eta, ctype))
    wI = w[:, None, None] * eye  # (E, S, S)
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        wI = shard_grid_axis0(wI, mesh)

    # both lead orientations in one stacked decimation scan
    H01d = jnp.conj(H01.T)
    a0 = jnp.stack([H01d, H01])[:, None]  # (2, 1, S, S)
    wI2 = jnp.broadcast_to(wI[None], (2,) + wI.shape)
    G2, res = _sancho_scan(H00[None, None], a0, wI2, iters)
    gL, gR = G2[0], G2[1]
    SigL = mm(jnp.broadcast_to(H01d[None], wI.shape),
              mm(gL, jnp.broadcast_to(H01[None], wI.shape)))
    SigR = mm(jnp.broadcast_to(H01[None], wI.shape),
              mm(gR, jnp.broadcast_to(H01d[None], wI.shape)))
    GamL = 1j * (SigL - jnp.conj(jnp.swapaxes(SigL, -1, -2)))
    GamR = 1j * (SigR - jnp.conj(jnp.swapaxes(SigR, -1, -2)))

    # left-connected RGF sweep along the device chain; the last layer
    # absorbs Sigma_R.  P_l = G_{l,1} (retarded), so T = Tr[Gamma_R
    # G_{N1} Gamma_L G_{N1}^dag] (Caroli).
    def a_ll(l_H, extra):
        return wI - l_H[None] - extra

    g1 = jnp.linalg.solve(
        a_ll(Hd[0], SigL + (SigR if nlay == 1 else 0.0)),
        jnp.broadcast_to(eye, wI.shape))
    if nlay == 1:
        GN1 = g1
    else:
        def layer_step(carry, l_Hd):
            gprev, P = carry
            hop = mm(jnp.broadcast_to(H01d[None], wI.shape),
                     mm(gprev, jnp.broadcast_to(H01[None], wI.shape)))
            g = jnp.linalg.solve(a_ll(l_Hd, hop),
                                 jnp.broadcast_to(eye, wI.shape))
            P = mm(g, mm(jnp.broadcast_to(H01d[None], wI.shape), P))
            return (g, P), None

        (gprev, P), _ = jax.lax.scan(layer_step, (g1, g1), Hd[1:-1])             if nlay > 2 else ((g1, g1), None)
        # final layer with Sigma_R
        hop = mm(jnp.broadcast_to(H01d[None], wI.shape),
                 mm(gprev, jnp.broadcast_to(H01[None], wI.shape)))
        gN = jnp.linalg.solve(a_ll(Hd[-1], hop + SigR),
                              jnp.broadcast_to(eye, wI.shape))
        GN1 = mm(gN, mm(jnp.broadcast_to(H01d[None], wI.shape), P))
    T = jnp.einsum("eab,ebc,ecd,eda->e", GamR, GN1, GamL,
                   jnp.conj(jnp.swapaxes(GN1, -1, -2)), precision=hp)
    return jnp.real(T), res


def landauer_transmission(lead_model, energies, device=None, eta=1e-6,
                          iters=60, spin_resolved=False):
    """Two-terminal Landauer transmission ``T(E)`` (conductance in
    units of ``2 e^2 / h`` per spin convention of the model), the
    whole energy batch in ONE device program.

    :param lead_model: 1-D periodic lead (e.g. a ribbon from
      ``cut_piece``); both leads are copies of it
    :param energies: (nE,) energies
    :param device: scattering region in the principal-layer basis
      (default: one pristine layer H00): a Hermitian (S, S) matrix or
      a LIST of them -- consecutive layers chained by the lead's H01
      (barriers of any length, Anderson wires; solved by the
      recursive Green's function sweep, O(nlay S^3) per energy).
      Build blocks from :func:`lead_blocks`, e.g.
      ``[H00 + np.diag(d) for d in ...]``
    :param eta: positive infinitesimal
    :param iters: decimation depth; warns (like
      :func:`pythtb_tpu.surface.spectral_function`) when the effective
      lead coupling has not collapsed -- incl. the eta -> 0 overflow
      mode where the residual alone would spuriously read 0
    :param spin_resolved: for an Sz-CONSERVING spinful lead+device
      (verified numerically: all spin-off-diagonal blocks must vanish,
      else raises), return the per-spin pair ``(nE, 2)`` -- the QSH
      helical channels split as 1 + 1 (tested)
    :returns: (nE,) float transmission, or (nE, 2) spin-resolved
    """
    from .surface import _layer_blocks

    if lead_model._dim_k != 1:
        raise PythtbError(
            "landauer_transmission needs a 1-D periodic lead "
            "(cut_piece a ribbon from a higher-dimensional model first)"
        )
    surf_dir = int(lead_model._per[0])
    s00, s01, d00, d01, _m = _layer_blocks(lead_model, surf_dir)
    if device is None:
        H00, _H01 = lead_blocks(lead_model)
        layers = [H00]
    elif isinstance(device, (list, tuple)):
        layers = [np.asarray(d, dtype=np.complex128) for d in device]
    else:
        layers = [np.asarray(device, dtype=np.complex128)]
    if len(layers) == 0:
        raise PythtbError("device needs at least one layer")
    S = s00.nsta
    for d in layers:
        if d.shape != (S, S):
            raise PythtbError(
                "device layers must be (%d, %d) in the principal-layer "
                "basis (see lead_blocks)" % (S, S))
        if np.abs(d - d.conj().T).max() > 1e-12:
            raise PythtbError("device layers must be Hermitian")
    Hd = np.stack(layers)
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    ftype = config.float_dtype()
    if spin_resolved:
        if s00.nspin != 2:
            raise PythtbError("spin_resolved needs a spinful lead")
        H00, H01 = lead_blocks(lead_model)
        Ts = []
        for sp in (0, 1):
            idx = np.arange(sp, S, 2)
            off = max(
                np.abs(M[np.ix_(idx, np.arange(1 - sp, S, 2))]).max()
                for M in [H00, H01] + layers
            )
            if off > 1e-10:
                raise PythtbError(
                    "spin_resolved requires Sz conservation (largest "
                    "spin-off-diagonal element %.1e)" % off)
            Ts.append(_dense_transmission(
                H00[np.ix_(idx, idx)], H01[np.ix_(idx, idx)],
                np.stack([d[np.ix_(idx, idx)] for d in layers]),
                energies, eta, iters))
        return np.stack(Ts, axis=-1)
    from .parallel import mesh as pmesh

    T, res = jax.device_get(_landauer_jit(
        s00, s01, d00, d01, host_pack(Hd),
        jnp.asarray(energies, ftype), jnp.asarray(float(eta), ftype),
        int(iters), pmesh.current_mesh(),
    ))
    if not float(res) < np.sqrt(float(np.finfo(np.asarray(T).dtype).eps)):
        import warnings

        warnings.warn(
            "landauer_transmission: the lead decimation has not "
            "converged (residual coupling %.1e) -- increase iters or "
            "eta; at very small eta the recursion can overflow and "
            "the result is garbage." % float(res),
            UserWarning, stacklevel=2,
        )
    return np.asarray(T, dtype=np.float64)


@partial(jax.jit, static_argnums=(5, 6))
def _dense_landauer_jit(H00_ri, H01_ri, Hd_ri, energies, eta, iters,
                        mesh=None):
    """Transmission from explicit dense lead blocks (the spin-split
    path): the same stacked decimation + RGF sweep as _landauer_jit,
    energy batch mesh-sharded alike."""
    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)
    H00 = unpack_cplx(H00_ri)
    H01 = unpack_cplx(H01_ri)
    Hd = unpack_cplx(Hd_ri)
    nlay = Hd.shape[0]
    S = H00.shape[-1]
    ctype = H00.dtype
    eye = jnp.eye(S, dtype=ctype)
    w = (energies.astype(jnp.real(jnp.zeros(0, ctype)).dtype)
         + 1j * jnp.asarray(eta, ctype))
    wI = w[:, None, None] * eye
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        wI = shard_grid_axis0(wI, mesh)
    H01d = jnp.conj(H01.T)
    a0 = jnp.stack([H01d, H01])[:, None]
    wI2 = jnp.broadcast_to(wI[None], (2,) + wI.shape)
    G2, res = _sancho_scan(H00[None, None], a0, wI2, iters)
    gL, gR = G2[0], G2[1]
    SigL = mm(jnp.broadcast_to(H01d[None], wI.shape),
              mm(gL, jnp.broadcast_to(H01[None], wI.shape)))
    SigR = mm(jnp.broadcast_to(H01[None], wI.shape),
              mm(gR, jnp.broadcast_to(H01d[None], wI.shape)))
    GamL = 1j * (SigL - jnp.conj(jnp.swapaxes(SigL, -1, -2)))
    GamR = 1j * (SigR - jnp.conj(jnp.swapaxes(SigR, -1, -2)))
    g1 = jnp.linalg.solve(
        wI - Hd[0][None] - SigL - (SigR if nlay == 1 else 0.0),
        jnp.broadcast_to(eye, wI.shape))
    if nlay == 1:
        GN1 = g1
    else:
        def layer_step(carry, l_Hd):
            gprev, P = carry
            hop = mm(jnp.broadcast_to(H01d[None], wI.shape),
                     mm(gprev, jnp.broadcast_to(H01[None], wI.shape)))
            g = jnp.linalg.solve(wI - l_Hd[None] - hop,
                                 jnp.broadcast_to(eye, wI.shape))
            P = mm(g, mm(jnp.broadcast_to(H01d[None], wI.shape), P))
            return (g, P), None

        (gprev, P), _ = jax.lax.scan(layer_step, (g1, g1), Hd[1:-1]) \
            if nlay > 2 else ((g1, g1), None)
        hop = mm(jnp.broadcast_to(H01d[None], wI.shape),
                 mm(gprev, jnp.broadcast_to(H01[None], wI.shape)))
        gN = jnp.linalg.solve(wI - Hd[-1][None] - hop - SigR,
                              jnp.broadcast_to(eye, wI.shape))
        GN1 = mm(gN, mm(jnp.broadcast_to(H01d[None], wI.shape), P))
    T = jnp.einsum("eab,ebc,ecd,eda->e", GamR, GN1, GamL,
                   jnp.conj(jnp.swapaxes(GN1, -1, -2)), precision=hp)
    return jnp.real(T), res


def _dense_transmission(H00, H01, Hd, energies, eta, iters):
    from .parallel import mesh as pmesh

    ftype = config.float_dtype()
    T, res = jax.device_get(_dense_landauer_jit(
        host_pack(np.asarray(H00)), host_pack(np.asarray(H01)),
        host_pack(np.asarray(Hd)), jnp.asarray(energies, ftype),
        jnp.asarray(float(eta), ftype), int(iters),
        pmesh.current_mesh()))
    if not float(res) < np.sqrt(float(np.finfo(np.asarray(T).dtype).eps)):
        import warnings

        warnings.warn(
            "landauer_transmission: the lead decimation has not "
            "converged (residual coupling %.1e)." % float(res),
            UserWarning, stacklevel=3,
        )
    return np.asarray(T, dtype=np.float64)


def mode_count(lead_model, energies, nk=512, stability_h=None):
    """Independent mode counter: the number of propagating channels at
    each energy from the lead dispersion (band crossings around the
    closed k-loop, counted with multiplicity) -- the value of the
    pristine-wire transmission AWAY from band edges.

    CAVEATS (crossing counting): a band extremum tangent to E
    undercounts by its multiplicity, and an exactly sampled ev == E
    point (flat bands) miscounts.  Pass ``stability_h`` to mark
    energies where the count changes under a +-h shift: those entries
    come back as -1 instead of a wrong integer."""
    if lead_model._dim_k != 1:
        raise PythtbError("mode_count needs a 1-D lead")
    ks = (np.arange(nk) / nk)[:, None]
    ev = np.asarray(lead_model.solve_all(ks))  # (nsta, nk)
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    def count(Es):
        out = np.zeros(len(Es), dtype=int)
        for ie, E in enumerate(Es):
            sg = np.sign(ev - E)  # (nsta, nk)
            crossings = np.sum(sg != np.roll(sg, 1, axis=1), axis=1)
            out[ie] = int(np.sum(crossings) // 2)
        return out

    out = count(energies)
    if stability_h is not None:
        h = float(stability_h)
        lo = count(energies - h)
        hi = count(energies + h)
        out = np.where((out == lo) & (out == hi), out, -1)
    return out


# ---------------------------------------------------------------------------
# multi-terminal Landauer-Buttiker
#
# The two-terminal machinery above chains principal layers; a Hall bar
# needs leads hanging off arbitrary edges of a finite scattering
# region.  multi_terminal() takes the device as ONE dense Hermitian
# matrix plus a list of (H00, Hin, W) leads -- H00 the lead surface
# layer, Hin the hop from the surface INTO the next-deeper layer, W the
# (S, N) coupling <lead surface | H | device> -- and returns the full
# T_pq(E) matrix in one device program (every lead decimated by the
# shared Sancho-Rubio scan, the device solved dense, Caroli traces for
# all pairs).  buttiker() inverts the Landauer-Buttiker current
# relations for terminal potentials; hall_bar() builds the standard
# cross geometry from any 2-D model with nearest-cell hops.  The
# flagship oracle (tests): a Haldane Hall cross with leads of the same
# Chern insulator reads R_xy = -h/(C e^2) with R_xx = 0 -- exact
# quantization without any magnetic gauge bookkeeping, robust to
# device disorder until the gap closes.


@partial(jax.jit, static_argnums=(4, 5))
def _multi_terminal_jit(Hd_ri, leads_ri, energies, eta, iters, mesh=None):
    """T_pq(E) for all terminal pairs in one program.

    ``leads_ri``: tuple of (H00_ri, Hin_ri, W_ri) pytrees -- lead
    sizes may differ, so leads are decimated separately (the per-lead
    scan is the same fixed-depth Sancho-Rubio as the two-terminal
    path).  Energy batch mesh-shardable like _landauer_jit."""
    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)
    Hd = unpack_cplx(Hd_ri)  # (N, N)
    N = Hd.shape[-1]
    ctype = Hd.dtype
    eyeN = jnp.eye(N, dtype=ctype)
    w = (energies.astype(jnp.real(jnp.zeros(0, ctype)).dtype)
         + 1j * jnp.asarray(eta, ctype))
    wIN = w[:, None, None] * eyeN  # (E, N, N)
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        wIN = shard_grid_axis0(wIN, mesh)

    Sig = jnp.zeros(wIN.shape, ctype)
    Gammas = []
    res = jnp.zeros((), jnp.real(jnp.zeros(0, ctype)).dtype)
    for H00_ri, Hin_ri, W_ri in leads_ri:
        H00 = unpack_cplx(H00_ri)
        Hin = unpack_cplx(Hin_ri)
        W = unpack_cplx(W_ri)  # (S, N)
        S = H00.shape[-1]
        eyeS = jnp.eye(S, dtype=ctype)
        wIS = w[:, None, None] * eyeS
        if mesh is not None:
            from .ops.solver import shard_grid_axis0

            wIS = shard_grid_axis0(wIS, mesh)
        g, r = _sancho_scan(H00, Hin[None], wIS[None], iters)
        g = g[0]
        res = jnp.maximum(res, r)
        Wb = jnp.broadcast_to(W[None], wIN.shape[:1] + W.shape)
        Sg = mm(jnp.conj(jnp.swapaxes(Wb, -1, -2)), mm(g, Wb))
        Sig = Sig + Sg
        Gammas.append(1j * (Sg - jnp.conj(jnp.swapaxes(Sg, -1, -2))))

    G = jnp.linalg.solve(wIN - Hd[None] - Sig,
                         jnp.broadcast_to(eyeN, wIN.shape))
    Gd = jnp.conj(jnp.swapaxes(G, -1, -2))
    nl = len(Gammas)
    rows = []
    for p in range(nl):
        row = []
        GpG = mm(Gammas[p], G)  # (E, N, N)
        for q in range(nl):
            if q == p:
                row.append(jnp.zeros(wIN.shape[:1], Gd.real.dtype))
                continue
            t = jnp.einsum("eab,ebc,eca->e", GpG, Gammas[q], Gd,
                           precision=hp)
            row.append(jnp.real(t))
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2), res  # (E, p, q)


def multi_terminal(device_h, leads, energies, eta=1e-6, iters=60):
    """Multi-terminal transmission matrix ``T_pq(E)`` (p != q:
    transmission INTO terminal p FROM terminal q; diagonal returned 0).

    :param device_h: dense Hermitian (N, N) scattering-region matrix
      (e.g. from ``ed.dense_h`` of a finite flake, plus disorder)
    :param leads: list of ``(H00, Hin, W)`` per terminal: ``H00`` the
      (S, S) lead surface-layer block, ``Hin`` the (S, S) hop from the
      surface layer INTO the next layer deeper in the lead, ``W`` the
      (S, N) coupling ``<lead surface | H | device>``.  Use
      :func:`hall_bar` to build these for standard geometries.
    :param energies: (nE,) energies
    :returns: (nE, nleads, nleads) float array

    The whole computation -- every lead's Sancho-Rubio decimation, the
    dense device Green's function, and all Caroli traces -- is ONE
    device program batched over energies (mesh-sharded over E under
    ``use_mesh``).  Sum rules ``sum_q T_pq == sum_q T_qp`` (S-matrix
    unitarity) and the two-terminal reduction to
    :func:`landauer_transmission` are pinned in the tests.
    """
    from .parallel import mesh as pmesh

    Hd = np.asarray(device_h, dtype=np.complex128)
    N = Hd.shape[0]
    if Hd.shape != (N, N) or np.abs(Hd - Hd.conj().T).max() > 1e-10:
        raise PythtbError("multi_terminal: device_h must be Hermitian")
    if len(leads) < 2:
        raise PythtbError("multi_terminal needs at least 2 leads")
    packed = []
    for li, (H00, Hin, W) in enumerate(leads):
        H00 = np.asarray(H00, dtype=np.complex128)
        Hin = np.asarray(Hin, dtype=np.complex128)
        W = np.asarray(W, dtype=np.complex128)
        S = H00.shape[0]
        if H00.shape != (S, S) or Hin.shape != (S, S):
            raise PythtbError(
                "multi_terminal: lead %d blocks must be square and "
                "matching" % li)
        if np.abs(H00 - H00.conj().T).max() > 1e-10:
            raise PythtbError("multi_terminal: lead %d H00 not Hermitian"
                              % li)
        if W.shape != (S, N):
            raise PythtbError(
                "multi_terminal: lead %d coupling must be (%d, %d), got "
                "%r" % (li, S, N, W.shape))
        packed.append((host_pack(H00), host_pack(Hin), host_pack(W)))
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    ftype = config.float_dtype()

    def run(Es, et):
        T, res = jax.device_get(_multi_terminal_jit(
            host_pack(Hd), tuple(packed), jnp.asarray(Es, ftype),
            jnp.asarray(float(et), ftype), int(iters),
            pmesh.current_mesh()))
        return np.array(T, dtype=np.float64), float(res)

    T, res = run(energies, eta)
    # The fixed-depth Sancho-Rubio recursion overflows to NaN at
    # isolated energies when eta is very small (slowly-decaying
    # channels near band edges; same mechanism as thermoelectrics'
    # escalation above).  Recompute only the failing energies at
    # escalated eta so the rest of the batch keeps full accuracy.
    import warnings

    bad = ~np.isfinite(T).all(axis=(1, 2))
    n_bad0 = int(bad.sum())
    esc = float(eta)
    for _ in range(2):
        if not bad.any():
            break
        esc *= 32.0
        T[bad], _ = run(energies[bad], esc)
        bad = ~np.isfinite(T).all(axis=(1, 2))
    if n_bad0:
        warnings.warn(
            "multi_terminal: decimation overflowed at %d of %d energies "
            "at eta=%.1e; recomputed them at escalated eta=%.1e%s" % (
                n_bad0, len(energies), eta, esc,
                " (%d still non-finite -- raise eta)" % int(bad.sum())
                if bad.any() else ""),
            UserWarning, stacklevel=2)
    elif not res < np.sqrt(float(np.finfo(T.dtype).eps)):
        warnings.warn(
            "multi_terminal: a lead decimation has not converged "
            "(residual coupling %.1e) -- increase iters or eta."
            % res, UserWarning, stacklevel=2)
    return T


def buttiker(T, source, drain, current=1.0):
    """Terminal potentials from the Landauer-Buttiker current
    relations ``I_p = (e^2/h) [ sum_q T_qp V_p - sum_q T_pq V_q ]``
    with unit current driven ``source -> drain``, every other terminal
    a floating voltage probe (I = 0), and the drain grounded.

    :param T: (nleads, nleads) transmission matrix at one energy (or a
      Fermi-window average), ``T[p, q]`` = into p from q
    :param current: driven current in ``e^2/h * energy`` units
    :returns: (nleads,) potentials ``V_p`` with ``V[drain] = 0``; e.g.
      a Hall resistance is ``(V[pa] - V[pb]) / current`` in h/e^2.

    The solve is gauge-consistent by construction (the conductance
    matrix has exact zero row sums, so only potential DIFFERENCES
    matter) and current-conserving (column sums vanish when T
    satisfies the unitarity sum rule -- warned otherwise).
    """
    import warnings

    T = np.asarray(T, dtype=np.float64)
    nl = T.shape[0]
    if T.shape != (nl, nl):
        raise PythtbError("buttiker: T must be square (one energy)")
    s, d = int(source), int(drain)
    if s == d or not (0 <= s < nl and 0 <= d < nl):
        raise PythtbError("buttiker: bad source/drain")
    sumrule = np.abs(T.sum(axis=0) - T.sum(axis=1)).max()
    # threshold sized for f32 device transmissions (~1e-6 roundoff per
    # entry); a GENUINE unitarity violation (truncated decimation,
    # wrong coupling blocks) is orders of magnitude above it
    if sumrule > 1e-4 * max(T.max(), 1.0):
        warnings.warn(
            "buttiker: T violates the unitarity sum rule by %.1e; "
            "potentials will not conserve current exactly" % sumrule,
            UserWarning, stacklevel=2)
    # G V = I with G_pp = sum_q T_pq, G_pq = -T_pq: EXACT zero row sums
    # (gauge invariance by construction; the row/column choice is
    # equivalent under the unitarity sum rule, warned above when T
    # violates it numerically)
    G = -T.copy()
    G[np.diag_indices(nl)] = T.sum(axis=1)
    I = np.zeros(nl)
    I[s] = float(current)
    I[d] = -float(current)
    keep = [p for p in range(nl) if p != d]
    V = np.zeros(nl)
    V[keep] = np.linalg.solve(G[np.ix_(keep, keep)], I[keep])
    return V


def hall_bar(model, size, lead_width=None, disorder=0.0, seed=0):
    """Four-terminal Hall-cross geometry from a 2-D periodic model.

    The scattering region is an ``Lx x Ly`` open flake of the model;
    four semi-infinite leads of the SAME model attach flush to the
    west/east edges (full height, extending along -x/+x) and the
    south/north edges (full width, extending along -y/+y).  Returns
    ``(device_h, leads, info)`` ready for :func:`multi_terminal`, with
    ``leads`` ordered ``[W, E, S, N]``.

    Using leads of the same gapped model is the gauge-free way to read
    quantized Hall response: inside the bulk gap each lead carries
    only the chiral edge channels, so for a Chern insulator
    ``buttiker`` gives ``R_xy = (V_N - V_S)/I = -h/(C e^2)`` exactly
    and zero longitudinal drop (tests).

    :param model: 2-D periodic model whose hops reach at most one cell
      in each direction (``|R_d| <= 1``; raises otherwise)
    :param size: (Lx, Ly) device cells
    :param lead_width: cells per transverse lead direction (default:
      the full matching edge)
    :param disorder: Anderson onsite disorder strength W in the DEVICE
      region only (uniform in [-W/2, W/2] per site, both spin
      components alike)
    :param seed: disorder RNG seed
    :returns: ``(device_h, leads, info)``; ``info["site"](x, y, orb)``
      maps device coordinates to the flat mode index
    """
    if model._dim_k != 2 or model._dim_r != 2:
        raise PythtbError("hall_bar needs a 2-D periodic model")
    Lx, Ly = (int(x) for x in size)
    if Lx < 2 or Ly < 2:
        raise PythtbError("hall_bar: size must be at least 2 x 2")
    norb = model._norb
    nspin = model._nspin
    hops = []
    for h in model._hoppings:
        amp = np.asarray(h[0], dtype=complex)
        i, j, R = h[1], h[2], np.asarray(h[3], dtype=np.int64)
        if np.abs(R).max() > 1:
            raise PythtbError(
                "hall_bar: hop %r reaches beyond the nearest cell; the "
                "flush lead attachment assumes |R_d| <= 1" % (h,))
        hops.append((amp, i, j, tuple(int(x) for x in R)))
    ons = [np.asarray(model._site_energies[i], dtype=complex)
           for i in range(norb)]

    def block(nr, nc):
        if nspin == 1:
            return np.zeros((nr * norb, nc * norb), dtype=complex)
        return np.zeros((2 * nr * norb, 2 * nc * norb), dtype=complex)

    def put(M, a, b, amp):
        if nspin == 1:
            M[a, b] += amp
        else:
            M[2 * a: 2 * a + 2, 2 * b: 2 * b + 2] += amp

    def put_h(M, a, b, amp):
        put(M, a, b, amp)
        put(M, b, a, amp.conj().T if nspin == 2 else np.conj(amp))

    # ---- device flake: site = (y * Lx + x) * norb + orb ------------
    def dsite(x, y, o):
        return (y * Lx + x) * norb + o

    Nsite = Lx * Ly * norb
    Hd = block(Lx * Ly, Lx * Ly)
    for y in range(Ly):
        for x in range(Lx):
            for o in range(norb):
                a = dsite(x, y, o)
                put(Hd, a, a,
                    ons[o] if nspin == 1 or np.ndim(ons[o]) == 2
                    else ons[o] * np.eye(2))
    for amp, i, j, (rx, ry) in hops:
        for y in range(Ly):
            y2 = y + ry
            if not 0 <= y2 < Ly:
                continue
            for x in range(Lx):
                x2 = x + rx
                if not 0 <= x2 < Lx:
                    continue
                put_h(Hd, dsite(x, y, i), dsite(x2, y2, j), amp)
    if np.ndim(disorder) == 0 and float(disorder) != 0.0:
        delta = np.random.default_rng(seed).uniform(
            -float(disorder) / 2.0, float(disorder) / 2.0, Nsite)
        if nspin == 1:
            Hd[np.diag_indices(Nsite)] += delta
        else:
            Hd[np.diag_indices(2 * Nsite)] += np.repeat(delta, 2)

    # ---- lead column/row blocks ------------------------------------
    # a lead along +-x: transverse cells indexed by y (width Wy); H00
    # is one column with open transverse edges, Hx the hop from a
    # column to the NEXT column toward +x.
    def strip_blocks(width, axis):
        H00 = block(width, width)
        Hfwd = block(width, width)
        for t in range(width):
            for o in range(norb):
                a = t * norb + o
                put(H00, a, a,
                    ons[o] if nspin == 1 or np.ndim(ons[o]) == 2
                    else ons[o] * np.eye(2))
        for amp, i, j, R in hops:
            ra = R[axis]        # along the lead
            rt = R[1 - axis]    # transverse
            for t in range(width):
                t2 = t + rt
                if not 0 <= t2 < width:
                    continue
                a, b = t * norb + i, t2 * norb + j
                if ra == 0:
                    put_h(H00, a, b, amp)
                elif ra == 1:
                    put(Hfwd, a, b, amp)
                else:
                    put(Hfwd, b, a,
                        amp.conj().T if nspin == 2 else np.conj(amp))
        return H00, Hfwd

    # ---- couplings device <-> lead surface --------------------------
    # W rows: lead surface sites; columns: device sites.  Every hop is
    # first canonicalized so its lead->device crossing points along the
    # needed direction (a device->lead hop is the Hermitian partner of
    # a lead->device hop with (amp^dag, j, i, -R)); then one uniform
    # loop fills W_{s,n} = <lead s | H | device n>.
    def canonical(axis, sign):
        """Hops re-expressed so R[axis] == sign (lead -> device)."""
        out = []
        for amp, i, j, R in hops:
            if R[axis] == sign:
                out.append((amp, i, j, R[1 - axis]))
            elif R[axis] == -sign:
                out.append((amp.conj().T if nspin == 2 else np.conj(amp),
                            j, i, -R[1 - axis]))
        return out

    def coupling(side, width, offset):
        S = (2 if nspin == 2 else 1) * width * norb
        Ndev = (2 if nspin == 2 else 1) * Nsite
        W = np.zeros((S, Ndev), dtype=complex)
        axis = 0 if side in ("W", "E") else 1
        # direction of the lead->device crossing along `axis`
        sign = 1 if side in ("W", "S") else -1
        edge = {"W": 0, "E": Lx - 1, "S": 0, "N": Ly - 1}[side]
        tmax = Ly if axis == 0 else Lx
        for amp, i, j, rt in canonical(axis, sign):
            for t in range(width):
                td = offset + t + rt  # transverse device coordinate
                if not 0 <= td < tmax:
                    continue
                dev = dsite(edge, td, j) if axis == 0 else dsite(td, edge, j)
                put(W, t * norb + i, dev, amp)
        return W

    wy = int(lead_width) if lead_width is not None else Ly
    wx = int(lead_width) if lead_width is not None else Lx
    if wy > Ly or wx > Lx:
        raise PythtbError("hall_bar: lead_width exceeds the device edge")
    offy = (Ly - wy) // 2
    offx = (Lx - wx) // 2
    H00y, Hx = strip_blocks(wy, 0)   # leads along x (W/E)
    H00x, Hy = strip_blocks(wx, 1)   # leads along y (S/N)
    Hxd = Hx.conj().T
    Hyd = Hy.conj().T
    leads = [
        (H00y, Hxd, coupling("W", wy, offy)),   # west: deeper = -x
        (H00y, Hx, coupling("E", wy, offy)),    # east: deeper = +x
        (H00x, Hyd, coupling("S", wx, offx)),   # south: deeper = -y
        (H00x, Hy, coupling("N", wx, offx)),    # north: deeper = +y
    ]
    info = {"order": ["W", "E", "S", "N"], "site": dsite,
            "size": (Lx, Ly), "lead_width": (wy, wy, wx, wx)}
    return Hd, leads, info


def thermoelectrics(lead_model, mu, temperature, device=None,
                    e_window=None, n_energies=801, eta=1e-6, iters=60):
    """Linear-response thermoelectric coefficients from the Landauer
    integrals ``L_n = int dE (-df/dE) (E - mu)^n T(E)``:

    * ``G = L_0`` -- conductance (2 e^2/h units, matching
      :func:`landauer_transmission`);
    * ``S = -(k_B/e) L_1 / (k_B T L_0)`` -- Seebeck coefficient in
      k_B/e units;
    * ``kappa_e = (L_2 - L_1^2 / L_0) / T`` -- electronic thermal
      conductance in k_B^2 T/h-style units.

    Committed oracles: the Mott relation ``S ~ -(pi^2/3) k_B T
    d ln T(E)/dE`` at low temperature (independent numerical E
    derivative) and Wiedemann-Franz ``kappa_e / (G T) -> pi^2/3``.

    :param mu: chemical potential (scalar or (nmu,))
    :param temperature: k_B T > 0
    :param e_window: (lo, hi) integration window (default: mu +-
      12 k_B T around the extreme mus)
    :param n_energies: MINIMUM number of integration energies; the grid
      is automatically refined so the Fermi window stays resolved
      (dE <= k_B T / 4), capped at 50001 points with a warning
    :returns: dict with ``"G"``, ``"S"``, ``"kappa_e"`` (each (nmu,)
      or scalar to match mu).  When mu sits in a transport gap
      (``G`` below the numerical noise floor of the integration) the
      ratios ``S`` and ``kappa_e`` are ill-conditioned 0/0 forms and
      are returned as NaN with a ``UserWarning`` (mirroring the
      decimation-convergence diagnostics).
    """
    import warnings

    if float(temperature) <= 0.0:
        raise PythtbError("thermoelectrics requires temperature > 0")
    mus = np.atleast_1d(np.asarray(mu, dtype=np.float64))
    kt = float(temperature)
    if e_window is None:
        e_window = (mus.min() - 12.0 * kt, mus.max() + 12.0 * kt)
    window = float(e_window[1]) - float(e_window[0])
    # a wide mu sweep must not under-resolve the ~kT Fermi window: keep
    # dE <= kT/4 (ADVICE r3), capped so a pathological window cannot
    # explode the device batch
    n_resolve = int(np.ceil(window / (0.25 * kt))) + 1
    n_use = max(int(n_energies), n_resolve)
    if n_use > 50001:
        warnings.warn(
            "thermoelectrics: resolving the Fermi window over this "
            "e_window needs %d energies; capping at 50001 (dE = %.3g kT "
            "> kT/4) -- narrow e_window or raise temperature"
            % (n_use, window / 50000.0 / kt),
            UserWarning, stacklevel=2,
        )
        n_use = 50001
    Es = np.linspace(float(e_window[0]), float(e_window[1]), n_use)
    T = np.asarray(landauer_transmission(lead_model, Es, device=device,
                                         eta=eta, iters=iters),
                   dtype=np.float64)
    # f32 hardware: the Sancho-Rubio recursion overflows to NaN at
    # isolated energies (band-edge tangencies) even when the bulk of
    # the grid is fine -- measured: 17/201 NaN on the graphene ribbon
    # at eta=1e-5, poisoning every L_n integral (WF read NaN on the
    # chip).  Escalate eta locally on the failing energies, then
    # interpolate any holdouts from finite neighbors (a dense grid,
    # dE <= kT/4, so linear fill-in is far below integration error).
    bad = ~np.isfinite(T)
    n_bad0 = int(bad.sum())
    esc = float(eta)
    for _ in range(2):
        if not bad.any():
            break
        esc *= 32.0
        T[bad] = np.asarray(landauer_transmission(
            lead_model, Es[bad], device=device, eta=esc, iters=iters),
            dtype=np.float64)
        bad = ~np.isfinite(T)
    n_holdout = int(bad.sum())
    if bad.any():
        good = np.where(~bad)[0]
        if len(good) < 2:
            raise PythtbError(
                "thermoelectrics: transmission is non-finite on "
                "essentially the whole grid -- raise eta"
            )
        T[bad] = np.interp(np.where(bad)[0], good, T[good])
    if n_bad0:
        warnings.warn(
            "thermoelectrics: decimation overflowed at %d of %d "
            "energies (f32 recursion at eta=%.1e); recomputed them at "
            "escalated eta=%.1e%s" % (
                n_bad0, len(Es), eta, esc,
                " and interpolated %d holdouts" % n_holdout
                if n_holdout else ""),
            UserWarning, stacklevel=2,
        )
    dE = Es[1] - Es[0]
    # numerical noise floor for L0: a gap's true L0 is exponentially
    # small, but eta-broadening leaks T ~ (eta/gap)^2 into the gap and
    # f32 compute carries ~eps-scale roundoff -- anything below BOTH
    # scales is indistinguishable from noise and makes S = L1/L0
    # astronomical garbage.  Scale the floor with the compute dtype
    # and with eta^2 so the NaN contract holds on the f32 backend and
    # at transport-realistic eta (ADVICE r3 + review r4).
    eps_t = float(np.finfo(np.asarray(T).dtype).eps)
    l0_floor = max(
        max(float(np.max(T)), 1.0) * max(100.0 * eps_t, 1e-12),
        (10.0 * float(eta)) ** 2,
    )
    out = {"G": [], "S": [], "kappa_e": []}
    gapped_mus = []
    for m in mus:
        x = (Es - m) / kt
        mdf = 0.25 / (kt * np.cosh(np.clip(x / 2.0, -40.0, 40.0)) ** 2)
        L0 = np.sum(mdf * T) * dE
        L1 = np.sum(mdf * (Es - m) * T) * dE
        L2 = np.sum(mdf * (Es - m) ** 2 * T) * dE
        out["G"].append(L0)
        if L0 < l0_floor:
            gapped_mus.append(float(m))
            out["S"].append(np.nan)
            out["kappa_e"].append(np.nan)
        else:
            out["S"].append(-L1 / (kt * L0))
            out["kappa_e"].append((L2 - L1**2 / L0) / kt)
    if gapped_mus:
        warnings.warn(
            "thermoelectrics: G below the numerical noise floor (%.1e) "
            "at mu=%s -- mu lies in a transport gap; S and kappa_e are "
            "ill-conditioned there and returned as NaN"
            % (l0_floor, np.round(gapped_mus, 6).tolist()),
            UserWarning, stacklevel=2,
        )
    if np.ndim(mu) == 0:
        return {k: float(v[0]) for k, v in out.items()}
    return {k: np.asarray(v) for k, v in out.items()}
