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

__all__ = ["landauer_transmission", "thermoelectrics", "lead_blocks", "mode_count"]


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
