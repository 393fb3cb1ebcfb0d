"""Semi-infinite surfaces: spectral functions by Sancho-Rubio decimation.

The reference studies surfaces only through finite cuts
(``cut_piece``, e.g. pythtb.py examples edge.py / cubic_slab_hwf.py),
which mixes the two surfaces and quantizes the bulk into finite-size
subbands.  This module treats a genuinely SEMI-INFINITE crystal: the
surface Green's function is obtained by the Sancho-Rubio decimation
algorithm (J. Phys. F 15, 851 (1985)) -- each iteration doubles the
effective depth, so ~30 iterations resolve 2^30 layers -- giving clean
surface spectral functions A(E, k_par): edge flat bands, Fermi arcs,
Dirac surface cones, with zero finite-size artifacts.

TPU-first shape: the decimation is a fixed-length ``lax.scan`` whose
state is the whole (nE, nK, S, S) batch of small complex matrices --
every iteration is a handful of batched ``linalg.solve``/matmuls that
map straight onto the MXU, so thousands of (energy, k) pixels resolve
in one compiled program.

Construction: a principal layer is the unit cell enlarged along the
surface direction until all hops couple only adjacent layers
(``m = max |R_surf|``); the intra-layer Bloch block H00(k_par) is
assembled by the standard Hermitian path (:func:`ops.hamiltonian.
assemble` on a crafted sub-table), the inter-layer block H01(k_par) by
a one-sided assembly (stored hops with R_surf = -1 enter transposed-
conjugated).  Orbital-position phases along the surface direction drop
out (no momentum is conserved there); parallel directions keep the
Convention-I phases.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .core import finalize
from .model import PythtbError
from .ops.hamiltonian import _phases, assemble
from .utils.xfer import unpack_cplx

__all__ = ["spectral_function"]


def _layer_blocks(model, surf_dir):
    """(static_par, data00, data01, m): finalized sub-tables for the
    intra-layer (Hermitian) and inter-layer (one-sided) blocks of the
    principal-layer chain along ``surf_dir``."""
    if surf_dir not in model._per:
        raise PythtbError("surf_dir must be a periodic direction of the model.")
    for h in model._hoppings:
        r = float(h[3][surf_dir])
        if abs(r - round(r)) > 1e-9:
            raise PythtbError(
                "Layer construction needs integer lattice vectors along "
                "surf_dir; found R[%d] = %s (fractional R is legal for "
                "Bloch phases but has no layer decomposition)."
                % (surf_dir, r)
            )
    Rs_abs = [
        abs(int(np.round(h[3][surf_dir]))) for h in model._hoppings
    ] or [0]
    m = max(Rs_abs)
    work = model
    if m > 1:
        sc = np.identity(model._dim_r, dtype=int)
        sc[surf_dir, surf_dir] = m
        work = model.make_supercell(sc, to_home_suppress_warning=True)

    par_dirs = [p for p in work._per if p != surf_dir]
    dpar = len(par_dirs)

    hops0, hops1 = [], []  # (amp, i, j, R) with R restricted later
    for h in work._hoppings:
        amp, i, j = h[0], h[1], h[2]
        R = np.asarray(h[3], dtype=np.float64)
        rs = int(np.round(R[surf_dir]))
        if rs == 0:
            hops0.append((amp, i, j, R))
        elif rs == 1:
            hops1.append((amp, i, j, R))
        elif rs == -1:
            # fold into the +1 block as the conjugate-transposed hop
            if work._nspin == 2:
                camp = np.conj(np.asarray(amp, dtype=complex)).T
            else:
                camp = np.conj(amp)
            hops1.append((camp, j, i, -R))
        else:  # pragma: no cover - supercell guarantees |rs| <= 1
            raise PythtbError("principal layer construction failed")

    def _fin(hops):
        amps = [h[0] for h in hops]
        ii = [h[1] for h in hops]
        jj = [h[2] for h in hops]
        RR = [h[3] for h in hops]
        if not hops:
            amps = np.zeros(
                (0, 2, 2) if work._nspin == 2 else (0,), dtype=complex
            )
            ii = np.zeros(0, dtype=int)
            jj = np.zeros(0, dtype=int)
            RR = np.zeros((0, work._dim_r))
        return finalize(
            dpar, work._dim_r, par_dirs, work._nspin, work._norb,
            work._orb, work._site_energies, amps, ii, jj, RR,
            use_pattern=False,
        )
    static00, data00 = _fin(hops0)
    static01, data01 = _fin(hops1)
    return static00, static01, data00, data01, m


def _one_sided(static, data, kpts):
    """Non-Hermitian inter-layer block H01(k_par): direct terms only,
    no conjugate addition, no diagonal."""
    ctype = config.complex_dtype()
    B = kpts.shape[0]
    n = static.norb
    nsta = static.nsta
    if static.nhop == 0:
        return jnp.zeros((B, nsta, nsta), dtype=ctype)
    ph = _phases(static, data.rv, kpts)  # (B, nhop)
    amps = unpack_cplx(jnp.asarray(data.amps))
    if static.nspin == 1:
        vals = ph * amps[None, :]
        H = jnp.zeros((B, n, n), dtype=ctype)
        return H.at[:, data.ii, data.jj].add(vals)
    vals = ph[:, :, None, None] * amps[None]
    Hblk = jnp.zeros((B, n, n, 2, 2), dtype=ctype)
    Hblk = Hblk.at[:, data.ii, data.jj].add(vals)
    return Hblk.transpose(0, 1, 3, 2, 4).reshape(B, nsta, nsta)


@partial(jax.jit, static_argnums=(0, 1, 7, 8))
def _spectral_jit(static00, static01, data00, data01, kpar, energies, eta,
                  iters, mesh=None):
    H00 = assemble(static00, data00, kpar)  # (K, S, S) Hermitian
    H01 = _one_sided(static01, data01, kpar)  # (K, S, S)
    S = H00.shape[-1]
    ctype = H00.dtype
    eye = jnp.eye(S, dtype=ctype)
    w = (energies.astype(jnp.real(jnp.zeros(0, ctype)).dtype)
         + 1j * jnp.asarray(eta, ctype))  # (E,)
    wI = w[:, None, None, None] * eye  # (E, 1, S, S)

    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)

    es = jnp.broadcast_to(H00[None], (w.shape[0],) + H00.shape)
    if mesh is not None:
        # data-parallel over the larger of the two batch axes (a Fermi-
        # arc map has E=1, K~10^4; a surface DOS has E~10^2, K=1); the
        # axis choice is static at trace time, the scan carry keeps the
        # sharding, and the only collective is the final gather
        from .ops.solver import shard_axis

        es = shard_axis(es, mesh, 0 if es.shape[0] >= es.shape[1] else 1)
    e = es
    a = jnp.broadcast_to(H01[None], es.shape)
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
    (es, e, a_f, _, peak), _ = jax.lax.scan(
        step, (es, e, a, b, peak0), None, length=iters
    )
    Gs = jnp.linalg.solve(wI - es, jnp.broadcast_to(eye, es.shape))
    Gb = jnp.linalg.solve(wI - e, jnp.broadcast_to(eye, e.shape))
    # convergence diagnostic (free: a_f and the running peak live in the
    # carry): (1) the worst remaining effective coupling relative to the
    # bare one -- geometric-squared decay underflows this to ~0 on any
    # converged pixel; (2) the peak intermediate coupling -- at eta -> 0
    # the recursion overflows and the final coupling spuriously
    # collapses to 0, so a huge peak marks the result as garbage even
    # when the residual looks clean
    scale = jnp.maximum(jnp.max(jnp.abs(H01)), 1e-30)
    res = jnp.max(jnp.abs(a_f)) / scale
    blow = 1e30 if jnp.real(jnp.zeros(0, ctype)).dtype == jnp.float32 else 1e50
    res = jnp.where(peak / scale > blow, jnp.inf, res)
    # per-state spectral weights; callers trace or keep them resolved
    dg = lambda G: -jnp.imag(jnp.diagonal(G, axis1=-2, axis2=-1)) / jnp.pi
    return dg(Gs), dg(Gb), res


def spectral_function(model, surf_dir, k_par=None, energies=None, eta=0.05,
                      iters=35, side="bottom", return_bulk=False,
                      resolved=False, conv_tol=1e-6, max_iters=95):
    """Surface spectral function A(E, k_par) of the SEMI-INFINITE
    crystal terminated perpendicular to ``surf_dir``; see the module
    docstring.

    :param surf_dir: periodic direction to terminate (the model keeps
      its other periodic directions as surface momenta)
    :param k_par: (K, dim_k - 1) reduced surface momenta, ordered like
      the model's remaining periodic directions (None for a 1-D model)
    :param energies: (nE,) energy grid (default: Gershgorin-style span
      from a quick bulk solve, 201 points)
    :param eta: positive broadening (spectral resolution; f32-safe
      down to ~1e-3)
    :param iters: decimation steps (effective depth 2^iters layers);
      automatically escalated (in steps of 30, up to ``max_iters``)
      while the final effective inter-layer coupling has not collapsed
      below ``conv_tol`` relative to the bare coupling -- geometric-
      squared decay means any gapped pixel underflows to ~0, so a
      nonzero residual flags genuine under-convergence (tiny ``eta``
      on a near-gapless spectrum).  A warning is issued if even
      ``max_iters`` leaves a residual; increase ``eta`` then.
    :param side: "bottom" or "top" -- which of the two inequivalent
      surfaces to expose (swaps the roles of H01 and H01^dagger)
    :param return_bulk: also return the bulk-projected spectral
      function (same decimation, no surface termination) -- the
      surface-minus-bulk contrast isolates true surface states
    :param resolved: keep the per-state (orbital/spin within the
      principal layer) weights instead of tracing: output gains a
      trailing S axis (sublattice-resolved edges, spin textures)
    :returns: A (nE, K) float array -- (nE, K, S) with ``resolved`` --
      (and A_bulk alike with ``return_bulk``); normalization: the
      integral of A over E is ~ S (states per principal layer)
    """
    static00, static01, data00, data01, m = _layer_blocks(model, int(surf_dir))
    dpar = static00.dim_k
    if k_par is None:
        if dpar != 0:
            raise PythtbError("k_par required: model keeps %d surface momenta" % dpar)
        kpar = np.zeros((1, 0))
    else:
        kpar = np.asarray(k_par, dtype=np.float64)
        if kpar.ndim == 1:
            kpar = kpar[:, None] if dpar == 1 else kpar[None, :]
        if kpar.shape[1] != dpar:
            raise PythtbError(
                "k_par must have %d components (the non-terminated "
                "periodic directions)" % dpar
            )
    if energies is None:
        probe = model.solve_all(model.k_uniform_mesh([5] * model._dim_k))
        lo, hi = float(probe.min()), float(probe.max())
        pad = 0.05 * (hi - lo) + 2.0 * eta
        energies = np.linspace(lo - pad, hi + pad, 201)
    energies = np.asarray(energies, dtype=np.float64)
    if side == "top":
        # expose the opposite surface: conjugate-transpose the
        # inter-layer coupling (relabel layer order)
        from .utils.xfer import host_pack, host_unpack

        amps = host_unpack(np.asarray(data01.amps))
        if static01.nspin == 2:
            camps = np.conj(np.swapaxes(amps, -1, -2))
        else:
            camps = np.conj(amps)
        data01 = data01._replace(
            amps=host_pack(camps),
            ii=np.asarray(data01.jj),
            jj=np.asarray(data01.ii),
            rv=-np.asarray(data01.rv),
        )
    elif side != "bottom":
        raise PythtbError('side must be "bottom" or "top"')

    from .parallel import mesh as pmesh

    it = int(iters)
    while True:
        A_s, A_b, res = jax.device_get(
            _spectral_jit(
                static00, static01, data00, data01, jnp.asarray(kpar),
                jnp.asarray(energies), float(eta), it,
                pmesh.current_mesh(),
            )
        )
        if float(res) <= conv_tol or it >= int(max_iters):
            break
        if not np.isfinite(res):
            break  # numerical blow-up (eta ~ 0): more depth cannot help
        it = min(int(max_iters), it + 30)
    # NOTE the negated form: res can be NaN (overflow via inf*0 in the
    # blow-up regime), and `NaN > conv_tol` is False -- the warning
    # must fire for NaN too
    if not (float(res) <= conv_tol):
        import warnings

        warnings.warn(
            "surface.spectral_function: decimation not converged "
            "(relative coupling residual %.2e after %d iterations); the "
            "broadening eta=%g is too small for this spectrum -- "
            "increase eta (or max_iters)" % (float(res), it, eta)
        )
    A_s = np.asarray(A_s, dtype=np.float64)
    A_b = np.asarray(A_b, dtype=np.float64)
    if not resolved:
        A_s, A_b = A_s.sum(axis=-1), A_b.sum(axis=-1)
    if return_bulk:
        return A_s, A_b
    return A_s
