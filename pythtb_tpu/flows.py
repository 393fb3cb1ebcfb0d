"""Fused end-to-end device pipelines.

These compose assembly -> diagonalization -> gauge fixups -> Berry
quantities into a single compiled XLA program with no host round-trips.
They compute exactly the same mathematical objects as the
``wf_array``-based API (solve_on_grid + impose_pbc + berry_flux /
berry_phase; reference /root/reference/pythtb.py:2421-2532, 2674-2749,
3068-3205) but keep everything resident on device -- the right shape for
TPU, where host<->device transfers ride a tunnel.

Shardable: wrap calls in ``pythtb_tpu.parallel.use_mesh(mesh)`` and the
k-grid batch axis is sharded over the mesh; XLA inserts the halo
exchanges for neighbor overlaps and the psum for the flux reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .core import BlochData, ModelStatic
from .ops.berry import _wrap, plaquette_phases
from .ops.solver import device_uniform_grid, extend_pbc_seq
from .ops.eigh import eigh_batched
from .ops.hamiltonian import assemble
from .parallel import mesh as pmesh

__all__ = ["berry_flux_grid", "chern_number", "chern_fn", "z2_fn", "z2_invariant", "density_of_states", "projected_dos", "energy_fn", "band_velocities", "solve_lowest", "solve_window", "wilson_window", "chern_window", "kpm_dos", "wilson_flow", "anomalous_hall", "anomalous_nernst", "thermal_hall", "berry_dipole", "spin_hall_conductivity", "quadrupole", "spin_chern", "sector_chern", "valley_chern", "orbital_magnetization", "second_chern", "axion_theta", "parity_z2", "parity_polarization", "polarization", "spin_texture", "gauge_phases", "find_nodes", "node_chirality"]


def gauge_phases(model, dims, flatten=True):
    """Periodic-gauge boundary phases exp(-2j*pi*orb[:, per[d]]) for the
    given mesh dimensions -- THE single home of this convention.  With
    ``flatten`` the spin axis is merged into the orbital axis (matching
    flattened state layouts); otherwise shape (norb, 2) per dim."""
    out = []
    for d in dims:
        ffac = np.exp(-2.0j * np.pi * model._orb[:, model._per[d]])
        if model._nspin == 2:
            ffac = np.repeat(ffac, 2) if flatten else np.repeat(ffac[:, None], 2, axis=1)
        out.append(ffac)
    return out


def _solve_grid_states(static: ModelStatic, data: BlochData, kpts, occ, n0, n1):
    """Solve the interior grid and return occ states (n0-1, n1-1, nocc, F)."""
    H = assemble(static, data, kpts)
    _, v = eigh_batched(H)  # (B, nsta, nsta); rows are states
    v = v[:, occ, :]  # (B, nocc, F); F = nsta (spin flattened)
    return v.reshape(n0 - 1, n1 - 1, len(occ), static.nsta)


def _total_flux(w):
    """Sum of plaquette Berry phases of an extended (n0, n1, nocc, F)
    grid (shared flux-orientation convention lives in
    ops.berry.plaquette_phases)."""
    return jnp.sum(plaquette_phases(w))


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 7))
def _chern_jit(static: ModelStatic, data: BlochData, occ, n0, n1, start, phases_ri, mesh=None):
    """Fused Chern pipeline on a device-built grid.  With a (static,
    hashable) ``mesh``, the iota k-batch and the state grid carry GSPMD
    sharding annotations -- XLA inserts the halo exchanges for the
    neighbor overlaps and the psum for the flux sum; only scalars cross
    the host boundary either way."""
    from .ops.solver import shard_grid_axis0
    from .utils.xfer import unpack_cplx

    kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    w = _solve_grid_states(static, data, kpts, occ, n0, n1)
    if mesh is not None:
        w = shard_grid_axis0(w, mesh)
    w = extend_pbc_seq(w, [unpack_cplx(phases_ri[0]), unpack_cplx(phases_ri[1])])
    return _total_flux(w)


def _grid_inputs(model, nk, start_k, caller="chern_number"):
    n0, n1 = int(nk[0]), int(nk[1])
    static, data = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("%s requires a model with dim_k == 2" % caller)
    return static, data, (n0, n1), gauge_phases(model, (0, 1))


def berry_flux_grid(model, occ, nk=(101, 101), start_k=(-0.5, -0.5), mesh=None):
    """Total Berry flux of ``occ`` bands over the BZ on an (n0 x n1)
    grid, computed fully on device.  Equals
    ``wf_array(model, nk).solve_on_grid(start_k); wf.berry_flux(occ)``.
    Under a device mesh (argument or ambient ``use_mesh``) the grid is
    sharded in-program -- any grid size works (GSPMD handles uneven
    shards), and nothing but scalars crosses the host boundary.
    """
    static, data, (n0, n1), (p0, p1) = _grid_inputs(model, nk, start_k)
    if mesh is None:
        mesh = pmesh.current_mesh()
    occ = tuple(int(o) for o in occ)
    if occ and (min(occ) < 0 or max(occ) >= static.nsta):
        raise IndexError(
            "occ indices %s out of range for %d states" % (sorted(set(occ)), static.nsta)
        )
    from .utils.xfer import host_pack

    start = np.asarray(start_k, dtype=np.float64)
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    out = _chern_jit(static, data, occ, n0, n1, start, phases_ri, mesh)
    return float(out)


def chern_number(model, occ, nk=(101, 101), start_k=(-0.5, -0.5), mesh=None):
    """Chern number of the ``occ`` bands (flux / 2 pi)."""
    return berry_flux_grid(model, occ, nk, start_k, mesh) / (2.0 * np.pi)


# states processed per broadening chunk: keeps the (n_energies, chunk)
# Gaussian matrix small instead of materializing (n_energies, B*nsta)
# (multi-GB for dense 3-D meshes)
_DOS_CHUNK = 8192


def _broaden_chunked(evals_flat, e_grid, sig, weights=None):
    """Accumulate sum_s w_s * g(e - E_s) over chunks of states.

    evals_flat: (N,); weights: optional (N, norb).  Returns (nE,) or
    (nE, norb)."""
    N = evals_flat.shape[0]
    pad = (-N) % _DOS_CHUNK
    # sentinel far outside any window: its Gaussian weight underflows to 0
    ev = jnp.concatenate([evals_flat, jnp.full((pad,), 1.0e30, evals_flat.dtype)])
    nch = ev.shape[0] // _DOS_CHUNK
    ev = ev.reshape(nch, _DOS_CHUNK)
    if weights is None:
        def body(acc, ch):
            diff = (e_grid[:, None] - ch[None, :]) / sig
            return acc + jnp.sum(jnp.exp(-0.5 * diff * diff), axis=1), None

        acc0 = jnp.zeros(e_grid.shape, e_grid.dtype)
    else:
        wts = jnp.concatenate(
            [weights, jnp.zeros((pad, weights.shape[1]), weights.dtype)]
        ).reshape(nch, _DOS_CHUNK, weights.shape[1])
        ev = (ev, wts)

        def body(acc, ch):
            e_ch, w_ch = ch
            diff = (e_grid[:, None] - e_ch[None, :]) / sig
            g = jnp.exp(-0.5 * diff * diff)
            return acc + jnp.dot(g, w_ch, precision=jax.lax.Precision.HIGHEST), None

        acc0 = jnp.zeros((e_grid.shape[0], weights.shape[1]), e_grid.dtype)
    acc, _ = jax.lax.scan(body, acc0, ev)
    return acc


@partial(jax.jit, static_argnums=(0, 3, 4))
def _dos_jit(static: ModelStatic, data: BlochData, start, mesh_shape, n_energies, erange, sigma):
    from .ops.eigh import eigvalsh_batched

    ftype = config.float_dtype()
    kpts = device_uniform_grid(tuple(mesh_shape), start)
    evals = eigvalsh_batched(assemble(static, data, kpts))  # (B, nsta)
    e_grid = jnp.linspace(erange[0], erange[1], n_energies).astype(ftype)
    sig = jnp.asarray(sigma, ftype)
    dos = _broaden_chunked(evals.reshape(-1), e_grid, sig)
    return e_grid, dos / (sig * np.sqrt(2.0 * np.pi)) / evals.shape[0]


def _dos_driver(kernel, model, k_mesh, energies, sigma, n_energies):
    static, data = model._get_finalized()
    if static.dim_k == 0 or len(k_mesh) != static.dim_k:
        raise ValueError("k_mesh must give one size per periodic direction")
    mesh_shape = tuple(int(n) for n in k_mesh)
    start = np.zeros(static.dim_k, dtype=np.float64)
    if energies is None:
        probe = model.solve_all(model.k_uniform_mesh([max(4, n // 4) for n in mesh_shape]))
        energies = (probe.min() - 3.0 * sigma, probe.max() + 3.0 * sigma)
    e_grid, out = jax.device_get(  # one d2h round trip for both
        kernel(
            static, data, start, mesh_shape, int(n_energies),
            np.asarray(energies, dtype=np.float64), float(sigma),
        )
    )
    return np.asarray(e_grid, dtype=np.float64), np.asarray(out, dtype=np.float64)


def density_of_states(model, k_mesh, energies=None, sigma=0.1, n_energies=201):
    """Gaussian-broadened density of states, computed fully on device
    (an upstream wish-list feature, /root/reference/notes/TODO:71).

    :param k_mesh: per-periodic-direction mesh sizes (Gamma-inclusive
      uniform mesh, built on device)
    :param energies: (emin, emax) energy window; defaults to the band
      range padded by 3 sigma
    :param sigma: Gaussian broadening width
    :returns: (energy_grid, dos) with dos normalized to states per unit
      cell (integrates to norb*nspin)
    """
    return _dos_driver(_dos_jit, model, k_mesh, energies, sigma, n_energies)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _pdos_jit(static: ModelStatic, data: BlochData, start, mesh_shape, n_energies, erange, sigma):
    ftype = config.float_dtype()
    kpts = device_uniform_grid(tuple(mesh_shape), start)
    H = assemble(static, data, kpts)
    evals, v = eigh_batched(H)  # v: (B, nsta, F) rows = states
    weights = jnp.abs(v) ** 2  # (B, nsta, F) orbital(/spin) weights
    if static.nspin == 2:
        weights = weights.reshape(weights.shape[0], static.nsta, static.norb, 2).sum(-1)
    e_grid = jnp.linspace(erange[0], erange[1], n_energies).astype(ftype)
    sig = jnp.asarray(sigma, ftype)
    pdos = _broaden_chunked(
        evals.reshape(-1), e_grid, sig, weights.reshape(-1, weights.shape[-1])
    )
    return e_grid, pdos / (sig * np.sqrt(2.0 * np.pi)) / evals.shape[0]


def projected_dos(model, k_mesh, energies=None, sigma=0.1, n_energies=201):
    """Orbital-projected (Gaussian-broadened) density of states.

    Like :func:`density_of_states` but resolved per orbital:
    ``pdos[e, orb] = sum_kn |u_nk[orb]|^2 g(e - E_nk)`` (spin components
    summed for nspin=2).  The orbital sum recovers the total DOS.
    Returns (energy_grid, pdos (nE, norb)).
    """
    return _dos_driver(_pdos_jit, model, k_mesh, energies, sigma, n_energies)


def chern_fn(model, occ, nk=(31, 31), start_k=(-0.5, -0.5)):
    """Vmappable/jittable Chern-number function of the model parameters.

    Returns ``(fn, params0)`` where ``fn(params) -> chern`` is a pure
    function of ``params = {"amps": ..., "diag": ...}`` (ri-packed float
    arrays, see :func:`energy_fn`).  Because it is pure, it composes
    with ``jax.vmap`` -- e.g. a whole topological phase diagram over a
    grid of model parameters evaluates as ONE device program:

        fn, p0 = flows.chern_fn(model, [0])
        amps_grid = ...                      # (P, nhop, 2) parameter sweep
        cherns = jax.vmap(lambda a: fn({"amps": a, "diag": p0["diag"]}))(amps_grid)

    The model's hopping graph (which orbitals couple, with which lattice
    vectors) is fixed; only amplitudes and site energies vary.
    """
    from .utils.xfer import host_pack, unpack_cplx

    static, data0 = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("chern_fn requires a model with dim_k == 2")
    occ = tuple(int(o) for o in occ)
    if occ and (min(occ) < 0 or max(occ) >= static.nsta):
        raise IndexError(
            "occ indices %s out of range for %d states" % (sorted(set(occ)), static.nsta)
        )
    n0, n1 = int(nk[0]), int(nk[1])
    phases = []
    for d in range(2):
        ffac = np.exp(-2.0j * np.pi * model._orb[:, model._per[d]])
        if model._nspin == 2:
            ffac = np.repeat(ffac, 2)
        phases.append(jnp.asarray(host_pack(ffac)))
    start = jnp.asarray(np.asarray(start_k, dtype=np.float64))
    params0 = {"amps": jnp.asarray(data0.amps), "diag": jnp.asarray(data0.diag)}

    def fn(params):
        data = data0._replace(amps=params["amps"], diag=params["diag"])
        kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
        w = _solve_grid_states(static, data, kpts, occ, n0, n1)
        w = extend_pbc_seq(w, [unpack_cplx(phases[0]), unpack_cplx(phases[1])])
        return _total_flux(w) / (2.0 * np.pi)

    return fn, params0


def band_velocities(model, k_list):
    """Band group velocities dE_n/dk at each k-point, by automatic
    differentiation through assembly and the eigensolver (exact
    Hellmann-Feynman derivatives -- no finite-difference stencils, no
    band-crossing mismatch).

    :param k_list: (nkp, dim_k) reduced k-points
    :returns: (vels, evals) with vels[band, kpt, dir] = dE/dk in reduced
      coordinates (chain with 2*pi * inv(lat_per)^T for Cartesian) and
      evals[band, kpt] as in solve_all.
    """
    from .ops.eigh import eigvalsh_batched

    static, data = model._get_finalized()
    if static.dim_k == 0:
        raise ValueError("band velocities require a periodic model")
    kpts = np.asarray(k_list, dtype=np.float64)
    if kpts.ndim == 1:
        kpts = kpts[:, None] if static.dim_k == 1 else kpts[None, :]

    def energies_one(k):
        return eigvalsh_batched(assemble(static, data, k[None]))[0]

    fn = jax.jit(jax.vmap(lambda k: (energies_one(k), jax.jacfwd(energies_one)(k))))
    evals, vels = jax.device_get(fn(jnp.asarray(kpts)))  # one d2h round trip
    evals = np.asarray(evals, dtype=np.float64).T  # [band, kpt]
    vels = np.moveaxis(np.asarray(vels, dtype=np.float64), 0, 1)  # [band, kpt, dir]
    return vels, evals


_wrap_pi = _wrap  # angle wrapping shared with the Berry engine


def _wilson_half_cycle(static, data, occ, n0, n1, start, phase0):
    """Wilson-loop eigenphases along k1 for the half cycle of k2 strings
    from the first TRIM to the second: (half+1, nocc) float, where
    half = (n1-1)//2.  Fully in-program (assembly -> eigh -> gauge ->
    overlaps -> SVD unitarization -> log-depth chain -> unitary
    eigenphases); reference equivalent: pythtb.py:2863 + 3824-3838
    driven from examples/kane_mele.py:107-121."""
    from .ops.berry import _overlap, _unitarize, wilson_eigenphases

    half = (n1 - 1) // 2
    # only the half cycle k2 in [-0.5, 0] is consumed below, so only
    # those strings are solved (half+1 of the n1-1 grid columns)
    kpts = device_uniform_grid((n0 - 1, half + 1), start, denoms=(n0 - 1, n1 - 1))
    w = _solve_grid_states(static, data, kpts, occ, n0, half + 2)  # (n0-1, half+1, nocc, F)
    # close the Wilson strings along axis 0 with the periodic gauge
    w = extend_pbc_seq(w, [phase0])  # (n0, half+1, nocc, F)
    ovr = _overlap(w[:-1], w[1:])  # (n0-1, half+1, nocc, nocc) links along k1
    Wl = _unitarize(ovr)
    prod = jax.lax.associative_scan(
        lambda a, b: jnp.einsum(
            "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
        ),
        Wl,
        axis=0,
    )[-1]  # (half+1, nocc, nocc): Wilson loop per k2 string
    return wilson_eigenphases(prod)  # (half+1, nocc)


def _z2_from_flow(theta):
    """Gap-crossing Z2 count from Wilson eigenphases (half+1, nocc):
    track the midpoint of the largest circular gap between the hybrid
    Wannier centers from TRIM to TRIM; Z2 is the parity of the number of
    centers the moving gap line sweeps past (Soluyanov & Vanderbilt,
    PRB 83, 235401 (2011), generalized from 2 to any number of bands)."""
    nocc = theta.shape[-1]
    th = jnp.sort(theta, axis=-1)  # ascending in (-pi, pi]
    # circular gaps between consecutive sorted centers; entry nocc-1 is
    # the wrap-around gap through the +-pi branch point
    gaps = jnp.concatenate(
        [th[:, 1:] - th[:, :-1], (2.0 * np.pi - (th[:, -1] - th[:, 0]))[:, None]],
        axis=-1,
    )  # (half+1, nocc)
    imax = jnp.argmax(gaps, axis=-1, keepdims=True)
    lo = jnp.take_along_axis(th, imax, axis=-1)[:, 0]
    width = jnp.take_along_axis(gaps, imax, axis=-1)[:, 0]
    g = _wrap_pi(lo + 0.5 * width)  # largest-gap midpoint per string
    # per step: parity of centers swept by the moving gap line
    dg = _wrap_pi(g[1:] - g[:-1])  # (half,)
    rel = _wrap_pi(theta[1:] - g[:-1, None])  # (half, nocc)
    swept = (jnp.sign(rel) == jnp.sign(dg)[:, None]) & (
        jnp.abs(rel) <= jnp.abs(dg)[:, None]
    )
    return jnp.mod(jnp.sum(swept.astype(jnp.int32)), 2).astype(config.float_dtype())


def _z2_degenerate_flow(theta):
    """In-program detector for the gap-counting method's blind spot:
    Wannier centers that stay EXACTLY pairwise degenerate along the
    whole flow (every crossing of the gap line then sweeps a pair, the
    parity count is stuck at 0, and grid refinement agrees -- a
    confidently wrong answer).  A string is "paired" when at least
    nocc/2 of its circular center gaps sit below the dtype's resolution;
    the flow is degenerate when every interior string is paired (the two
    TRIM endpoints are excluded: Kramers pairing there is physical and
    harmless).  Returns a 0.0/1.0 scalar, jittable/vmappable."""
    nocc = theta.shape[-1]
    half_p1 = theta.shape[0]
    if half_p1 <= 2:  # no interior strings: nothing to diagnose
        return jnp.zeros((), config.float_dtype())
    tol = 1e-4 if config.float_dtype() == jnp.float32 else 1e-8
    th = jnp.sort(theta, axis=-1)
    gaps = jnp.concatenate(
        [th[:, 1:] - th[:, :-1], (2.0 * np.pi - (th[:, -1] - th[:, 0]))[:, None]],
        axis=-1,
    )
    paired = jnp.sum((gaps <= tol).astype(jnp.int32), axis=-1) >= nocc // 2
    return jnp.all(paired[1:-1]).astype(config.float_dtype())


def _z2_prep(model, occ, nk):
    """Shared validation/setup for the Z2 flows."""
    from .utils.xfer import host_pack

    static, data0 = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("z2_fn requires a model with dim_k == 2")
    occ = tuple(int(o) for o in occ)
    if len(occ) < 2 or len(occ) % 2 != 0:
        raise ValueError(
            "z2_fn needs an even number of occupied bands (Kramers pairs); got %d"
            % len(occ)
        )
    if min(occ) < 0 or max(occ) >= static.nsta:
        raise IndexError(
            "occ indices %s out of range for %d states" % (sorted(set(occ)), static.nsta)
        )
    n0, n1 = int(nk[0]), int(nk[1])
    if (n1 - 1) % 2 != 0:
        raise ValueError("nk[1] must be odd (half cycle must end on a TRIM)")
    phase0_ri = jnp.asarray(host_pack(gauge_phases(model, (0,))[0]))
    start = jnp.asarray(np.array([-0.5, -0.5]))
    params0 = {"amps": jnp.asarray(data0.amps), "diag": jnp.asarray(data0.diag)}
    return static, data0, occ, n0, n1, phase0_ri, start, params0


def z2_fn(model, occ=(0, 1), nk=(31, 31), check=False):
    """Vmappable/jittable Z2 invariant of an even number of occupied
    bands.

    Uses the gap-crossing criterion of Soluyanov & Vanderbilt (PRB 83,
    235401 (2011)): the midpoint of the largest gap between the
    Wilson-loop eigenphases (hybrid Wannier centers along k1) is tracked
    over HALF the k2 cycle (time-reversal-invariant-momentum to TRIM);
    Z2 is the parity of the number of centers the gap line sweeps past.
    Robust to band crossings (individual-center tracking is not).  Use
    ``wf_array.berry_phase(..., berry_evals=True)`` to inspect the flow
    directly; the method needs the k2 resolution to keep the Wannier gap
    identifiable between adjacent strings, and it is structurally
    defeated when the centers stay exactly pairwise degenerate along
    the whole flow (every gap-line crossing then sweeps a pair, so the
    parity is stuck at 0 regardless of the true invariant; e.g. two
    identical decoupled spin copies, or symmetry-locked doublets).
    With ``check=True`` this case is detected in-program
    (``converged = 0``); split the degeneracy with a small
    symmetry-breaking perturbation to get a usable flow.

    Returns ``(fn, params0)``, pure in the model parameter arrays --
    composes with ``jax.vmap`` for Z2 phase diagrams.  ``fn(params) ->
    z2`` (0.0 or 1.0); with ``check=True``, ``fn(params) -> (z2,
    converged)`` where ``z2`` is evaluated on the refined grid
    ``(2*nk[0]-1, 2*nk[1]-1)`` and ``converged`` (0.0 or 1.0) reports
    agreement with the ``nk`` evaluation AND a non-degenerate Wannier
    flow -- both grids in the SAME compiled program, so a vmapped phase
    diagram carries its own convergence mask.  ``converged = 0`` means
    either the coarse grid under-resolves the Wannier-gap flow or the
    centers are exactly pairwise degenerate along the whole flow (the
    structural blind spot above); agreement is necessary-but-not-
    sufficient evidence of convergence (see :func:`z2_invariant`).  Any even
    ``nocc`` is supported (Wilson eigenphases are extracted on device
    via :func:`~pythtb_tpu.ops.berry.unitary_eigenphases`); ``nk[1]``
    must be odd so the half cycle ends exactly on the second TRIM.
    """
    from .utils.xfer import unpack_cplx

    static, data0, occ, n0, n1, phase0_ri, start, params0 = _z2_prep(model, occ, nk)

    def fn(params):
        data = data0._replace(amps=params["amps"], diag=params["diag"])
        phase0 = unpack_cplx(phase0_ri)
        z2 = _z2_from_flow(
            _wilson_half_cycle(static, data, occ, n0, n1, start, phase0)
        )
        if not check:
            return z2
        theta_fine = _wilson_half_cycle(
            static, data, occ, 2 * n0 - 1, 2 * n1 - 1, start, phase0
        )
        z2_fine = _z2_from_flow(theta_fine)
        # blind-spot self-diagnosis: an exactly pairwise-degenerate flow
        # defeats the parity count identically on BOTH grids, so grid
        # agreement alone would certify a wrong answer
        degenerate = _z2_degenerate_flow(theta_fine)
        converged = (
            (z2 == z2_fine).astype(config.float_dtype()) * (1.0 - degenerate)
        )
        return z2_fine, converged

    return fn, params0


def z2_invariant(model, occ=(0, 1), nk=(31, 31), check=False):
    """Z2 invariant of two occupied bands (see :func:`z2_fn`).

    With ``check=True`` the invariant is recomputed on a refined grid
    ``(2*nk[0]-1, 2*nk[1]-1)``; on disagreement a ``UserWarning`` is
    raised and the refined value is returned (coarse grids can
    mis-resolve the Wannier-gap flow -- the count is then wrong, not
    noisy, so only grid refinement can expose it).  Agreement is
    necessary-but-not-sufficient evidence of convergence: two coarse
    grids can agree on the wrong answer, so for production scans start
    from an ``nk`` where the flow is visibly resolved
    (``wf_array.berry_phase(..., berry_evals=True)``).
    """
    if not check:
        fn, p0 = z2_fn(model, occ, nk)
        return float(jax.jit(fn)(p0))
    fn, p0 = z2_fn(model, occ, nk, check=True)
    v_fine, converged = jax.device_get(jax.jit(fn)(p0))
    if not converged:
        import warnings

        nk_fine = (2 * int(nk[0]) - 1, 2 * int(nk[1]) - 1)
        warnings.warn(
            "z2_invariant: not converged at nk=%s vs nk=%s (refined value "
            "%g).  Either the coarse grid under-resolves the Wannier-gap "
            "flow (increase nk and re-check until stable), or the centers "
            "are exactly pairwise degenerate along the whole flow -- the "
            "gap-counting method's structural blind spot; split the "
            "degeneracy with a small symmetry-breaking perturbation "
            "(inspect with wf_array.berry_phase(..., berry_evals=True))."
            % (tuple(nk), nk_fine, float(v_fine)),
            UserWarning,
            stacklevel=2,
        )
    return float(v_fine)


def energy_fn(model):
    """Differentiable band-energy function (a capability the NumPy
    reference cannot offer): returns ``(fn, params0)`` where
    ``fn(params, kpts) -> evals (B, nsta)`` is a pure jittable function
    of ``params = {"amps": ..., "diag": ...}`` -- the model's hopping
    amplitudes and site-energy matrix as ri-packed float arrays
    (see :class:`~pythtb_tpu.core.BlochData`).  Gradients flow through
    assembly and the eigensolver, enabling fits of tight-binding
    parameters to target bands, band-gap sensitivity analysis, etc.

    Example::

        fn, p0 = flows.energy_fn(model)
        gap = lambda p: fn(p, kpts)[:, 1].min() - fn(p, kpts)[:, 0].max()
        dgap = jax.grad(gap)(p0)["amps"]
    """
    from .ops.eigh import eigvalsh_batched

    static, data0 = model._get_finalized()
    params0 = {"amps": jnp.asarray(data0.amps), "diag": jnp.asarray(data0.diag)}

    @jax.jit
    def fn(params, kpts):
        data = data0._replace(amps=params["amps"], diag=params["diag"])
        H = assemble(static, data, jnp.asarray(kpts))
        return eigvalsh_batched(H)

    return fn, params0


# ---------------------------------------------------------------------------
# Matrix-free solvers for large finite models
# ---------------------------------------------------------------------------


def solve_lowest(model, num_states, eig_vectors=False, max_iters=300, tol=None, seed=0):
    """Lowest ``num_states`` eigenpairs of a FINITE model, matrix-free.

    The reference always materializes the dense Hamiltonian and calls a
    dense eigensolver -- O(norb^2) memory, O(norb^3) time
    (pythtb.py:927-953); its own wish list asks for a sparse algorithm
    (/root/reference/notes/TODO:58-59).  This uses block LOBPCG on the
    hopping table directly (:mod:`pythtb_tpu.ops.matvec`): O(nhop)
    memory and O(nhop * num_states) per iteration, so million-orbital
    flakes (disorder realizations, opened magnetic supercells) are in
    reach on a single chip.

    Implementation: JAX's ``lobpcg_standard`` finds only the TOP block
    and is real-typed, so H is (a) spectrum-reversed with a Gershgorin
    shift ``sigma*I - H`` and (b) embedded as the real symmetric
    ``[[Re H, -Im H], [Im H, Re H]]`` whose spectrum is H's doubled --
    the embedding intertwines exactly, so a real Ritz vector
    ``[x_re; x_im]`` maps back to a complex eigenvector
    ``x_re + i*x_im``.  The doubled block (2*num_states vectors) is
    compressed back to ``num_states`` eigenpairs by an SVD basis
    extraction plus a small Rayleigh-Ritz solve.

    :param num_states: how many lowest states (needs
      ``10 * num_states < norb * nspin``)
    :param eig_vectors: also return eigenvectors
    :param max_iters: LOBPCG iteration cap
    :param tol: LOBPCG residual tolerance (None = dtype epsilon)
    :param seed: PRNG seed for the random starting block
    :returns: ``evals (num_states,)`` ascending, and with
      ``eig_vectors=True`` also ``evecs`` in solve_all layout
      ``(num_states, norb)`` or ``(num_states, norb, 2)``

    Caveat: if the cut at ``num_states`` falls inside a degenerate
    multiplet, which members are returned is arbitrary (standard for
    iterative solvers).
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    from .ops.matvec import gershgorin_window, matvec, sparse_h

    h = sparse_h(model)
    N = h.nsta
    k = int(num_states)
    if k < 1:
        raise ValueError("num_states must be >= 1")
    if 10 * k >= N:
        raise ValueError(
            "solve_lowest needs 10*num_states < %d states; use solve_all "
            "for small models" % N
        )
    lo, hi = gershgorin_window(h)
    sigma = hi + 0.01 * (hi - lo) + 1e-12

    rdtype = jnp.zeros(0).dtype  # f64 on CPU+x64, f32 on TPU

    def _cx(V):  # (2N, B) real -> complex block in matvec layout
        z = V[:N] + 1j * V[N:]
        if h.nspin == 2:
            return z.reshape(h.norb, 2, -1)
        return z

    def amat(V):
        y = matvec(h, _cx(V)).reshape(N, -1)
        return sigma * V - jnp.concatenate([jnp.real(y), jnp.imag(y)], axis=0)

    key = jax.random.PRNGKey(seed)
    X0 = jax.random.normal(key, (2 * N, 2 * k), dtype=rdtype)
    theta, V, _ = lobpcg_standard(amat, X0, m=int(max_iters), tol=tol)

    from .utils.xfer import host_unpack

    w, vecs_packed = _solve_lowest_post_jit(V, h, k)
    if not eig_vectors:
        return np.asarray(jax.device_get(w), dtype=np.float64)
    w, vecs_packed = jax.device_get((w, vecs_packed))  # one round trip
    return np.asarray(w, dtype=np.float64), host_unpack(np.asarray(vecs_packed))


@partial(jax.jit, static_argnums=(2,))
def _solve_lowest_post_jit(V, h, k):
    """Real Ritz block -> complex eigenbasis: SVD extracts the k-dim
    column space, a small Rayleigh-Ritz solve re-diagonalizes.  Jitted
    (eager complex constants cannot cross the axon host<->device
    boundary) at module level so the compiled kernel is reused across
    calls of the same shape."""
    from .ops.matvec import matvec
    from .utils.xfer import pack_cplx

    N = h.nsta
    Z = V[:N] + 1j * V[N:]  # (N, 2k), rank k
    U, _, _ = jnp.linalg.svd(Z, full_matrices=False)
    U = U[:, :k]  # (N, k) orthonormal
    HU = matvec(h, U.reshape((h.norb, 2, -1) if h.nspin == 2 else (h.norb, -1)))
    HU = HU.reshape(N, k)
    hp = jax.lax.Precision.HIGHEST
    Hk = jnp.matmul(jnp.conj(U.T), HU, precision=hp)
    Hk = (Hk + jnp.conj(Hk.T)) / 2
    w, S = jnp.linalg.eigh(Hk)
    vecs = jnp.matmul(U, S, precision=hp).T  # (k, N)
    if h.nspin == 2:
        vecs = vecs.reshape(k, h.norb, 2)
    return w, pack_cplx(vecs)


@jax.jit
def _window_round_jit(h, X_ri, coef, a, b):
    """One Chebyshev-filter + Rayleigh-Ritz round of the interior
    (spectrum-slice) solver; see :func:`solve_window`.

    Everything is gathers, dense contractions, and small eigh calls --
    the primitive set already validated on the TPU backend (no QR, no
    complex host<->device transfer: the block crosses ri-packed).  The
    filter is a single ``lax.scan`` over the three-term recurrence of
    the rescaled operator; the whitening uses an eigh-based inverse
    square root of the Gram matrix (rank-deficient columns are dropped
    and flagged, not orthonormalized against).

    Returns (theta, Z_ri, res, valid): Ritz values, ri-packed Ritz
    block (N, nb), per-column residual norms ||H z - theta z||, and a
    bool mask of numerically independent columns.
    """
    from .ops.matvec import matvec
    from .utils.xfer import pack_cplx, unpack_cplx

    hp = jax.lax.Precision.HIGHEST
    N = h.nsta

    def hmat(V):  # (N, B) complex -> H V
        if h.nspin == 2:
            return matvec(h, V.reshape(h.norb, 2, -1)).reshape(N, -1)
        return matvec(h, V)

    X = unpack_cplx(X_ri)  # (N, nb)
    ct = X.dtype
    af = jnp.asarray(a, jnp.real(jnp.zeros(0, ct)).dtype)
    bf = jnp.asarray(b, af.dtype)

    def hmap(V):  # rescaled (H - b)/a, spectrum in (-1, 1)
        return (hmat(V) - bf * V) / af

    # Chebyshev filter: acc = sum_m coef[m] T_m(Hhat) X, one scan
    t0 = X
    t1 = hmap(X)
    acc = coef[0] * t0 + coef[1] * t1

    def step(carry, c):
        tm1, t, s = carry
        tn = 2.0 * hmap(t) - tm1
        return (t, tn, s + c * tn), None

    (_, _, Y), _ = jax.lax.scan(step, (t0, t1, acc), coef[2:])

    # eigh-based whitening of the filtered block
    G = jnp.matmul(jnp.conj(Y.T), Y, precision=hp)
    G = (G + jnp.conj(G.T)) / 2.0
    s, V = jnp.linalg.eigh(G)  # ascending
    smax = jnp.maximum(s[-1], 1e-300)
    rtype = af.dtype
    cut = 100.0 * jnp.finfo(rtype).eps * smax
    valid = s > cut
    inv_sqrt = jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, s, 1.0)), 0.0)
    Q = jnp.matmul(Y, V * inv_sqrt[None, :], precision=hp)  # (N, nb)

    # Rayleigh-Ritz on the UNmapped H (true eigenvalues)
    HQ = hmat(Q)
    Hk = jnp.matmul(jnp.conj(Q.T), HQ, precision=hp)
    Hk = (Hk + jnp.conj(Hk.T)) / 2.0
    # dropped columns are zero vectors: give them a huge diagonal so
    # their Ritz values sort far from any physical sigma
    big = jnp.asarray(1e30, rtype)
    Hk = Hk + jnp.where(valid, 0.0, big)[:, None] * jnp.eye(Hk.shape[0], dtype=Hk.dtype)
    theta, S = jnp.linalg.eigh(Hk)
    Z = jnp.matmul(Q, S, precision=hp)
    R = jnp.matmul(HQ, S, precision=hp) - Z * theta[None, :]
    nrm = jnp.linalg.norm(Z, axis=0)
    res = jnp.linalg.norm(R, axis=0) / jnp.maximum(nrm, 1e-30)
    col_valid = nrm > 0.5  # whitened+rotated live columns have norm 1
    theta = jnp.where(col_valid, theta, big)
    res = jnp.where(col_valid, res, big)
    return theta, pack_cplx(Z), res, col_valid


def _gaussian_cheb_coef(sigma_hat, width_hat, degree):
    """Chebyshev coefficients of the Gaussian window
    exp(-(x - sigma_hat)^2 / (2 width_hat^2)) on [-1, 1] by
    Gauss-Chebyshev quadrature (host float64).  The Gaussian is entire,
    so the coefficients decay superexponentially once
    m > ~2/width_hat -- no damping kernel is needed (unlike the sharp
    windows in KPM)."""
    M = int(degree)
    nq = 2 * (M + 1)
    theta = (np.arange(nq) + 0.5) * np.pi / nq
    x = np.cos(theta)
    g = np.exp(-((x - sigma_hat) ** 2) / (2.0 * width_hat**2))
    m = np.arange(M)
    c = (2.0 / nq) * (np.cos(m[:, None] * theta[None, :]) @ g)
    c[0] *= 0.5
    return c


def solve_window(model, num_states, sigma, k_point=None, width=None,
                 degree=None, block=None, max_rounds=10, tol=None,
                 eig_vectors=False, seed=0):
    """The ``num_states`` eigenpairs NEAREST ``sigma`` (an interior
    spectrum slice), matrix-free: Chebyshev-filtered subspace iteration
    on the hopping table.

    The reference's only eigensolver is dense (pythtb.py:927-953) --
    O(nsta^3) per k-point, which is the wall for e.g. the 11k-orbital
    magic-angle moire cell where only the 4 flat bands at the spectrum
    center matter.  This solver applies a Gaussian spectral filter
    ``exp(-(H - sigma)^2 / 2 width^2)`` (expanded in Chebyshev
    polynomials, applied as a single ``lax.scan`` of gathers + dense
    contractions -- the ELL matvec of :mod:`pythtb_tpu.ops.matvec`) to
    a random block, then Rayleigh-Ritz; each round multiplies the
    filter's discrimination, so a handful of rounds converges interior
    states without ever forming H.  Unlike shift-invert methods there
    is NO linear solve -- on TPU a polynomial of gathers beats a
    sparse factorization by construction.

    Works for FINITE models (``dim_k == 0``) and for PERIODIC models
    at a fixed ``k_point`` (:func:`pythtb_tpu.ops.matvec.sparse_h_k`,
    Convention I, so eigenvectors match ``solve_all``'s gauge).

    :param num_states: how many eigenpairs nearest ``sigma``
    :param sigma: target energy (e.g. the flat-band center)
    :param k_point: reduced k for a periodic model (None for finite)
    :param width: Gaussian filter width in energy units.  Default is
      ADAPTIVE: a wide probe round first (span/20), then after each
      round the width tightens to one third of the distance from
      ``sigma`` to the block-edge Ritz value -- the filter then passes
      the retained subspace and suppresses everything beyond it by
      ``~exp(-4.5)`` per round, independent of the (a priori unknown)
      local level spacing.  Pass an explicit width to pin it.
    :param degree: cap on the Chebyshev degree (default 6144); the
      working degree is ``4 a / width`` with ``a`` the half-span,
      rounded up to a multiple of 16 -- the matvec count per round per
      block vector
    :param block: subspace dimension (default ``num_states + max(6,
      num_states)``); must leave room above ``num_states``
    :param max_rounds: filter+Rayleigh-Ritz rounds before giving up
    :param tol: relative residual target on the selected states
      (default ``sqrt(eps)`` of the device dtype)
    :param eig_vectors: also return eigenvectors (solve_all layout)
    :param seed: starting-block seed
    :returns: ``evals (num_states,)`` ascending (and ``evecs``
      ``(num_states, norb[, 2])`` with ``eig_vectors=True``)

    A ``UserWarning`` reports the worst residual if ``max_rounds`` is
    exhausted before ``tol`` is met.
    """
    from .ops.matvec import gershgorin_window, sparse_h, sparse_h_k
    from .utils.xfer import host_unpack

    if k_point is None:
        h = sparse_h(model)
    else:
        h = sparse_h_k(model, k_point)
    N = h.nsta
    kk = int(num_states)
    if kk < 1:
        raise ValueError("num_states must be >= 1")
    if int(max_rounds) < 1:
        raise ValueError("max_rounds must be >= 1")
    nb = int(block) if block is not None else kk + max(6, kk)
    if nb <= kk:
        raise ValueError("block must exceed num_states")
    if nb >= N:
        raise ValueError(
            "solve_window needs block < %d states; use solve_all for "
            "small models" % N)
    lo, hi = gershgorin_window(h)
    a = 0.5 * (hi - lo) / 0.98 + 1e-12
    b = 0.5 * (hi + lo)
    sigma = float(sigma)
    if not (lo <= sigma <= hi):
        raise ValueError(
            "sigma=%g outside the spectral window (%g, %g)" % (sigma, lo, hi))
    adaptive = width is None
    # a wide first filter is only a probe: its Rayleigh-Ritz values
    # reveal the LOCAL level spacing near sigma, from which the width
    # is tightened so that the Gaussian covers the nb-state subspace
    # and suppresses everything beyond it (convergence factor per
    # round ~ exp(-(d_nb / w)^2 / 2) for the excluded states)
    w = float(width) if width is not None else (hi - lo) / 20.0
    max_degree = int(degree) if degree is not None else 6144

    def _deg(wv):
        return int(min(max(np.ceil(4.0 * a / wv / 16.0) * 16, 32), max_degree))

    rdtype = jnp.zeros(0).dtype  # f64 on CPU+x64, f32 on TPU
    if tol is None:
        tol = float(np.sqrt(np.finfo(np.dtype(rdtype)).eps))

    rng = np.random.default_rng(seed)
    X_ri = np.stack(
        [rng.standard_normal((N, nb)), rng.standard_normal((N, nb))],
        axis=-1,
    )

    coef_d = jnp.asarray(_gaussian_cheb_coef((sigma - b) / a, w / a, _deg(w)),
                         rdtype)
    worst = np.inf
    for _ in range(int(max_rounds)):
        theta, Z_ri, res, valid = _window_round_jit(
            h, jnp.asarray(X_ri, rdtype), coef_d, a, b)
        # ONE host round trip for the selection scalars
        theta_h, res_h = jax.device_get((theta, res))
        dist = np.sort(np.abs(np.asarray(theta_h, np.float64) - sigma))
        dist = dist[dist < 1e29]  # drop rank-deficient sentinel columns
        order = np.argsort(np.abs(np.asarray(theta_h, np.float64) - sigma),
                           kind="stable")[:kk]
        worst = float(np.max(res_h[order]))
        if worst < tol * max(abs(hi), abs(lo), 1.0):
            break
        X_ri = Z_ri  # re-filter the Ritz block
        if adaptive:
            # half the distance to the (nb-1)-th Ritz value: the filter
            # then passes the retained subspace and kills the rest
            d_edge = float(dist[min(nb - 1, len(dist) - 1)])
            w_new = max(d_edge / 3.0, (hi - lo) * 1e-9)
            if abs(w_new - w) > 0.2 * w:
                w = w_new
                coef_d = jnp.asarray(
                    _gaussian_cheb_coef((sigma - b) / a, w / a, _deg(w)),
                    rdtype)
    if not worst < tol * max(abs(hi), abs(lo), 1.0):
        import warnings

        warnings.warn(
            "solve_window: residual %.2e after %d rounds (target %.1e) "
            "-- increase max_rounds, degree, or width coverage"
            % (worst, int(max_rounds), tol * max(abs(hi), abs(lo), 1.0)),
            UserWarning, stacklevel=2,
        )
    sel = np.sort(order)
    # theta_h is already on host from the last round -- a second
    # device_get of theta would be a gratuitous ~25 ms tunnel round
    # trip per call (see the d2h audit note in CLAUDE.md)
    evals = np.asarray(theta_h, dtype=np.float64)[sel]
    if not eig_vectors:
        return evals
    Z = host_unpack(np.asarray(jax.device_get(Z_ri)))  # (N, nb)
    vecs = Z[:, sel].T  # (kk, N)
    if h.nspin == 2:
        vecs = vecs.reshape(kk, h.norb, 2)
    return evals, vecs


def wilson_window(model, sigma, num_states, k_loop, berry_evals=False,
                  **solve_kwargs):
    """Berry phase (or Wilson-loop eigenphases) of the ``num_states``
    manifold nearest ``sigma`` around an explicit k-loop, with the
    states at every loop point produced by the matrix-free
    :func:`solve_window` -- topology of interior manifolds in cells
    far beyond dense diagonalization (e.g. the 4 flat bands of the
    11k-orbital magic-angle moire cell).

    The loop is a (L, dim_k) array whose last point equals the first
    plus an INTEGER reciprocal offset G (zero for a contractible loop,
    a lattice vector for a BZ-crossing Zak loop).  The closing overlap
    uses the periodic-gauge factors ``exp(-2j pi G . t_orb)`` (the
    single-home convention of :func:`gauge_phases` /
    ``wf_array.impose_pbc``), and the sign convention matches
    ``wf_array.berry_phase`` (committed equality test on the Haldane
    Zak loop).

    Like the wf_array Berry methods, a near-singular link (the
    selected manifold changing character between adjacent loop points
    -- e.g. a band crossing through the selection window) is reported
    with a ``UserWarning`` keyed on |det O| of the offending link.

    :param sigma: target energy selecting the manifold at every point
    :param num_states: manifold dimension
    :param k_loop: (L, dim_k) reduced k-points; closed as above
    :param berry_evals: return the individual Wilson eigenphases
      (polar-unitarized product) instead of the total phase
    :param solve_kwargs: forwarded to :func:`solve_window` (width,
      degree, block, tol, seed, ...)
    :returns: total Berry phase in (-pi, pi] (or (num_states,)
      eigenphases with ``berry_evals``)
    """
    from .model import PythtbError

    k_loop = np.asarray(k_loop, dtype=np.float64)
    if k_loop.ndim != 2 or k_loop.shape[0] < 3:
        raise PythtbError("k_loop must be (L >= 3, dim_k)")
    G = k_loop[-1] - k_loop[0]
    if np.abs(G - np.round(G)).max() > 1e-8:
        raise PythtbError(
            "k_loop must close on itself modulo integer reciprocal "
            "vectors (last - first = %s)" % (G,))
    G = np.round(G).astype(int)

    vecs = []
    for kpt in k_loop[:-1]:
        _, v = solve_window(model, num_states, sigma, k_point=kpt,
                            eig_vectors=True, **solve_kwargs)
        vecs.append(np.asarray(v).reshape(num_states, -1))
    lam = np.ones(vecs[0].shape[1], dtype=complex)
    phs = gauge_phases(model, range(model._dim_k))
    for d in range(model._dim_k):
        if G[d]:
            lam = lam * np.asarray(phs[d]) ** G[d]
    vecs.append(vecs[0] * lam[None, :])

    W = np.eye(num_states, dtype=complex)
    min_det = np.inf
    for j in range(len(vecs) - 1):
        O = np.conj(vecs[j]) @ vecs[j + 1].T
        dmag = abs(np.linalg.det(O))
        min_det = min(min_det, dmag)
        W = W @ O
    if min_det < 0.5:
        import warnings

        warnings.warn(
            "wilson_window: near-singular link (|det O| = %.3f) -- the "
            "selected manifold changes character along the loop (a "
            "band crosses the selection window); the phase is not "
            "trustworthy there" % min_det,
            UserWarning, stacklevel=2,
        )
    if not berry_evals:
        return float(-np.angle(np.linalg.det(W)))
    # polar-unitarize the product, then eigenphases
    U_, _s, Vh_ = np.linalg.svd(W)
    evs = np.linalg.eigvals(U_ @ Vh_)
    return np.sort(-np.angle(evs))


def chern_window(model, sigma, num_states, nk=(12, 12), **solve_kwargs):
    """Chern number of the ``num_states`` manifold nearest ``sigma``,
    with every grid point solved matrix-free by :func:`solve_window` --
    the flat-band Chern number of cells far beyond dense
    diagonalization (the magic-angle moire cell being the target use).

    Standard plaquette Berry-flux construction (the same gauge-
    invariant link determinants as ``wf_array.berry_flux``) on an
    (nk0, nk1) closed grid of slice states; the wrapped boundary rows
    use the package's periodic-gauge phases.  Cost: nk0 * nk1
    :func:`solve_window` calls -- each a few filtered-subspace rounds
    of ELL matvecs, so the scaling is O(nk0 nk1 nhop degree block),
    never O(nsta^3).

    A ``UserWarning`` reports the weakest link when the selected
    manifold changes character somewhere on the grid (a band crossing
    through the window); plaquette fluxes are unreliable there.

    :param nk: (nk0, nk1) grid (the loop direction resolution bounds
      how sharp a Berry-curvature peak can be integrated)
    :param solve_kwargs: forwarded to :func:`solve_window`
    :returns: float Chern number (sum of plaquette fluxes / 2 pi)
    """
    from .model import PythtbError

    if model._dim_k != 2:
        raise PythtbError("chern_window requires dim_k == 2")
    n0, n1 = (int(x) for x in nk)
    if min(n0, n1) < 3:
        raise PythtbError("nk must be >= 3 in both directions")
    kk = int(num_states)
    grid = np.empty((n0 + 1, n1 + 1), dtype=object)
    for i in range(n0):
        for j in range(n1):
            _, v = solve_window(
                model, kk, sigma, k_point=np.array([i / n0, j / n1]),
                eig_vectors=True, **solve_kwargs)
            grid[i, j] = np.asarray(v).reshape(kk, -1)
    ph0, ph1 = (np.asarray(p) for p in
                gauge_phases(model, range(model._dim_k)))
    for j in range(n1):
        grid[n0, j] = grid[0, j] * ph0[None, :]
    for i in range(n0):
        grid[i, n1] = grid[i, 0] * ph1[None, :]
    grid[n0, n1] = grid[0, 0] * (ph0 * ph1)[None, :]

    def link(a, b):
        return np.linalg.det(np.conj(a) @ b.T)

    total = 0.0
    min_det = np.inf
    for i in range(n0):
        for j in range(n1):
            u1 = link(grid[i, j], grid[i + 1, j])
            u2 = link(grid[i + 1, j], grid[i + 1, j + 1])
            u3 = link(grid[i + 1, j + 1], grid[i, j + 1])
            u4 = link(grid[i, j + 1], grid[i, j])
            prod = u1 * u2 * u3 * u4
            min_det = min(min_det, abs(u1), abs(u2), abs(u3), abs(u4))
            total += np.angle(prod)
    if min_det < 0.5:
        import warnings

        warnings.warn(
            "chern_window: near-singular link (|det O| = %.3f) -- a "
            "band crosses the selection window somewhere on the grid; "
            "the Chern number is not trustworthy" % min_det,
            UserWarning, stacklevel=2,
        )
    # orientation flip: match the package-wide flux convention of
    # ops.berry.plaquette_phases / chern_number (equality-tested)
    return float(-total / (2.0 * np.pi))


@partial(jax.jit, static_argnums=(4, 5, 6))
def _kpm_moments_jit(h, a, b, key, M, R, mesh=None):
    """Stochastic Chebyshev moments mu_0..mu_{M-1} of the rescaled
    (H - b)/a, R random-phase vectors, doubling identities (two moments
    per matvec), one lax.scan program.  Module-level so the compiled
    executable is reused across calls of the same shape.

    With a device ``mesh``, the random-vector axis shards over it (the
    vectors are independent, so this is pure data parallelism; GSPMD
    inserts one psum for the final moment mean)."""
    from .ops.matvec import matvec

    N = h.nsta
    th = jax.random.uniform(key, (N, R), minval=0.0, maxval=2.0 * np.pi)
    x0 = jnp.exp(1j * th)  # random-phase vectors: E<x|A|x> = Tr A
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        x0 = jax.lax.with_sharding_constraint(
            x0, NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0]))
        )
    shape = (h.norb, 2, R) if h.nspin == 2 else (h.norb, R)

    def hmv(v):
        return (matvec(h, v.reshape(shape)).reshape(N, R) - b * v) / a

    t0 = x0
    t1 = hmv(x0)
    mu0 = jnp.full((R,), float(N))  # <x|T_0|x> = N for phase vectors
    mu1 = jnp.sum(jnp.real(jnp.conj(x0) * t1), axis=0)

    def step(carry, _):
        tm, tc = carry  # T_{m-1}, T_m
        tn = 2.0 * hmv(tc) - tm
        even = 2.0 * jnp.sum(jnp.real(jnp.conj(tc) * tc), axis=0) - mu0
        odd = 2.0 * jnp.sum(jnp.real(jnp.conj(tn) * tc), axis=0) - mu1
        return (tc, tn), (even, odd)

    _, (ev, od) = jax.lax.scan(step, (t0, t1), None, length=M // 2)
    mu = jnp.zeros((M, R))
    mu = mu.at[0].set(mu0).at[1].set(mu1)
    mu = mu.at[2::2].set(ev[: (M - 2 + 1) // 2])
    mu = mu.at[3::2].set(od[: (M - 2) // 2])
    return jnp.mean(mu, axis=1)


def kpm_dos(model, energies=None, num_moments=512, num_vectors=8,
            n_energies=401, seed=0):
    """Density of states of a FINITE model by the kernel polynomial
    method (stochastic Chebyshev expansion with the Jackson kernel).

    Complements :func:`density_of_states` (which diagonalizes): KPM
    needs only ``num_moments/2`` Hamiltonian applications per random
    vector -- O(nhop * num_moments * num_vectors) total, no
    diagonalization -- so it scales to system sizes where even storing
    the dense H is impossible.  The whole moment recursion is one
    ``lax.scan`` device program over the matrix-free hop-table matvec
    (:mod:`pythtb_tpu.ops.matvec`), using the doubling identities
    ``mu_{2m} = 2<T_m|T_m> - mu_0`` and ``mu_{2m+1} = 2<T_{m+1}|T_m> -
    mu_1`` (two moments per matvec).

    :param energies: energy grid (default: Gershgorin window, open
      interval, ``n_energies`` points)
    :param num_moments: Chebyshev moments (resolution ~ spectral width
      / num_moments; Jackson-kernel broadening is automatic)
    :param num_vectors: random-phase vectors for the stochastic trace
      (relative error ~ 1/sqrt(num_vectors * norb)).  Under an active
      device mesh the count is rounded UP to a multiple of the device
      number (every device carries the same share), so the sharded
      stochastic ensemble can differ from the unsharded one unless the
      requested count is already divisible
    :returns: ``(energies, dos)`` with ``sum(dos) * dE ~ norb * nspin``
    """
    from .ops.matvec import gershgorin_window, sparse_h

    h = sparse_h(model)
    lo, hi = gershgorin_window(h)
    a = 0.5 * (hi - lo) / 0.98 + 1e-12  # keep spectrum inside (-0.98, 0.98)
    b = 0.5 * (hi + lo)
    M = int(num_moments)
    R = int(num_vectors)
    mesh = pmesh.current_mesh()
    if mesh is not None:
        # independent random vectors shard over the mesh; round R up so
        # every device carries the same count (more vectors = strictly
        # better statistics)
        R = pmesh.pad_to_multiple(R, mesh.devices.size)

    mu = np.asarray(
        jax.device_get(_kpm_moments_jit(h, a, b, jax.random.PRNGKey(seed), M, R, mesh)),
        dtype=np.float64,
    )

    # Jackson kernel (Weisse et al., Rev. Mod. Phys. 78, 275 (2006))
    m_arr = np.arange(M)
    Mp = M + 1.0
    g = ((Mp - m_arr) * np.cos(np.pi * m_arr / Mp)
         + np.sin(np.pi * m_arr / Mp) / np.tan(np.pi / Mp)) / Mp

    if energies is None:
        energies = np.linspace(lo, hi, int(n_energies))
    energies = np.asarray(energies, dtype=np.float64)
    et_raw = (energies - b) / a
    inside = np.abs(et_raw) < 1.0 - 1e-12  # outside the window DOS = 0
    et = np.clip(et_raw, -1.0 + 1e-12, 1.0 - 1e-12)
    tm = np.cos(m_arr[None, :] * np.arccos(et)[:, None])  # (E, M)
    w = np.full(M, 2.0)
    w[0] = 1.0
    dos = (tm * (w * g * mu)[None, :]).sum(axis=1) / (np.pi * np.sqrt(1.0 - et**2)) / a
    return energies, np.where(inside, dos, 0.0)


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _wilson_flow_jit(static, data, occ, n0, n1, loop_dir, start, phases_ri):
    """Full hybrid-Wannier flow in ONE program: solve the interior grid,
    close the loop axis with the periodic gauge, unitarized-overlap
    chain per string (log depth), Wilson eigenphases + traced phase per
    flow row, flow boundary appended (the per-orbital pbc phase along
    the flow axis is a k-independent diagonal unitary, so Wilson
    spectra at the boundary row equal row 0 exactly)."""
    from .ops.berry import _dets, _overlap, wilson_eigenphases
    from .utils.xfer import unpack_cplx

    kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
    w = _solve_grid_states(static, data, kpts, occ, n0, n1)  # (n0-1, n1-1, nocc, F)
    if loop_dir == 0:
        w = jnp.swapaxes(w, 0, 1)  # flow axis first, loop axis second
    w = extend_pbc_seq(jnp.swapaxes(w, 0, 1), [unpack_cplx(phases_ri)])
    w = jnp.swapaxes(w, 0, 1)  # (nflow-1, nloop, nocc, F), loop closed
    ovr = _overlap(w[:, :-1], w[:, 1:])  # (nflow-1, nloop-1, nocc, nocc)
    U, sing_all, Vh = jnp.linalg.svd(ovr, full_matrices=False)
    Wl = jnp.matmul(U, Vh, precision=jax.lax.Precision.HIGHEST)
    sing = jnp.min(sing_all)
    prod = jax.lax.associative_scan(
        lambda a, b: jnp.einsum(
            "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
        ),
        Wl,
        axis=1,
    )[:, -1]  # (nflow-1, nocc, nocc)
    evph = jnp.sort(-wilson_eigenphases(prod), axis=-1)  # wf_array convention
    traced = -jnp.angle(_dets(prod))
    # flow boundary row = row 0 (see docstring)
    evph = jnp.concatenate([evph, evph[:1]], axis=0)
    traced = jnp.concatenate([traced, traced[:1]], axis=0)
    return evph, traced, sing


def wilson_flow(model, occ, nk=(41, 41), loop_dir=1, start_k=(-0.5, -0.5)):
    """Hybrid Wannier center flow as ONE compiled device program.

    Computes, for every grid value of the flow axis, the Wilson-loop
    eigenphases (hybrid Wannier centers x 2 pi) and the traced Berry
    phase of the ``occ`` bands around the ``loop_dir`` axis --
    equivalent to ``wf_array.solve_on_grid`` + two ``berry_phase``
    calls (ref pythtb.py:2863 + 3824-3838, examples/kane_mele.py), but
    with a single dispatch and only the (nflow, nocc) result crossing
    the host boundary: on a tunneled TPU runtime this is ~3x faster
    than the wf_array pipeline.

    :param occ: band indices (Wilson loop of this set)
    :param nk: grid sizes (nk[loop_dir] points around the loop)
    :param loop_dir: 0 or 1 -- the axis the Wilson loops wind around
    :param start_k: grid origin
    :returns: ``(evph, traced)``: (nflow, nocc) sorted eigenphases and
      (nflow,) traced phases, flow-axis endpoint included (equal to the
      first row, as for a periodic gauge).  Warns on (near-)singular
      link overlaps like the wf_array methods.
    """
    static, data = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("wilson_flow requires a model with dim_k == 2")
    occ = tuple(int(o) for o in occ)
    if occ and (min(occ) < 0 or max(occ) >= static.nsta):
        raise IndexError(
            "occ indices %s out of range for %d states" % (sorted(set(occ)), static.nsta)
        )
    if loop_dir not in (0, 1):
        raise ValueError("loop_dir must be 0 or 1")
    n0, n1 = int(nk[0]), int(nk[1])
    from .utils.xfer import host_pack

    phase = gauge_phases(model, (loop_dir,))[0]
    start = np.asarray(start_k, dtype=np.float64)
    evph, traced, sing = jax.device_get(
        _wilson_flow_jit(
            static, data, occ, n0, n1, int(loop_dir), start,
            np.asarray(host_pack(phase)),
        )
    )
    if float(sing) < np.sqrt(np.finfo(evph.dtype).eps):
        import warnings

        warnings.warn(
            "wilson_flow: smallest link-overlap singular value is %.2e -- "
            "neighboring occupied subspaces are (nearly) orthogonal; refine "
            "the grid or check the band choice." % float(sing),
            UserWarning,
            stacklevel=2,
        )
    return np.asarray(evph, dtype=np.float64), np.asarray(traced, dtype=np.float64)


def _band_curvature_grid(static, data, n0, n1, start, phases_ri):
    """Shared engine of the ahc/nernst/thermal-hall family: solve the
    interior grid, close it with the periodic gauge, per-band plaquette
    fluxes.  Returns (om (nsta, n0-1, n1-1), E (nsta, n0-1, n1-1)) --
    the single home of this pipeline (three copies once drifted:
    only one had grown the degeneracy diagnostic)."""
    from .utils.xfer import unpack_cplx

    kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
    H = assemble(static, data, kpts)
    evals, v = eigh_batched(H)
    w = v.reshape(n0 - 1, n1 - 1, static.nsta, static.nsta)
    w = extend_pbc_seq(w, [unpack_cplx(phases_ri[0]), unpack_cplx(phases_ri[1])])
    wb = jnp.moveaxis(w, 2, 0)[..., None, :]
    om = plaquette_phases(wb)  # (nsta, n0-1, n1-1) per-band fluxes
    E = evals.reshape(n0 - 1, n1 - 1, static.nsta).transpose(2, 0, 1)
    return om, E


@partial(jax.jit, static_argnums=(0, 2, 3))
def _ahc_jit(static, data, n0, n1, start, phases_ri, efs, kt):
    """Band-resolved Berry curvature with zero-temperature occupation
    factors, one program (curvature from _band_curvature_grid), masked
    by E <= E_F per requested Fermi level.  Returns sigma_xy (nef,) in
    e^2/h."""
    om, E = _band_curvature_grid(static, data, n0, n1, start, phases_ri)
    x = (E[None] - efs[:, None, None, None])
    occ = jnp.where(
        kt > 0.0,
        jax.nn.sigmoid(-x / jnp.maximum(kt, 1e-30)),  # Fermi-Dirac
        (x <= 0.0).astype(om.dtype),                  # T = 0 step
    )
    sigma = jnp.sum(om[None] * occ, axis=(1, 2, 3)) / (2.0 * np.pi)
    # diagnostic: E_F passing through a band DEGENERACY at a grid point
    # makes the per-band curvatures there basis-arbitrary (the
    # occupation factor may split degenerate partners) -- flag it
    if static.nsta > 1:
        tol = 100.0 * jnp.sqrt(jnp.finfo(E.dtype).eps) * jnp.maximum(
            jnp.max(jnp.abs(E)), 1.0
        )
        gap = E[1:] - E[:-1]  # (nsta-1, n0-1, n1-1)
        near = (
            (gap[None] < tol)
            & (E[None, :-1] <= efs[:, None, None, None] + tol)
            & (E[None, 1:] >= efs[:, None, None, None] - tol)
        )
        flagged = jnp.any(near, axis=(1, 2, 3))  # (nef,)
    else:
        flagged = jnp.zeros(efs.shape, dtype=bool)
    return sigma, flagged


def anomalous_hall(model, fermi_levels, nk=(101, 101), start_k=(-0.5, -0.5),
                   temperature=0.0):
    """Intrinsic anomalous Hall conductivity sigma_xy(E_F) in units of
    e^2/h, from the band-resolved Berry curvature with zero-temperature
    occupations -- the whole Fermi-level sweep is ONE device program.

    For E_F inside a global gap this is the (integer) Chern number of
    the filled bands (TKNN); inside a band it is the non-quantized
    intrinsic contribution.  Time-reversal-symmetric models give 0 at
    every E_F.  No reference counterpart (the reference computes only
    filled-band Chern numbers).

    Individual-band curvatures are ill-defined where bands touch; as
    long as degenerate partners are jointly occupied (E_F away from the
    touching energy) their curvature sum -- which is what enters here --
    is well-defined.

    :param fermi_levels: scalar or (nef,) Fermi energies
    :param nk: BZ grid (as :func:`chern_number`)
    :param temperature: k_B T in energy units; > 0 replaces the zero-
      temperature step with Fermi-Dirac occupations (smears the
      staircase; also a clean way past on-grid degeneracies at E_F)
    :returns: sigma_xy float array (nef,) -- scalar input gives a float
    """
    static, data, (n0, n1), (p0, p1) = _grid_inputs(model, nk, start_k, "anomalous_hall")
    from .utils.xfer import host_pack

    efs = np.atleast_1d(np.asarray(fermi_levels, dtype=np.float64))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    start = np.asarray(start_k, dtype=np.float64)
    out, flagged = jax.device_get(
        _ahc_jit(static, data, n0, n1, start, phases_ri, jnp.asarray(efs),
                 jnp.asarray(float(temperature)))
    )
    out = np.asarray(out, dtype=np.float64)
    if np.any(flagged) and float(temperature) == 0.0:
        import warnings

        warnings.warn(
            "anomalous_hall: E_F = %s passes through a band degeneracy at "
            "a grid point -- the occupation factor splits degenerate "
            "partners there and the band-resolved curvature is "
            "basis-arbitrary. Shift the grid origin or E_F."
            % np.asarray(efs)[np.asarray(flagged)].tolist(),
            UserWarning, stacklevel=2,
        )
    return float(out[0]) if np.ndim(fermi_levels) == 0 else out


@partial(jax.jit, static_argnums=(0, 2, 3))
def _nernst_jit(static, data, n0, n1, start, phases_ri, mus, kt):
    """Entropy-weighted band-resolved Berry curvature: alpha_xy(mu) for
    the whole mu-batch in one program (_band_curvature_grid engine)."""
    om, E = _band_curvature_grid(static, data, n0, n1, start, phases_ri)
    x = (E[None] - mus[:, None, None, None]) / kt  # (nmu, nsta, ., .)
    # electronic entropy density s = -f ln f - (1-f) ln(1-f)
    #   = x f(x) + ln(1 + e^{-x}),  f = sigmoid(-x)   (both stable)
    s = x * jax.nn.sigmoid(-x) + jax.nn.softplus(-x)
    return jnp.sum(om[None] * s, axis=(1, 2, 3)) / (2.0 * np.pi)


@partial(jax.jit, static_argnums=(0, 2))
def _dipole_jit(static, data, nk, mus, kt, lat):
    """Fermi-surface Berry-curvature dipole D_a(mu) for a mu-batch:
    analytic per-band curvature Omega_n = -2 Im sum_m v^x_nm v^y_mn /
    D_nm^2 and group velocities from the same velocity matrices, no
    plaquettes -- everything lives at the same k-points."""
    from .optical import _band_tensors

    evals, _vecs, V, _ = _band_tensors(static, data, nk, lat,
                                       need_d2=False)
    D = evals[:, :, None] - evals[:, None, :]
    mask = jnp.abs(D) > 1e-7
    inv2 = jnp.where(mask, 1.0 / jnp.where(mask, D * D, 1.0), 0.0)
    om = -2.0 * jnp.imag(
        jnp.einsum("bnm,bnm,bnm->bn", V[:, 0], jnp.conj(V[:, 1]),
                   inv2.astype(V.dtype), precision=jax.lax.Precision.HIGHEST)
    )  # (B, S): Omega_n = -2 Im sum_m v^x_nm v^y_mn / D_nm^2
    Vd = jnp.real(jnp.einsum("bann->ban", V))  # (B, d, S)
    x = (evals[None] - mus[:, None, None]) / kt
    mdf = 0.25 / kt / jnp.cosh(jnp.clip(x / 2.0, -40.0, 40.0)) ** 2
    norm = 1.0 / float(np.prod(nk))
    return jnp.einsum("bas,ubs,bs->ua", Vd, mdf, om,
                      precision=jax.lax.Precision.HIGHEST) * norm


def berry_dipole(model, mu, temperature, nk=(101, 101)):
    """Berry-curvature dipole ``D_a(mu, T)`` of a 2-D metal (Sodemann &
    Fu, PRL 115, 216806 (2015)) -- the Fermi-surface geometric quantity
    behind the nonlinear Hall effect in time-reversal-symmetric but
    inversion-broken conductors:

    ``D_a = int d^2k/(2 pi)^2 sum_n v^a_{nn} Omega_n (-df/de)|_{e_n}
    = (1/(N_k V_c)) sum_{k, n} v^a_{nn} Omega_n (-df/de)``

    (the integrated-by-parts form of ``int f dOmega/dk_a``).  The
    per-band curvature is the analytic sum ``Omega_n = -2 Im sum_m
    v^x_{nm} v^y_{mn} / (e_n - e_m)^2`` from the same velocity
    matrices as the group velocities, so no grid-offset mixing ever
    occurs.  For a FILLED band the dipole vanishes identically (the
    integral of a total derivative -- tested); inversion symmetry
    kills it entirely.  Units: length in lattice units (curvature
    [L^2] x velocity [E L] x 1/E x measure [1/L^2]); in 3-D the
    corresponding dipole would be dimensionless.

    :param mu: scalar or (nmu,) chemical potentials
    :param temperature: k_B T > 0 (the Fermi-surface delta is
      represented thermally)
    :param nk: BZ grid
    :returns: (nmu, 2) array of (D_x, D_y) -- scalar mu gives (2,)
    """
    if float(temperature) <= 0.0:
        raise ValueError("berry_dipole requires temperature > 0")
    static, data = model._get_finalized()
    if static.dim_k != 2 or model._dim_r != 2:
        raise ValueError("berry_dipole requires a fully periodic 2-D model")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != 2:
        raise ValueError("nk must give two grid sizes")
    mus = np.atleast_1d(np.asarray(mu, dtype=np.float64))
    lat = np.asarray(model._lat, dtype=np.float64)
    out = jax.device_get(
        _dipole_jit(static, data, nk, jnp.asarray(mus),
                    jnp.asarray(float(temperature)), jnp.asarray(lat))
    )
    # measure: int d^2k/(2pi)^2 = (1/(N_k V_c)) sum_k
    out = np.asarray(out, dtype=np.float64) / abs(np.linalg.det(lat))
    return out[0] if np.ndim(mu) == 0 else out


@partial(jax.jit, static_argnums=(0, 2, 3))
def _spin_hall_jit(static, data, nk, occ, lat):
    """Occupied-band sum of the spin Berry curvature
    Omega^{sz}_n = -2 Im sum_m <n|j^z_x|m><m|v_y|n> / D_nm^2 with the
    spin current j^z_x = {v_x, s_z}/2, normalized so exactly
    s_z-conserved models give the integer C_up - C_dn."""
    from .optical import _band_tensors

    hp = jax.lax.Precision.HIGHEST
    evals, vecs, V, _ = _band_tensors(static, data, nk, lat,
                                      need_d2=False)
    sz = jnp.asarray(
        np.tile([1.0, -1.0], static.norb), config.float_dtype()
    ).astype(V.dtype)
    Szb = jnp.einsum("bns,s,bms->bnm", jnp.conj(vecs), sz, vecs,
                     precision=hp)
    Jx = 0.5 * (
        jnp.einsum("bnp,bpm->bnm", V[:, 0], Szb, precision=hp)
        + jnp.einsum("bnp,bpm->bnm", Szb, V[:, 0], precision=hp)
    )
    D = evals[:, :, None] - evals[:, None, :]
    mask = jnp.abs(D) > 1e-7
    inv2 = jnp.where(mask, 1.0 / jnp.where(mask, D * D, 1.0), 0.0)
    om_sz = -2.0 * jnp.imag(
        jnp.einsum("bnm,bnm,bnm->bn", Jx, jnp.conj(V[:, 1]),
                   inv2.astype(V.dtype), precision=hp)
    )  # (B, S)
    occ_idx = jnp.asarray(occ, jnp.int32)
    vol = jnp.abs(jnp.linalg.det(lat.real.astype(config.float_dtype())))
    return jnp.sum(om_sz[:, occ_idx]) * (2.0 * np.pi) / (
        float(np.prod(nk)) * vol
    )


def spin_hall_conductivity(model, occ, nk=(101, 101)):
    """Intrinsic spin Hall conductivity of a 2-D spinful insulator from
    the Kubo spin Berry curvature,

    ``sigma^{sz}_{xy} = (2 pi / (N_k V_c)) sum_{k, n occ}
    Omega^{sz}_n,  Omega^{sz}_n = -2 Im sum_m <n|j^z_x|m><m|v_y|n>
    / (e_n - e_m)^2,  j^z_x = (v_x s_z + s_z v_x)/2``

    normalized so that an exactly s_z-conserving model returns the
    INTEGER ``C_up - C_dn`` (twice the spin Chern number; units e/4pi
    restore the physical conductivity).  When s_z conservation is
    broken (Rashba) the value deviates continuously from quantization
    -- unlike :func:`spin_chern`, which stays quantized as long as the
    P.Sz.P spectral gap survives; computing both and comparing is the
    standard diagnostic of how badly s_z is broken.  Same package flux
    orientation as every other Hall quantity (Kane-Mele QSH:
    ``spin_hall = 2 * spin_chern = -2``).  No reference counterpart.

    :param occ: occupied band indices (e.g. ``[0, 1]`` for Kane-Mele)
    :returns: float
    """
    static, data = model._get_finalized()
    if static.dim_k != 2 or model._dim_r != 2:
        raise ValueError(
            "spin_hall_conductivity requires a fully periodic 2-D model"
        )
    if static.nspin != 2:
        raise ValueError("spin_hall_conductivity requires a spinful model")
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(set(occ)) != len(occ) or any(
        not (0 <= o < static.nsta) for o in occ
    ):
        raise ValueError("occ must be distinct band indices")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != 2:
        raise ValueError("nk must give two grid sizes")
    lat = np.asarray(model._lat, dtype=np.float64)
    out = jax.device_get(
        _spin_hall_jit(static, data, nk, occ, jnp.asarray(lat))
    )
    return float(out)


@partial(jax.jit, static_argnames=("static", "nk", "band", "mesh"))
def _node_gap_grid_jit(static, data, nk, band, mesh=None):
    """Direct gap e_{band+1} - e_band on a uniform reduced-coordinate
    grid (device iota; only the program, not the grid, crosses the
    tunnel).  Returns the (nk_1, ..., nk_d) gap array.  Under a mesh
    the flattened k batch carries a GSPMD sharding annotation."""
    from .ops.hamiltonian import assemble as _assemble
    from .ops.solver import shard_grid_axis0

    kpts = device_uniform_grid(nk, (0.0,) * len(nk))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    w = jnp.linalg.eigvalsh(_assemble(static, data, kpts))
    return (w[:, band + 1] - w[:, band]).reshape(nk)


@partial(jax.jit, static_argnames=("static", "band", "steps"))
def _node_refine_jit(static, data, k0, band, steps, step0, decay):
    """Batched normalized-gradient descent on the direct gap.

    The gap at a conical (Dirac/Weyl) touching is non-smooth --
    g(k) ~ |v.(k - k*)| -- so curvature-based methods are useless but
    normalized descent with a geometrically decaying step converges
    linearly: step_i = step0 * decay^i traces a net distance bounded by
    step0/(1-decay) while the decay floor sets the final resolution.
    Gap gradient by Hellmann-Feynman from the analytic dH/dk
    (ops/hamiltonian.assemble_dk): d(gap)/dk_a =
    <u_{b+1}|dH_a|u_{b+1}> - <u_b|dH_a|u_b>.  One lax.scan, the whole
    candidate batch per step."""
    from .ops.hamiltonian import assemble as _assemble
    from .ops.hamiltonian import assemble_dk as _assemble_dk

    hp = jax.lax.Precision.HIGHEST

    def body(k, i):
        w, v = eigh_batched(_assemble(static, data, k))
        dH = _assemble_dk(static, data, k)  # (B, dim, nsta, nsta)
        # eigh_batched returns ROW eigenvectors: v[b, s, :] is state s
        vn = v[:, band, :]
        vm = v[:, band + 1, :]
        gm = jnp.real(jnp.einsum("bn,banm,bm->ba", jnp.conj(vm), dH, vm,
                                 precision=hp))
        gn = jnp.real(jnp.einsum("bn,banm,bm->ba", jnp.conj(vn), dH, vn,
                                 precision=hp))
        g = gm - gn  # (B, dim) gradient of the gap
        norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        step = step0 * decay ** i
        k_new = k - step * g / jnp.where(norm > 1e-30, norm, 1.0)
        gap = w[:, band + 1] - w[:, band]
        return k_new, gap

    k_fin, gaps = jax.lax.scan(body, k0, jnp.arange(steps))
    # one last exact gap at the final points
    w = jnp.linalg.eigvalsh(_assemble(static, data, k_fin))
    return k_fin, w[:, band + 1] - w[:, band], w[:, band]


def find_nodes(model, band=None, nk=24, gap_tol=1e-5, steps=120,
               merge_tol=1e-3, return_energies=False):
    """Locate band-touching points (Dirac/Weyl nodes, band crossings)
    between band ``band`` and ``band + 1`` anywhere in the BZ.

    Two stages, both single compiled programs: (1) the direct gap on a
    coarse uniform ``nk^dim_k`` grid; every axis-aligned local minimum
    (periodic neighbor comparison on host) seeds a candidate; (2) all
    candidates refine together by normalized Hellmann-Feynman gradient
    descent with a geometrically decaying step (conical minima are
    non-smooth, see ``_node_refine_jit``).  Refined points are wrapped
    to [0, 1), merged within ``merge_tol`` (minimum-image metric in
    reduced coordinates), and filtered to ``gap < gap_tol``.

    Nodal LINES (not isolated points) show up as chains of merged
    points along the line -- raise ``nk`` to trace them.  No reference
    counterpart (the reference locates crossings by eye from band
    plots).

    :param band: lower band index of the pair (default ``nsta//2 - 1``,
        the half-filling gap)
    :param nk: scan grid per periodic direction (int or per-axis tuple)
    :param gap_tol: keep refined points with direct gap below this
    :param steps: refinement iterations (final resolution ~
        ``h * (1e-7/h)^(steps/steps)`` -- the decay is sized so the
        last step is ~1e-7 in reduced coordinates)
    :param merge_tol: duplicate-merge radius in reduced coordinates
    :param return_energies: also return the band-``band`` energy at
        each node
    :returns: ``(kpts (M, dim_k), gaps (M,))`` sorted by gap, plus
        ``energies (M,)`` if requested.  Empty arrays when the pair is
        gapped everywhere on the scan scale.
    """
    static, data = model._get_finalized()
    dim = static.dim_k
    if dim < 1:
        raise ValueError("find_nodes requires at least one periodic direction")
    if band is None:
        band = static.nsta // 2 - 1
    band = int(band)
    if not (0 <= band < static.nsta - 1):
        raise ValueError("band must satisfy 0 <= band < nsta - 1")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) == 1:
        nk = nk * dim
    if len(nk) != dim or any(n < 3 for n in nk):
        raise ValueError("nk must give >= 3 points per periodic direction")

    gaps = np.asarray(jax.device_get(_node_gap_grid_jit(
        static, data, nk, band, mesh=pmesh.current_mesh())))
    # axis-aligned periodic local minima
    is_min = np.ones(nk, dtype=bool)
    for ax in range(dim):
        is_min &= gaps <= np.roll(gaps, 1, axis=ax)
        is_min &= gaps <= np.roll(gaps, -1, axis=ax)
    idx = np.argwhere(is_min)
    ftype = np.float64 if config.float_dtype() == jnp.float64 else np.float32
    if idx.size == 0:
        empty = (np.zeros((0, dim), ftype), np.zeros((0,), ftype))
        return empty + (np.zeros((0,), ftype),) if return_energies else empty
    k0 = idx.astype(np.float64) / np.asarray(nk, np.float64)

    h = float(max(1.0 / n for n in nk))
    decay = float((1e-7 / h) ** (1.0 / max(steps, 1)))
    k_fin, g_fin, e_fin = jax.device_get(_node_refine_jit(
        static, data, jnp.asarray(k0, config.float_dtype()), band,
        int(steps), h, decay))
    k_fin = np.asarray(k_fin, np.float64) % 1.0
    g_fin = np.asarray(g_fin, np.float64)
    e_fin = np.asarray(e_fin, np.float64)

    keep = g_fin < float(gap_tol)
    k_fin, g_fin, e_fin = k_fin[keep], g_fin[keep], e_fin[keep]
    # merge duplicates (minimum-image in reduced coordinates), keeping
    # the smallest-gap representative of each cluster
    order = np.argsort(g_fin, kind="stable")
    sel_k, sel_g, sel_e = [], [], []
    for i in order:
        dup = False
        for kk in sel_k:
            d = k_fin[i] - kk
            d -= np.round(d)
            if np.linalg.norm(d) < merge_tol:
                dup = True
                break
        if not dup:
            sel_k.append(k_fin[i])
            sel_g.append(g_fin[i])
            sel_e.append(e_fin[i])
    kpts = np.asarray(sel_k, np.float64).reshape(-1, dim)
    gsel = np.asarray(sel_g, np.float64)
    esel = np.asarray(sel_e, np.float64)
    if return_energies:
        return kpts, gsel, esel
    return kpts, gsel


@partial(jax.jit, static_argnames=("static", "nf", "band"))
def _node_chirality_jit(static, data, k0, band, radius, nf):
    """Total Berry flux of bands 0..band through the 6 faces of a cube
    of half-width ``radius`` centered at ``k0`` (reduced coordinates),
    in units of 2 pi.  Face grids are oriented so that each face's
    (axis0, axis1) pair is right-handed with the OUTWARD normal
    (ey x ez = +ex etc.), making the result the enclosed monopole
    charge in the same orientation convention as the package's slice
    Chern numbers: C(k_z just above a node) - C(just below) = chi.
    One program: all 6 faces assembled and diagonalized in a single
    batch; plaquette phases are gauge-invariant per plaquette so
    per-face eigh gauges never matter.  Also returns the minimum
    direct gap on the cube surface (a vanishing surface gap means the
    cube clips another node -- the charge is then ill-defined)."""
    from .ops.hamiltonian import assemble as _assemble

    ftype = config.float_dtype()
    offs = (jax.lax.iota(ftype, nf) / (nf - 1.0) * 2.0 - 1.0) * radius

    def face(d, s, a, b):
        U, V = jnp.meshgrid(offs, offs, indexing="ij")
        k = jnp.broadcast_to(k0, (nf, nf, 3)).astype(ftype)
        k = k.at[..., d].add(s * radius)
        k = k.at[..., a].add(U)
        k = k.at[..., b].add(V)
        return k

    faces = jnp.stack([
        face(0, +1.0, 1, 2), face(0, -1.0, 2, 1),
        face(1, +1.0, 2, 0), face(1, -1.0, 0, 2),
        face(2, +1.0, 0, 1), face(2, -1.0, 1, 0),
    ])  # (6, nf, nf, 3)
    w, v = eigh_batched(_assemble(static, data, faces.reshape(-1, 3)))
    # eigh_batched returns ROW eigenvectors: v[b, s, :] is state s
    states = v[:, : band + 1, :].reshape(6, nf, nf, band + 1, static.nsta)
    ph = plaquette_phases(states)
    surf_gap = jnp.min(w[:, band + 1] - w[:, band])
    return jnp.sum(ph) / (2.0 * np.pi), surf_gap, jnp.max(jnp.abs(ph))


def node_chirality(model, k0, band=None, radius=0.02, nf=10):
    """Topological charge (chirality) of a 3-D band-touching point:
    the Chern number of bands ``0..band`` over a small closed cube
    enclosing the node at reduced coordinates ``k0``.

    Orientation is pinned to the package slice-Chern convention by
    Gauss's law: ``chern_fn`` of the (k_x, k_y) slice just above the
    node minus the slice just below equals the returned charge (+-1
    for a simple Weyl node; the two members of a TRS-breaking pair sum
    to zero).  Combine with :func:`find_nodes` to classify every node
    in the BZ.  No reference counterpart.

    :param k0: node position, reduced coordinates (from ``find_nodes``)
    :param band: lower band of the touching pair (default
        ``nsta//2 - 1``)
    :param radius: cube half-width in reduced coordinates -- must
        enclose ONLY this node; the surface gap is checked and a
        warning raised when another touching sits on/inside the cube
    :param nf: face grid points per edge
    :returns: integer charge
    """
    import warnings

    static, data = model._get_finalized()
    if static.dim_k != 3:
        raise ValueError("node_chirality requires a 3-D periodic model")
    if band is None:
        band = static.nsta // 2 - 1
    band = int(band)
    if not (0 <= band < static.nsta - 1):
        raise ValueError("band must satisfy 0 <= band < nsta - 1")
    k0 = np.asarray(k0, np.float64).reshape(3)
    chi, surf_gap, max_ph = jax.device_get(_node_chirality_jit(
        static, data, jnp.asarray(k0, config.float_dtype()), band,
        float(radius), int(nf)))
    chi = float(chi)
    if float(max_ph) > 0.5 * np.pi:
        warnings.warn(
            "node_chirality: a surface plaquette carries %.2f rad of "
            "flux (band-pair surface gap %.2e) -- another touching "
            "sits on or near the cube; shrink radius, re-center, or "
            "raise nf.  The charge is unreliable."
            % (float(max_ph), float(surf_gap)))
    out = int(round(chi))
    if abs(chi - out) > 0.05:
        warnings.warn(
            "node_chirality: non-integer total flux %.4f (unresolved "
            "curvature -- raise nf or shrink radius)" % chi)
    return out


def anomalous_nernst(model, mu, temperature, nk=(101, 101),
                     start_k=(-0.5, -0.5)):
    """Intrinsic anomalous Nernst coefficient ``alpha_xy(mu, T)`` in
    units of ``e k_B / h``, from the entropy-density-weighted Berry
    curvature (Xiao, Yao, Fang & Niu, PRL 97, 026603 (2006)):

    ``alpha_xy = (1/2 pi) sum_{k, n} Omega_{n k} s_{n k}``,
    ``s = -f ln f - (1 - f) ln(1 - f)``

    which is EXACTLY the Mott-type integral ``(1/k_B T) int de
    (-df/de) (e - mu) sigma_xy(e)`` over the zero-temperature
    :func:`anomalous_hall` staircase (integration by parts; the
    identity is verified numerically in the tests).  Low-T behavior is
    the Mott relation ``alpha_xy ~ (pi^2/3) k_B T dsigma_xy/dmu``;
    inside a gap alpha vanishes exponentially (no states carry
    entropy); time-reversal symmetry forces 0 at every mu.  No
    reference counterpart.

    The whole mu-batch is one device program.

    :param mu: scalar or (nmu,) chemical potentials
    :param temperature: k_B T in model energy units (must be > 0)
    :returns: alpha_xy float array (nmu,) -- scalar input gives a float
    """
    if float(temperature) <= 0.0:
        raise ValueError("anomalous_nernst requires temperature > 0")
    static, data, (n0, n1), (p0, p1) = _grid_inputs(
        model, nk, start_k, "anomalous_nernst"
    )
    from .utils.xfer import host_pack

    mus = np.atleast_1d(np.asarray(mu, dtype=np.float64))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    start = np.asarray(start_k, dtype=np.float64)
    out = jax.device_get(
        _nernst_jit(static, data, n0, n1, start, phases_ri,
                    jnp.asarray(mus), jnp.asarray(float(temperature)))
    )
    out = np.asarray(out, dtype=np.float64)
    return float(out[0]) if np.ndim(mu) == 0 else out


def _c2_weight(x):
    """Fermionic thermal-transport weight ``W(x) = int_x^inf y^2
    (-df/dy) dy`` (f the Fermi function of the dimensionless energy y),
    in closed form via the dilogarithm:

    ``W = x^2 f(x) + 2 x ln(1 + e^-x) - 2 Li2(-e^-x)``

    (two integrations by parts; jax.scipy.special.spence is scipy's
    convention, Li2(w) = spence(1 - w)).  W(-inf) = pi^2/3 (the full
    Sommerfeld integral), W(0) = pi^2/6, W decays like x^2 e^-x.

    Evaluated via the exact reflection ``W(-x) = pi^2/3 - W(x)`` (the
    integrand y^2 (-df/dy) is even), so the closed form is only ever
    used at x >= 0 where every term is bounded by pi^2/6 -- at
    x = -30 the raw formula cancels three O(1000) terms down to
    pi^2/3, which costs 5e-5 absolute in f32 (measured); the reflected
    branch is 1.4e-6 worst-case in f32 and agrees with the raw f64
    formula to 9e-11.  The clip keeps exp(-x) finite; beyond +30 the
    truncation error of the x >= 0 branch is < 1e-11."""
    xa = jnp.abs(x)
    w = (xa**2 * jax.nn.sigmoid(-xa)
         + 2.0 * xa * jax.nn.softplus(-xa)
         - 2.0 * jax.scipy.special.spence(
             1.0 + jnp.exp(-jnp.clip(xa, 0.0, 30.0))))
    return jnp.where(x < 0.0, np.pi**2 / 3.0 - w, w)


@partial(jax.jit, static_argnums=(0, 2, 3))
def _thermal_hall_jit(static, data, n0, n1, start, phases_ri, mus, kt):
    """c2-weighted band-resolved Berry curvature: kappa_xy(mu)/T for
    the whole mu-batch in one program (_band_curvature_grid engine)."""
    om, E = _band_curvature_grid(static, data, n0, n1, start, phases_ri)
    x = (E[None] - mus[:, None, None, None]) / kt  # (nmu, nsta, ., .)
    return jnp.sum(om[None] * _c2_weight(x), axis=(1, 2, 3)) / (2.0 * np.pi)


def thermal_hall(model, mu, temperature, nk=(101, 101),
                 start_k=(-0.5, -0.5)):
    """Intrinsic electronic thermal Hall conductivity ``kappa_xy(mu,
    T)`` in units of ``k_B^2 T / hbar * 1/(2 pi)`` = ``k_B^2 T / h``,
    from the c2-weighted band-resolved Berry curvature (Smrcka-Streda;
    Qin, Niu & Shi, PRL 107, 236601 (2011)):

    ``kappa_xy / (k_B^2 T / h) = (1/2 pi) sum_{k, n} Omega_{n k}
    W((e_{n k} - mu) / k_B T)``

    with the closed-form Sommerfeld weight :func:`_c2_weight` -- which
    is EXACTLY the energy integral ``(1/(k_B T)^2) int de (-df/de)
    (e - mu)^2 sigma_xy(e)`` over the zero-temperature
    :func:`anomalous_hall` staircase (verified numerically in the
    tests).  Consequences, all tested:

    * mu inside a gap, k_B T << gap: ``kappa_xy = (pi^2/3) C`` -- the
      quantized thermal Hall plateau (Wiedemann-Franz with the Chern
      number);
    * low T anywhere: ``kappa_xy -> (pi^2/3) sigma_xy(mu)`` + O(T^2)
      -- the Wiedemann-Franz law with Lorenz number (pi^2/3)(k_B/e)^2;
    * time-reversal symmetry forces 0 at every mu.

    The whole mu-batch is one device program.  No reference
    counterpart.

    :param mu: scalar or (nmu,) chemical potentials
    :param temperature: k_B T in model energy units (must be > 0)
    :returns: kappa_xy/(k_B^2 T/h) float array (nmu,) -- scalar input
      gives a float
    """
    if float(temperature) <= 0.0:
        raise ValueError("thermal_hall requires temperature > 0")
    static, data, (n0, n1), (p0, p1) = _grid_inputs(
        model, nk, start_k, "thermal_hall"
    )
    from .utils.xfer import host_pack

    mus = np.atleast_1d(np.asarray(mu, dtype=np.float64))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    start = np.asarray(start_k, dtype=np.float64)
    out = jax.device_get(
        _thermal_hall_jit(static, data, n0, n1, start, phases_ri,
                          jnp.asarray(mus), jnp.asarray(float(temperature)))
    )
    out = np.asarray(out, dtype=np.float64)
    return float(out[0]) if np.ndim(mu) == 0 else out


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _nested_wilson_jit(static, data, occ, n0, n1, nest_dir, start, phases_ri):
    """Wannier-sector polarizations by nested Wilson loops (Benalcazar,
    Bernevig & Hughes, PRB 96, 245115 (2017), Sec. VI), one program.

    Wilson loops wind along grid axis 1, the nested loop along axis 0
    (callers transpose for the other combination via ``nest_dir``).
    Steps: solve the grid; per base point, the Wilson-loop eigvecs via
    the cyclic-product similarity P_j = C_j^H W_tot C_j (one
    associative scan + one unitary_eig per string, not one eig per base
    point); build the Wannier-band basis |w^s> = sum_n nu^s_n |u_n>;
    close the nested axis with the periodic gauge EXPLICITLY (the
    arbitrary eigvec phases at the duplicate row would contaminate the
    traced phase otherwise); traced Berry phase per sector and base
    point.  Returns (p (nsec, n1-1) polarizations in [0,1), min Wannier
    gap diagnostic, min link singular value)."""
    from .ops.berry import _overlap, unitary_eig
    from .utils.xfer import unpack_cplx

    kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
    w = _solve_grid_states(static, data, kpts, occ, n0, n1)  # (n0-1, n1-1, S, F)
    p_loop = unpack_cplx(phases_ri[1])
    p_nest = unpack_cplx(phases_ri[0])
    if nest_dir == 1:
        w = jnp.swapaxes(w, 0, 1)
        p_loop, p_nest = p_nest, p_loop
    # close the LOOP axis (now axis 1) with the periodic gauge
    w = jnp.swapaxes(extend_pbc_seq(jnp.swapaxes(w, 0, 1), [p_loop]), 0, 1)
    # Wilson links along the loop axis
    ovr = _overlap(w[:, :-1], w[:, 1:])  # (nx, ny-1, S, S)
    U, s, Vh = jnp.linalg.svd(ovr, full_matrices=False)
    Wl = jnp.matmul(U, Vh, precision=jax.lax.Precision.HIGHEST)
    C = jax.lax.associative_scan(
        lambda a, b: jnp.einsum(
            "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
        ),
        Wl,
        axis=1,
    )  # C[:, j] = W_0 ... W_j
    Wtot = C[:, -1]  # (nx, S, S) full Wilson loop, base point j=0
    theta, P = unitary_eig(Wtot)  # (nx, S), (nx, S, S)
    order = jnp.argsort(theta, axis=-1)
    theta = jnp.take_along_axis(theta, order, axis=-1)
    P = jnp.take_along_axis(P, order[:, None, :], axis=-1)
    # Wannier gap diagnostic: smallest circular gap between sorted
    # Wannier bands (sector tracking needs them separated)
    gaps = jnp.concatenate(
        [theta[:, 1:] - theta[:, :-1],
         (2.0 * np.pi - (theta[:, -1] - theta[:, 0]))[:, None]], axis=-1,
    )
    wgap = jnp.min(gaps)
    # eigvecs of the Wilson loop based at j: nu_j = C_{j-1}^H P (C_0
    # convention: base 0 uses the identity)
    eye = jnp.broadcast_to(jnp.eye(Wl.shape[-1], dtype=Wl.dtype), Wl.shape[:1] + Wl.shape[2:])
    Cfull = jnp.concatenate([eye[:, None], C[:, :-1]], axis=1)  # (nx, ny-1, S, S)
    Ch = jnp.conj(jnp.swapaxes(Cfull, -1, -2))
    nu = jnp.einsum(
        "xjnm,xms->xjns", Ch, P, precision=jax.lax.Precision.HIGHEST
    )  # (nx, ny-1, S, nsec)
    # Wannier-band basis states, rows = sector
    ws = jnp.einsum(
        "xjnf,xjns->xjsf", w[:, :-1], nu, precision=jax.lax.Precision.HIGHEST
    )  # (nx, ny-1, nsec, F)
    # close the nested axis with the periodic gauge (NOT the duplicate
    # row's own eigvecs -- their phases are arbitrary)
    ws = extend_pbc_seq(ws, [p_nest])  # (nx+1, ny-1, nsec, F)
    link = jnp.einsum(
        "xjsf,xjsf->xjs", jnp.conj(ws[:-1]), ws[1:],
        precision=jax.lax.Precision.HIGHEST,
    )  # (nx, ny-1, nsec) single-sector links
    p = _wrap(-jnp.sum(jnp.angle(link), axis=0)).T / (2.0 * np.pi)  # (nsec, ny-1)
    p = jnp.mod(p, 1.0)
    return p, wgap, jnp.min(s)


def quadrupole(model, occ=(0, 1), nk=(31, 31), start_k=(0.0, 0.0)):
    """Wannier-sector polarizations and the quadrupole invariant by
    nested Wilson loops (Benalcazar-Bernevig-Hughes, PRB 96, 245115
    (2017)) -- higher-order band topology, all on device.

    For each Wannier sector s of the occupied-band Wilson loop along
    one axis, the nested Berry phase of the Wannier-band basis along
    the other axis gives the sector polarization p^s in [0, 1).  In the
    BBH quadrupole phase p_x^s = p_y^s = 1/2 for both sectors and the
    corner charge is q_xy = 2 p_x^- p_y^- = 1/2; all vanish in the
    trivial phase.  Requires a gapped Wannier spectrum (reported as
    ``wannier_gap``; sector tracking is meaningless when it closes).

    :param occ: occupied bands (even count; sectors = Wannier bands)
    :returns: dict with ``px``/``py`` ((nsec,) sector polarizations,
      averaged over base points), ``px_spread``/``py_spread`` (max
      deviation across base points -- a convergence diagnostic),
      ``qxy`` (2 px[0] py[0] mod 1), ``wannier_gap`` (min circular gap
      of the Wilson eigenphases, per nesting)

    Example::

        flows.quadrupole(models.bbh(0.5, 1.0))["qxy"]   # -> 0.5
    """
    static, data, (n0, n1), (p0, p1) = _grid_inputs(model, nk, start_k, "quadrupole")
    occ = tuple(int(o) for o in occ)
    if occ and (min(occ) < 0 or max(occ) >= static.nsta):
        raise IndexError(
            "occ indices %s out of range for %d states" % (sorted(set(occ)), static.nsta)
        )
    from .utils.xfer import host_pack

    start = np.asarray(start_k, dtype=np.float64)
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    out = {}
    for name, nest_dir in (("px", 0), ("py", 1)):
        p, wgap, sing = jax.device_get(
            _nested_wilson_jit(static, data, occ, n0, n1, nest_dir, start, phases_ri)
        )
        p = np.asarray(p, dtype=np.float64)
        # circular mean over base points (values live on a circle)
        mean = np.mod(np.angle(np.exp(2j * np.pi * p).mean(axis=1)) / (2 * np.pi), 1.0)
        dev = np.abs(np.angle(np.exp(2j * np.pi * (p - mean[:, None])))).max() / (2 * np.pi)
        out[name] = mean
        out[name + "_spread"] = float(dev)
        out["wannier_gap"] = min(out.get("wannier_gap", np.inf), float(wgap))
        if float(sing) < 1e-8:
            import warnings

            warnings.warn(
                "quadrupole: (near-)singular Wilson links -- refine the grid.",
                UserWarning, stacklevel=2,
            )
    out["qxy"] = float(np.mod(2.0 * out["px"][0] * out["py"][0], 1.0))
    return out


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _sector_chern_jit(static, data, occ, n0, n1, split, start, phases_ri,
                      op_ri):
    """Prodan sector Chern engine (PRB 80, 125327 (2009), generalized
    from Sz to any Hermitian operator): diagonalize the projected
    operator P O P within the occupied space, split the spectrum into
    the lowest ``split`` / remaining eigenstates, and integrate each
    sector's (non-abelian) Berry flux.  Plaquette det-phases are
    invariant under k-dependent basis rotations within a sector, so the
    arbitrary eigh phases are harmless.  Returns (flux-, flux+, min
    projection gap at the split, and the extremal eigenvalues around
    the split for the sign-straddle check)."""
    from .utils.xfer import unpack_cplx

    kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
    w = _solve_grid_states(static, data, kpts, occ, n0, n1)
    w = extend_pbc_seq(w, [unpack_cplx(phases_ri[0]), unpack_cplx(phases_ri[1])])
    op = unpack_cplx(op_ri)
    M = jnp.einsum(
        "...nf,fg,...mg->...nm", jnp.conj(w), op.astype(w.dtype), w,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n0, n1, nocc, nocc) Hermitian
    ev, V = jnp.linalg.eigh(M)  # ascending
    gap = jnp.min(ev[..., split] - ev[..., split - 1])
    ws = jnp.einsum(
        "...nf,...ns->...sf", w, V, precision=jax.lax.Precision.HIGHEST
    )  # rows = P O P eigenstates
    fm = _total_flux(ws[..., :split, :])
    fp = _total_flux(ws[..., split:, :])
    return fm, fp, gap, jnp.max(ev[..., split - 1]), jnp.min(ev[..., split])


def sector_chern(model, occ, op, nk=(41, 41), start_k=(-0.5, -0.5),
                 split=None):
    """Chern numbers of the eigensectors of a symmetry operator
    projected into the occupied space -- the Prodan construction
    (PRB 80, 125327 (2009)) for ANY Hermitian, k-independent operator,
    one device program.  This is the engine behind crystalline
    invariants:

    * ``op`` = the spin matrix gives the spin Chern number (see
      :func:`spin_chern`, which calls this);
    * ``op`` = i * M for a spinful mirror M (or the mirror matrix
      itself when M^2 = +1) on a mirror-invariant plane gives the
      MIRROR Chern number ``C_M = (C_+ - C_-) / 2``;
    * any other conserved (or approximately conserved) grading works
      the same way -- the construction only needs the projected
      spectrum ``P O P`` to stay gapped across the BZ, not
      ``[O, H] = 0``.

    ``op`` acts in the flattened state space (orb x spin, spin
    fastest) and must be Hermitian; for a k-dependent mirror
    representation conjugate the model into a cell where the mirror
    permutes orbitals without fractional-lattice shifts first.

    :param occ: occupied band indices
    :param op: (nsta, nsta) Hermitian matrix (or a length-nsta
      diagonal)
    :param split: size of the lower-eigenvalue sector; default
      ``len(occ) // 2``.  A warning reports when the projected
      spectrum does not straddle zero at this split (the +- labels are
      then arbitrary).
    :returns: dict with ``sector_chern`` ((C+ - C-)/2), ``chern_plus``,
      ``chern_minus``, ``gap`` (min P O P spectral gap at the split)
    """
    static, data, (n0, n1), (p0, p1) = _grid_inputs(
        model, nk, start_k, "sector_chern"
    )
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(occ) < 2:
        raise ValueError("sector_chern needs at least two occupied bands")
    if min(occ) < 0 or max(occ) >= static.nsta:
        raise IndexError(
            "occ indices %s out of range for %d states"
            % (sorted(set(occ)), static.nsta)
        )
    split = len(occ) // 2 if split is None else int(split)
    if not (1 <= split <= len(occ) - 1):
        raise ValueError("split must be in [1, %d]" % (len(occ) - 1))
    op = np.asarray(op, dtype=np.complex128)
    if op.ndim == 1:
        op = np.diag(op)
    if op.shape != (static.nsta, static.nsta):
        raise ValueError("op must be (%d, %d) (or a length-%d diagonal)"
                         % (static.nsta, static.nsta, static.nsta))
    if np.abs(op - op.conj().T).max() > 1e-12:
        raise ValueError("op must be Hermitian (for a spinful mirror M "
                         "with M^2 = -1, pass 1j * M)")
    from .utils.xfer import host_pack

    start = np.asarray(start_k, dtype=np.float64)
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    fm, fp, gap, lo_max, hi_min = jax.device_get(
        _sector_chern_jit(static, data, occ, n0, n1, split, start,
                          phases_ri, host_pack(op))
    )
    cm = float(fm) / (2.0 * np.pi)
    cp = float(fp) / (2.0 * np.pi)
    import warnings

    if float(gap) < 1e-3:
        warnings.warn(
            "sector_chern: the P O P spectrum is (nearly) gapless at the "
            "split (min gap %.2e) -- the sector Chern numbers are "
            "ill-defined for this model/operator/band choice."
            % float(gap),
            UserWarning, stacklevel=2,
        )
    elif not (float(lo_max) < 0.0 < float(hi_min)):
        warnings.warn(
            "sector_chern: the P O P spectrum does not straddle zero at "
            "the requested split (eigenvalues around it in [%.3f, %.3f]) "
            "-- the +- sector labels are arbitrary; check `split`."
            % (float(lo_max), float(hi_min)),
            UserWarning, stacklevel=2,
        )
    return {
        "sector_chern": 0.5 * (cp - cm),
        "chern_plus": cp,
        "chern_minus": cm,
        "gap": float(gap),
    }


def spin_chern(model, occ=(0, 1), nk=(41, 41), start_k=(-0.5, -0.5)):
    """Spin Chern number by the Prodan projection construction, one
    device program: split the occupied space by the sign of the
    projected spin P Sz P and integrate each sector's Berry flux.

    Robust beyond Sz conservation: well-defined whenever the P Sz P
    spectrum stays gapped across the BZ (reported as ``sz_gap``; e.g.
    Kane-Mele WITH Rashba still gives Cs = 1).  ``Cs mod 2`` equals the
    Z2 invariant; ``chern_plus + chern_minus`` is the ordinary (total)
    Chern number.  No reference counterpart.

    :param occ: occupied bands (even count)
    :returns: dict with ``spin_chern`` ((C+ - C-)/2), ``chern_plus``,
      ``chern_minus``, ``sz_gap``
    """
    static, _ = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("spin_chern requires a model with dim_k == 2")
    if static.nspin != 2:
        raise ValueError("spin_chern requires a spinful model (nspin=2)")
    occ = tuple(int(o) for o in occ)
    if len(occ) % 2 != 0 or len(occ) == 0:
        raise ValueError("spin_chern needs an even, nonempty set of occupied bands")
    sz = np.tile([1.0, -1.0], static.norb)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = sector_chern(model, occ, sz, nk=nk, start_k=start_k)
    for w in caught:
        msg = str(w.message).replace("sector_chern", "spin_chern").replace(
            "P O P", "P Sz P"
        )
        warnings.warn(msg, w.category, stacklevel=2)
    return {
        "spin_chern": out["sector_chern"],
        "chern_plus": out["chern_plus"],
        "chern_minus": out["chern_minus"],
        "sz_gap": out["gap"],
    }


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _orb_mag_jit(static, data, occ, n0, n1):
    """Orbital-magnetization pieces on the (n0, n1) grid (see
    orbital_magnetization).  M is exactly LINEAR in mu, so one program
    returns (M0, dM/dmu) with M(mu) = M0 + mu * dMdmu evaluated on the
    host -- any mu (including the default midgap) costs a single
    dispatch.  Also returns the grid's occupied max / unoccupied min
    for the in-gap check."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_dk
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    kpts = device_uniform_grid((n0, n1), jnp.zeros((2,)))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # rows of vecs = states
    dH = assemble_dk(static, data, kpts)  # (B, 2, S, S)
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)
    unocc_idx = jnp.asarray(
        [s for s in range(static.nsta) if s not in occ], dtype=jnp.int32
    )
    uo = vecs[:, occ_idx, :]  # (B, no, S)
    uu = vecs[:, unocc_idx, :]
    eo = evals[:, occ_idx]  # (B, no)
    eu = evals[:, unocc_idx]
    # band-basis velocity blocks <occ| dH_a |unocc>: (B, 2, no, nu)
    V = jnp.einsum("bns,bast,bmt->banm", jnp.conj(uo), dH, uu, precision=hp)
    de = eo[:, :, None] - eu[:, None, :]  # (B, no, nu), negative
    VV = V[:, 0] * jnp.conj(V[:, 1])  # (B, no, nu)
    # w = (eo + eu - 2 mu)/de^2 split into mu-independent pieces
    w0 = (eo[:, :, None] + eu[:, None, :]) / (de * de)
    w1 = -2.0 / (de * de)
    norm = 4.0 * np.pi**2 * kpts.shape[0]
    # normalization fixed by BOTH oracles at once: dM/dmu = C/(2 pi)
    # and M = -(1/2 pi) dE/dphi (phi in flux quanta)
    M0 = jnp.imag(jnp.einsum("bnm,bnm->", VV, w0, precision=hp)) / norm
    dMdmu = jnp.imag(jnp.einsum("bnm,bnm->", VV, w1, precision=hp)) / norm
    return M0, dMdmu, jnp.max(eo), jnp.min(eu)


def orbital_magnetization(model, occ, nk=(61, 61), mu=None):
    r"""Orbital magnetization of a 2-D insulator (modern theory;
    Ceresoli, Thonhauser, Vanderbilt & Resta, PRB 74, 024408 (2006)),
    as one device program.  No reference counterpart.

    Evaluates the k-space band sum

        M = (1/(2 pi)^2 N) sum_k Im sum_{n occ, m unocc}
            <n|dH/dk_1|m><m|dH/dk_2|n> (e_n + e_m - 2 mu) / (e_n - e_m)^2

    with reduced-coordinate derivatives (the Jacobians of the
    Cartesian-k integral and of the cross product cancel exactly, so
    the reduced-BZ mean needs no lattice factors).  Occupied-occupied
    pairs cancel pairwise analytically and are omitted (this also
    removes the degenerate denominators).  Units (e = hbar = 1, so one
    flux quantum = 2 pi): with the flux phi of
    :func:`pythtb_tpu.magnetic.peierls_model` in flux quanta per unit
    cell, M equals -(1/2 pi) dE_total/dphi per unit cell of a large
    flake -- the defining thermodynamic relation, used as the oracle in
    tests.  dM/dmu inside a gap equals C / (2 pi) with C the Chern
    number below the gap (both identities hold simultaneously only in
    this normalization -- they pin the 2 pi's).

    :param occ: occupied band indices (must fill every band below the
      gap containing ``mu``)
    :param nk: BZ grid
    :param mu: chemical potential; default = midgap from the grid solve
    :returns: float M (per unit cell; multiply by 1/cell_area for a
      magnetization density)
    """
    static, data = model._get_finalized()
    if static.dim_k != 2:
        raise ValueError("orbital_magnetization requires dim_k == 2")
    occ = tuple(sorted(int(o) for o in occ))
    if not occ or min(occ) < 0 or max(occ) >= static.nsta:
        raise IndexError(
            "occ indices %s out of range for %d states" % (occ, static.nsta)
        )
    if len(occ) == static.nsta:
        raise ValueError("orbital_magnetization needs at least one empty band")
    n0, n1 = (int(nk), int(nk)) if np.isscalar(nk) else (int(nk[0]), int(nk[1]))
    # M is exactly linear in mu: one dispatch serves any mu (incl. the
    # default midgap, computed from the same program's outputs)
    M0, dMdmu, emax_occ, emin_unocc = jax.device_get(
        _orb_mag_jit(static, data, occ, n0, n1)
    )
    if mu is None:
        mu = 0.5 * (float(emax_occ) + float(emin_unocc))
    M = float(M0) + float(mu) * float(dMdmu)
    if not (float(emax_occ) < mu < float(emin_unocc)):
        import warnings

        warnings.warn(
            "orbital_magnetization: mu=%.6g is not inside the band gap of "
            "the chosen occupation (occupied max %.6g, unoccupied min "
            "%.6g); the insulating formula does not apply."
            % (mu, float(emax_occ), float(emin_unocc)),
            UserWarning, stacklevel=2,
        )
    return float(M)


@partial(jax.jit, static_argnums=(1, 2))
def _c2_dens_jit(G_ri, closed_lam, nlam):
    """Second-Chern density of a (L, n1, n2, n3, no, S) ri-packed state
    family: per-lambda-slice k-means of

        eps^{abcd} Tr[F_ab F_cd],  F_ab = P [d_a P, d_b P] P

    with P the occupied projector (gauge-invariant -- no links, no
    gauge fixing).  k-derivatives are 4th-order central (the density
    concentrates at band-inversion tubes; 2nd order converges only
    ~1/n); the lambda axis is periodic when ``closed_lam`` else
    one-sided 2nd-order at the path ends.  Returns (L,) real."""
    from .utils.xfer import unpack_cplx

    G = unpack_cplx(G_ri)
    P = jnp.einsum("...ms,...mt->...st", G, jnp.conj(G))
    nvec = (nlam,) + tuple(P.shape[1:4])
    dP = []
    d0 = 1.0 / nvec[0]
    if closed_lam:
        r = lambda s: jnp.roll(P, -s, axis=0)
        dPl = (-r(2) + 8 * r(1) - 8 * r(-1) + r(-2)) / (12 * d0)
    else:
        dPl = (jnp.roll(P, -1, axis=0) - jnp.roll(P, 1, axis=0)) / (2 * d0)
        fwd = (-3 * P[0] + 4 * P[1] - P[2]) / (2 * d0)
        bwd = (3 * P[-1] - 4 * P[-2] + P[-3]) / (2 * d0)
        dPl = dPl.at[0].set(fwd).at[-1].set(bwd)
    dP.append(dPl)
    for ax in range(1, 4):
        d = 1.0 / nvec[ax]
        r = lambda s, ax=ax: jnp.roll(P, -s, axis=ax)
        dP.append((-r(2) + 8 * r(1) - 8 * r(-1) + r(-2)) / (12 * d))

    hp = jax.lax.Precision.HIGHEST
    def fab(a, b):
        comm = jnp.einsum("...ij,...jk->...ik", dP[a], dP[b], precision=hp) \
             - jnp.einsum("...ij,...jk->...ik", dP[b], dP[a], precision=hp)
        return jnp.einsum("...ij,...jk,...kl->...il", P, comm, P, precision=hp)

    tr2 = lambda X, Y: jnp.einsum("...ij,...ji->...", X, Y, precision=hp)
    dens = (tr2(fab(0, 1), fab(2, 3))
            - tr2(fab(0, 2), fab(1, 3))
            + tr2(fab(0, 3), fab(1, 2))).real
    return dens.mean(axis=(1, 2, 3))  # (L,)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _family_slice_jit(static, data, t_orb, nk, occ, mesh=None):
    """One lambda slice of a model family: Convention-II occupied states
    on the device-built nk grid, ri-packed (B, no, S, 2).  Module-level
    jit: a phase-diagram sweep calling second_chern/axion_theta
    repeatedly with identical shapes reuses the executable (CLAUDE.md:
    closure jits recompile every call).  With a (static, hashable)
    ``mesh`` the k-batch axis carries a GSPMD sharding annotation --
    the slice solve (the dominant cost) data-parallelizes over ICI."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid, shard_grid_axis0
    from .utils.xfer import pack_cplx

    kpts = device_uniform_grid(tuple(nk), jnp.zeros((3,)))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    H = assemble(static, data, kpts)
    _, vecs = eigh_batched(H)
    u = vecs[:, jnp.asarray(occ, dtype=jnp.int32), :]
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum(
        "bd,ds->bs", kpts, t_orb, precision=jax.lax.Precision.HIGHEST))
    return pack_cplx(u * ph[:, None, :])


def _family_states(models, occ, nk):
    """(L, n1, n2, n3, no, S, 2) ri-packed Convention-II states of a
    model family on a shared k-grid (host loop over the family; every
    slice reuses one cached executable)."""
    out = []
    n1, n2, n3 = nk
    for m in models:
        static, data = m._get_finalized()
        if static.dim_k != 3:
            raise ValueError("second_chern/axion_theta require dim_k == 3")
        if max(occ) >= static.nsta or min(occ) < 0:
            raise IndexError("occ indices out of range")
        t = np.asarray(m._orb)[:, m._per].T
        if m._nspin == 2:
            t = np.repeat(t, 2, axis=1)
        u = np.asarray(jax.device_get(
            _family_slice_jit(static, data, jnp.asarray(t), nk, tuple(occ),
                              pmesh.current_mesh())
        ))
        out.append(u.reshape(n1, n2, n3, len(occ), -1, 2))
    return jnp.asarray(np.stack(out))


def second_chern(models, occ, nk=(16, 16, 16), refine=True):
    """Second Chern number of a CLOSED gapped family of 3-D models
    (axion pump): the integer C2 over the 4-torus (lambda, k1, k2, k3),
    with models[i] the lambda = i/L slice (do NOT duplicate the
    endpoint).  The axion angle of the family winds by 2 pi C2 per
    cycle.  Gauge-invariant projector-curvature discretization (see
    _c2_dens_jit); with ``refine`` the ~n^-3 tail is Richardson-
    extrapolated from nk and 1.25*nk.  No reference counterpart.

    :param models: sequence of tb_models, one per lambda slice, SAME
      hopping graph recommended (any gapped family works)
    :param occ: occupied band indices (gapped everywhere on the loop)
    :param nk: 3-D k-grid per slice
    :returns: float (near-integer; |C2 - round(C2)| is the
      discretization diagnostic)
    """
    occ = tuple(int(o) for o in occ)
    nk = (nk,) * 3 if np.isscalar(nk) else tuple(int(n) for n in nk)
    L = len(models)
    if L < 5:
        raise ValueError("need at least 5 lambda slices")

    def raw(nkv):
        G = _family_states(models, occ, nkv)
        dk = _c2_dens_jit(G, True, L)
        return -float(jnp.mean(dk)) / (4.0 * np.pi**2)

    c = raw(nk)
    if not refine:
        return c
    nk2 = tuple(max(n + 4, int(round(n * 1.25))) for n in nk)
    c2_ = raw(nk2)
    # error ~ n^-3 (measured): eliminate the leading tail.  The ratio
    # generalizes to anisotropic grids as the product of per-axis
    # refinement factors (reduces to f^3 for a uniform factor f).
    rr = float(np.prod(nk2)) / float(np.prod(nk))
    return c2_ + (c2_ - c) / (rr - 1.0)


def axion_theta(models_path, occ, nk=(16, 16, 16), refine=True):
    r"""Chern-Simons axion angle theta of ``models_path[0]``, computed
    by adiabatic pumping along a GAPPED path to a trivial reference
    (theta = 0) at ``models_path[-1]``:

        theta = -Delta theta(path) = -2 pi C2_open(path)

    evaluated with the same gauge-invariant projector-curvature
    density as :func:`second_chern` (open lambda axis, trapezoid
    integration).  This sidesteps the classic failure of direct
    Chern-Simons integration -- that a globally smooth periodic gauge
    must be constructed and any residual gauge defect corrupts theta
    -- by never fixing a gauge at all.  For a time-reversal-invariant
    target, theta is quantized to 0 or pi (mod 2 pi): e.g. the
    Fu-Kane-Mele strong TI pumped through its TR-breaking beta family
    (models.fu_kane_mele(beta=...), beta 0 -> pi) gives theta = pi.
    Reference has no counterpart.

    :param models_path: model sequence from the target (first) to a
      theta = 0 trivial reference (last), gapped throughout; endpoints
      INCLUDED
    :param occ: occupied band indices
    :returns: theta in (-pi, pi] (mod-2 pi representative)
    """
    occ = tuple(int(o) for o in occ)
    nk = (nk,) * 3 if np.isscalar(nk) else tuple(int(n) for n in nk)
    L = len(models_path)
    if L < 5:
        raise ValueError("need at least 5 path slices")
    w = np.ones(L)
    w[0] = w[-1] = 0.5

    def raw(nkv):
        G = _family_states(models_path, occ, nkv)
        dk = np.asarray(jax.device_get(_c2_dens_jit(G, False, L - 1)))
        integral = float((dk * w).sum() / (L - 1))
        return integral / (2.0 * np.pi)  # theta = -Delta theta = +int/2pi

    th = raw(nk)
    if refine:
        nk2 = tuple(max(n + 4, int(round(n * 1.25))) for n in nk)
        th2 = raw(nk2)
        rr = float(np.prod(nk2)) / float(np.prod(nk))  # see second_chern
        th = th2 + (th2 - th) / (rr - 1.0)
    return float((th + np.pi) % (2.0 * np.pi) - np.pi)


@partial(jax.jit, static_argnums=(0,))
def _assemble_packed_jit(static, data, kpts):
    """ri-packed H(k) batch for host-side symmetry checks."""
    from .ops.hamiltonian import assemble
    from .utils.xfer import pack_cplx

    return pack_cplx(assemble(static, data, kpts))


def _inversion_partners(orb, c):
    """Partner map p(a), R_a with 2c - t_a = t_{p(a)} + R_a.
    Coincident orbital positions are geometrically indistinguishable:
    prefer the self-map at inversion-fixed positions and otherwise
    consume partners from an availability pool so multiple coincident
    orbitals pair off consistently (a greedy first-hit map once sent
    two orbitals to the SAME partner, leaving P singular).  The
    numeric P H(-k) P^+ == H(k) check in the callers vets the
    assignment."""
    from .model import PythtbError

    norb, d = orb.shape
    p = np.full(norb, -1, dtype=np.int64)
    Ra = np.zeros((norb, d))
    available = set(range(norb))
    for a in range(norb):
        if p[a] >= 0:
            continue
        target = 2.0 * c - orb[a]
        diff = target[None, :] - orb  # (norb, d)
        Rcand = np.round(diff)
        hit = [int(b) for b in
               np.where(np.abs(diff - Rcand).max(axis=1) < 1e-8)[0]
               if b in available]
        if not hit:
            raise PythtbError(
                "no inversion partner for orbital %d about center %s "
                "-- wrong center or no inversion symmetry"
                % (a, c.tolist())
            )
        use = a if a in hit else hit[0]
        p[a] = use
        Ra[a] = Rcand[use]
        available.discard(a)
        if use != a:
            p[use] = a
            back = 2.0 * c - orb[use] - orb[a]
            Ra[use] = np.round(back)
            if np.abs(back - Ra[use]).max() > 1e-8:
                raise PythtbError(
                    "inversion partner mismatch for orbitals %d/%d"
                    % (a, use)
                )
            available.discard(use)
    return p, Ra


def _inversion_matrix(p, Ra, xi, k):
    """Convention-II inversion representation at reduced k:
    P_{p(a), a} = xi_a e^{2 pi i k . R_a} (orbital space only)."""
    norb = len(p)
    P = np.zeros((norb, norb), dtype=complex)
    P[p, np.arange(norb)] = xi * np.exp(
        2.0j * np.pi * (Ra @ np.asarray(k)))
    return P


def _verify_inversion(static, data, orb, spinful, P_of_k, c, tol, caller):
    """Numerically vet the built inversion representation:
    P H_II(-k) P^+ == H_II(k) at random k (the single home of this
    check for parity_z2 / parity_polarization)."""
    from .model import PythtbError
    from .utils.xfer import host_unpack

    def H_II(k):
        Hk = host_unpack(jax.device_get(_assemble_packed_jit(
            static, data, jnp.asarray(np.asarray(k)[None],
                                      config.float_dtype()))))[0]
        t = np.repeat(orb, 2, axis=0) if spinful else orb
        ph = np.exp(2.0j * np.pi * (t @ np.asarray(k)))
        return ph[:, None] * Hk * np.conj(ph)[None, :]

    rng = np.random.default_rng(0)
    for _ in range(3):
        k = rng.random(orb.shape[1])
        Pk = P_of_k(k)
        dev = np.abs(Pk @ H_II(-k) @ Pk.conj().T - H_II(k)).max()
        if dev > tol:
            raise PythtbError(
                "%s: model is not inversion symmetric about %s with "
                "the given orbital parities (|P H(-k) P^+ - H(k)| = "
                "%.2e).  Note coincident-orbital partners are paired "
                "greedily by position -- if your model's true partner "
                "map differs, relabel the orbitals so partners are "
                "geometrically distinct." % (caller, c.tolist(), dev)
            )


def parity_z2(model, occ, center=None, parity=None, tol=1e-6):
    """Fu-Kane Z2 invariants from parity eigenvalues at the TRIMs
    (PRB 76, 045302 (2007)) -- the inversion-symmetric shortcut that
    needs only ``2^d`` diagonalizations instead of Wilson-loop flows.

    The inversion operator is built from the geometry: orbital ``a`` at
    ``t_a`` maps to the orbital at ``2 c - t_a`` (must exist up to an
    integer lattice vector ``R_a``, else the model has no inversion
    center at ``c``), with matrix ``P(k)_{p(a), a} = xi_a e^{2 pi i
    k . R_a}`` in the Convention-II (cell-periodic) basis and
    ``xi_a`` the INTRINSIC orbital parity (s-like +1, p-like -1 --
    e.g. BHZ needs ``parity=[+1, -1]``).  Spin is untouched by
    inversion.  The construction is VERIFIED numerically
    (``P H(-k) P^dag == H(k)`` at random k) before any invariant is
    computed -- a non-inversion-symmetric model raises instead of
    returning garbage.

    At each TRIM the occupied Kramers pairs carry a common parity
    ``xi = +-1``; ``delta_kappa = prod_pairs xi`` and ``(-1)^nu =
    prod_kappa delta_kappa``.  In 3-D the three weak indices multiply
    the four TRIMs in each ``kappa_i = 1/2`` plane.

    :param occ: occupied bands (even count; Kramers pairs)
    :param center: inversion center in reduced coordinates (default:
      the origin)
    :param parity: per-orbital intrinsic parities (+-1; default all +1)
    :param tol: symmetry/quantization tolerance
    :returns: dict with ``nu0`` (strong index, 0/1), ``delta``
      ({TRIM tuple: +-1}), and for dim_k == 3 ``weak`` (three 0/1
      indices)
    """
    from .model import PythtbError
    from .utils.xfer import host_unpack

    static, data = model._get_finalized()
    d = static.dim_k
    if d < 1:
        raise PythtbError("parity_z2 needs a periodic model")
    if static.nspin != 2:
        raise PythtbError(
            "parity_z2 requires a spinful model (the Fu-Kane formula "
            "counts Kramers pairs)"
        )
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(occ) == 0 or len(occ) % 2 != 0 or len(set(occ)) != len(occ):
        raise PythtbError("occ must be an even number of distinct bands")
    if min(occ) < 0 or max(occ) >= static.nsta:
        raise PythtbError("occ indices %s out of range for %d states"
                          % (sorted(occ), static.nsta))
    norb = model._norb
    orb = np.asarray(model._orb, dtype=np.float64)[:, model._per]
    c = (np.zeros(d) if center is None
         else np.asarray(center, dtype=np.float64))
    if c.shape != (d,):
        raise PythtbError("center must have dim_k components")
    xi = (np.ones(norb) if parity is None
          else np.asarray(parity, dtype=np.float64))
    if xi.shape != (norb,) or np.abs(np.abs(xi) - 1.0).max() > 0:
        raise PythtbError("parity must give +-1 per orbital")

    p, Ra = _inversion_partners(orb, c)

    def P_of_k(k):
        return np.kron(_inversion_matrix(p, Ra, xi, k),
                       np.eye(2))  # spin untouched, spin-fastest

    _verify_inversion(static, data, orb, True, P_of_k, c, tol,
                      "parity_z2")

    trims = np.stack(np.meshgrid(*([[0.0, 0.5]] * d), indexing="ij"),
                     axis=-1).reshape(-1, d)
    delta = {}
    for kappa in trims:
        ev, vec = model.solve_one(kappa, eig_vectors=True)
        vec = np.asarray(vec).reshape(static.nsta, -1)
        t = np.repeat(orb, 2, axis=0)
        u = vec * np.exp(2.0j * np.pi * (t @ kappa))[None, :]
        uo = u[list(occ)]
        M = uo.conj() @ P_of_k(kappa) @ uo.T
        if np.abs(M @ M.conj().T - np.eye(len(occ))).max() > 10.0 * tol:
            raise PythtbError(
                "occupied space at TRIM %s is not closed under "
                "inversion -- check that occ is an isolated group"
                % (np.asarray(kappa).tolist(),)
            )
        xis = np.linalg.eigvalsh(0.5 * (M + M.conj().T))
        if np.abs(np.abs(xis) - 1.0).max() > 10.0 * tol:
            raise PythtbError("parity eigenvalues not quantized at "
                              "TRIM %s" % (np.asarray(kappa).tolist(),))
        n_minus = int(np.sum(xis < 0))
        if n_minus % 2 != 0:
            raise PythtbError("odd parity count at a TRIM -- Kramers "
                              "pairing violated (is the model TRS?)")
        delta[tuple(float(x) for x in kappa)] = int(
            (-1) ** (n_minus // 2))
    prod_all = int(np.prod(list(delta.values())))
    out = {"nu0": 0 if prod_all == 1 else 1, "delta": delta}
    if d == 3:
        weak = []
        for i in range(3):
            pr = int(np.prod([v for k_, v in delta.items()
                              if k_[i] == 0.5]))
            weak.append(0 if pr == 1 else 1)
        out["weak"] = tuple(weak)
    return out


def valley_chern(model, occ, valley_points, nk=(101, 101),
                 start_k=(-0.5, -0.5)):
    """Valley-resolved Chern numbers: partition the BZ plaquette fluxes
    of the occupied bands by the nearest valley (torus metric in
    Cartesian reciprocal space) and integrate each basin.

    The hallmark diagnostic of gapped Dirac materials: h-BN carries
    C_K = -C_K' = +-1/2 (valley Hall, total 0) while the Haldane phase
    carries EQUAL half-integer contributions (total +-1).  The halves
    are exact only in the Dirac limit (gap << bandwidth); away from it
    the partition retains the exact sum rule ``sum_v C_v = C_total``
    (a partition of the same plaquette fluxes -- tested to 1e-12).

    :param occ: occupied bands
    :param valley_points: (nv, 2) reduced valley centers (e.g.
      [[1/3, 2/3], [2/3, 1/3]] for the honeycomb K / K')
    :param nk: grid (as :func:`chern_number`)
    :returns: (nv,) float array of valley Chern numbers
    """
    static, data, (n0, n1), (p0, p1) = _grid_inputs(
        model, nk, start_k, "valley_chern"
    )
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(occ) == 0 or min(occ) < 0 or max(occ) >= static.nsta:
        raise ValueError("occ out of range")
    vp = np.asarray(valley_points, dtype=np.float64)
    if vp.ndim != 2 or vp.shape[1] != 2 or len(vp) < 1:
        raise ValueError("valley_points must be (nv, 2) reduced points")
    from .utils.xfer import host_pack

    start = np.asarray(start_k, dtype=np.float64)
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    om_occ = np.asarray(jax.device_get(_band_curvature_grid_jit(
        static, data, occ, n0, n1, start, phases_ri)), dtype=np.float64)
    # plaquette centers in reduced coordinates
    c0 = (np.arange(n0 - 1) + 0.5) / (n0 - 1) + start[0]
    c1 = (np.arange(n1 - 1) + 0.5) / (n1 - 1) + start[1]
    cc = np.stack(np.meshgrid(c0, c1, indexing="ij"), axis=-1)
    # torus distance in the reciprocal metric of the PERIODIC lattice
    # vectors (kspace.py convention): distance^2 = dred M dred^T with
    # M = (lat_per lat_per^T)^{-1} -- taking a Cartesian 2x2 block is
    # wrong (or singular) for dim_r = 3 embeddings (review finding);
    # minimize over the nine neighbor images for the torus wrap
    lat_per = np.asarray(model._lat, dtype=np.float64)[list(model._per)]
    k_metric = np.linalg.inv(lat_per @ lat_per.T)
    imgs = np.array([(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)])
    d2 = np.empty((len(vp),) + cc.shape[:2])
    for v, kv in enumerate(vp):
        dred = cc - kv[None, None, :]
        best = None
        for im in imgs:
            dk = dred + im[None, None, :]
            dd = np.einsum("ija,ab,ijb->ij", dk, k_metric, dk)
            best = dd if best is None else np.minimum(best, dd)
        d2[v] = best
    owner = np.argmin(d2, axis=0)  # (n0-1, n1-1)
    out = np.array([
        om_occ[owner == v].sum() / (2.0 * np.pi) for v in range(len(vp))
    ])
    return out


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _band_curvature_grid_jit(static, data, occ, n0, n1, start, phases_ri):
    """Device entry point for the shared curvature engine: sums the
    occupied bands' plaquette fluxes ON DEVICE so only the (n0-1,
    n1-1) flux grid crosses the boundary (valley partitioning happens
    on host -- the owner masks are geometry, not tensor math)."""
    om, _E = _band_curvature_grid(static, data, n0, n1, start, phases_ri)
    return jnp.sum(om[jnp.asarray(occ, jnp.int32)], axis=0)


def polarization(model, occ, dir=0, nk=31, start_k=None):
    """Electronic polarization of the filled bands along one lattice
    vector, in reduced units (mod 1): ``p_d = <phi_d(k_perp)> / 2 pi``
    with branch-continuous averaging of the Berry phases over the
    perpendicular grid (King-Smith--Vanderbilt).

    The reference computes this by hand in its examples (berry_phase /
    2 pi); this wrapper packages the convention: multiply by the
    lattice vector (and electron charge) for a dipole moment, add the
    ionic point charges for the total, and remember the polarization
    QUANTUM -- values are defined mod 1.  Inversion-symmetric
    insulators quantize p to one of two values half a quantum apart
    (the offset is set by the inversion center: both SSH phases read
    1/4 and 3/4 -- bond centers -- and flip under delta -> -delta;
    tested); pumping cycles wind p by the Chern number (tested on the
    three-site pump); h-BN's filled band sits on the anion at
    p = (1/3, 1/3) (tested, O(1/nk^2) grid convergence).

    :param occ: filled band indices
    :param dir: polarization direction (a periodic lattice vector)
    :param nk: scalar or per-direction grid sizes
    :param start_k: grid origin (default zeros)
    :returns: float in [0, 1)
    """
    from .model import PythtbError
    from .wf_array import wf_array as _wf

    static, _data = model._get_finalized()
    d = static.dim_k
    if d < 1:
        raise PythtbError("polarization needs a periodic model")
    dir = int(dir)
    if not 0 <= dir < d:
        raise PythtbError("dir must index a periodic direction")
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(occ) == 0 or min(occ) < 0 or max(occ) >= static.nsta:
        raise PythtbError("bad occ")
    nks = tuple(int(x) for x in (np.atleast_1d(nk) if np.ndim(nk)
                                 else [nk] * d))
    if len(nks) == 1 and d > 1:
        nks = nks * d
    if len(nks) != d:
        raise PythtbError("nk must give one size per direction")
    start = (np.zeros(d) if start_k is None
             else np.asarray(start_k, dtype=np.float64))
    wf = _wf(model, list(nks))
    wf.solve_on_grid(start)
    ph = np.asarray(wf.berry_phase(list(occ), dir, contin=True))
    # berry_phase returns the perpendicular grid INCLUDING the wrapped
    # pbc duplicate row per axis -- averaging it double-counts k_perp =
    # start and degrades convergence to O(1/nk) (review finding)
    if ph.ndim > 0:
        ph = ph[tuple(slice(0, -1) for _ in range(ph.ndim))]
    return float(np.mean(ph) / (2.0 * np.pi) % 1.0)


def parity_polarization(model, occ, center=None, parity=None, tol=1e-6):
    """Quantized polarization of a 1-D inversion-symmetric insulator
    from the TRIM parity products (Zak):

        e^{2 pi i (p - n_occ c)} = prod_{n occ} xi_n(0) xi_n(pi),

    so ``p = n_occ c + {0 or 1/2} mod 1`` with the product over ALL
    occupied states -- two diagonalizations instead of a Berry-phase
    grid, and an INDEPENDENT oracle for :func:`polarization`
    (committed test).  Spinful chains: each Kramers pair contributes
    xi^2 = +1, so inversion pins p completely to ``n_occ c mod 1``
    (both spin-doubled SSH phases legitimately read the same value --
    tested against the Berry route).  The inversion operator is built
    and numerically verified exactly as in :func:`parity_z2`.

    :param occ: filled bands
    :param center: inversion center (reduced; default 0)
    :param parity: per-orbital intrinsic parities (default +1)
    :returns: float polarization in [0, 1)
    """
    from .model import PythtbError
    from .utils.xfer import host_unpack

    static, data = model._get_finalized()
    if static.dim_k != 1:
        raise PythtbError("parity_polarization is 1-D (reduce_dim "
                          "higher-dimensional models first)")
    occ = tuple(int(o) for o in np.atleast_1d(occ))
    if len(occ) == 0 or len(set(occ)) != len(occ) or min(occ) < 0 \
            or max(occ) >= static.nsta:
        raise PythtbError("occ must be distinct bands in range")
    norb = model._norb
    orb = np.asarray(model._orb, dtype=np.float64)[:, model._per]
    c = (np.zeros(1) if center is None
         else np.atleast_1d(np.asarray(center, dtype=np.float64)))
    if c.shape != (1,):
        raise PythtbError("center must have dim_k = 1 components")
    xi = (np.ones(norb) if parity is None
          else np.asarray(parity, dtype=np.float64))
    if xi.shape != (norb,) or np.abs(np.abs(xi) - 1.0).max() > 0:
        raise PythtbError("parity must give +-1 per orbital")
    p, Ra = _inversion_partners(orb, c)
    spinful = static.nspin == 2

    def P_of_k(k):
        P = _inversion_matrix(p, Ra, xi, k)
        return np.kron(P, np.eye(2)) if spinful else P

    _verify_inversion(static, data, orb, spinful, P_of_k, c, tol,
                      "parity_polarization")
    prod = 1.0
    for kap in (np.zeros(1), np.array([0.5])):
        _, vec = model.solve_one(kap, eig_vectors=True)
        vec = np.atleast_2d(np.asarray(vec)).reshape(static.nsta, -1)
        t = np.repeat(orb, 2, axis=0) if spinful else orb
        u = vec * np.exp(2.0j * np.pi * (t @ kap))[None, :]
        uo = u[list(occ)]
        M = uo.conj() @ P_of_k(kap) @ uo.T
        if np.abs(M @ M.conj().T - np.eye(len(occ))).max() > 10.0 * tol:
            raise PythtbError("occupied space at TRIM %s not closed "
                              "under inversion" % kap.tolist())
        xis = np.linalg.eigvalsh(0.5 * (M + M.conj().T))
        if np.abs(np.abs(xis) - 1.0).max() > 10.0 * tol:
            raise PythtbError("parity eigenvalues not quantized")
        prod *= float(np.prod(np.sign(xis)))
    branch = 0.0 if prod > 0 else 0.5
    return float((len(occ) * float(c[0]) + branch) % 1.0)


@partial(jax.jit, static_argnums=(0, 3))
def _spin_texture_jit(static, data, kpts, bands):
    """<S_x,y,z>_n(k) for the requested bands, (B, nb, 3), plus the
    minimum separation of each requested band from its spectral
    neighbors (degeneracy diagnostic)."""
    hp = jax.lax.Precision.HIGHEST
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # (B, S, F) rows are states
    bidx = jnp.asarray(bands, jnp.int32)
    D = jnp.abs(evals[:, :, None] - evals[:, None, :])
    D = D + jnp.eye(static.nsta)[None] * 1e30
    mingap = jnp.min(jnp.min(D, axis=-1)[:, bidx])
    v = vecs[:, bidx, :]
    B, nb, F = v.shape
    vv = v.reshape(B, nb, F // 2, 2)  # spin-fastest layout
    up, dn = vv[..., 0], vv[..., 1]
    sx = 2.0 * jnp.real(jnp.einsum("bno,bno->bn", jnp.conj(up), dn,
                                   precision=hp))
    sy = 2.0 * jnp.imag(jnp.einsum("bno,bno->bn", jnp.conj(up), dn,
                                   precision=hp))
    sz = jnp.real(jnp.einsum("bno,bno->bn", jnp.conj(up), up,
                             precision=hp)
                  - jnp.einsum("bno,bno->bn", jnp.conj(dn), dn,
                               precision=hp))
    return jnp.stack([sx, sy, sz], axis=-1), mingap


def spin_texture(model, bands, k_list):
    """Spin expectation values ``<S_a>_n(k) = <psi_n| sigma_a (x) 1
    |psi_n>`` (units of hbar/2) for a batch of k-points and bands, one
    device program -- the standard map for Rashba winding, QSH helical
    edges, and skyrmion textures.

    Oracles (committed): Sz-conserving Kane-Mele returns +-1
    exactly; the Rashba-coupled in-plane texture winds once around a
    band extremum; |<S>| <= 1 everywhere.  At a (near-)degenerate
    k-point the per-band expectation is basis-arbitrary -- a warning
    reports the minimum band separation when it drops below 1e-8
    (e.g. Kramers points of a TRS model: only the PAIR SUM is
    well-defined there).

    :param bands: band indices
    :param k_list: (B, dim_k) reduced k-points
    :returns: (B, nb, 3) float array
    """
    from .model import PythtbError

    static, data = model._get_finalized()
    if static.nspin != 2:
        raise PythtbError("spin_texture requires a spinful model")
    bands = tuple(int(b) for b in np.atleast_1d(bands))
    if len(bands) == 0 or min(bands) < 0 or max(bands) >= static.nsta:
        raise PythtbError("bands out of range")
    kpts = np.asarray(k_list, dtype=np.float64)
    if kpts.ndim != 2 or kpts.shape[1] != static.dim_k:
        raise PythtbError("k_list must be (B, %d)" % static.dim_k)
    out, mingap = jax.device_get(_spin_texture_jit(
        static, data, jnp.asarray(kpts, config.float_dtype()), bands))
    if float(mingap) < 1e-8:
        import warnings

        warnings.warn(
            "spin_texture: a requested band is within %.1e of a "
            "neighbor somewhere in the batch -- per-band spin "
            "expectations are basis-arbitrary at (near-)degenerate "
            "k-points (Kramers points of TRS models); only degenerate-"
            "subspace sums are well-defined there." % float(mingap),
            UserWarning, stacklevel=2,
        )
    return np.asarray(out, dtype=np.float64)
