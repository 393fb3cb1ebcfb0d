"""Semiclassical Boltzmann transport in the relaxation-time
approximation (RTA).

Beyond-reference capability (the reference computes no transport at
all; its velocity story is finite-differencing ``solve_all`` by hand).
This module evaluates the full RTA transport set of a periodic model
-- electrical conductivity, Seebeck, electronic thermal conductivity,
Lorenz number, and the low-field Hall conductivity -- for a whole
chemical-potential batch in ONE device program.  Everything comes from
the analytic Convention-I derivative operators
(:func:`pythtb_tpu.ops.hamiltonian.assemble_dk` /
:func:`~pythtb_tpu.ops.hamiltonian.assemble_d2k`): band velocities are
diagonal matrix elements of dH, band inverse-mass tensors come from
the exact second-order sum rule (the same one behind
:func:`pythtb_tpu.geometry.drude_weight`), and no finite-difference
grid stencils appear anywhere.

Formalism (hbar = 1, carrier charge q = -e = -1, energies in the
model's units, lengths in lattice units).  Linearizing the Boltzmann
equation ``q (E + v x B) . grad_k g = -(g - f)/tau`` gives

* order E:      ``g1 = q tau (-f') v . E``
* order E B:    ``g2 = -q^2 tau^2 (-f') E_b (v x B)_d Minv_db``
  (the f'' term dies because (v x B) . v = 0)

so with ``L_n^{ab}(mu) = (spin / (N_k V_c)) sum_kn (-f')
(eps - mu)^n v_a v_b``:

* ``sigma_ab = q^2 tau L_0^{ab}``  (Drude-weight identity:
  ``L_0 = D_drude`` by integration by parts -- the committed
  cross-oracle against :func:`pythtb_tpu.geometry.drude_weight`),
* ``S = (1/(q T)) L_0^{-1} L_1`` (Mott relation at low T: tested),
* ``kappa_e = (tau/T) (L_2 - L_1 L_0^{-1} L_1)`` (Wiedemann-Franz:
  the Lorenz number tends to pi^2/3 (k_B/e)^2 in a metal -- tested),
* ``sigma^H_ab;c = -q^3 tau^2 (spin/(N_k V_c)) sum_kn (-f') v_a
  eps_{dec} v_e Minv_db`` (j_a = sigma^H_ab;c E_b B_c); the Hall
  COEFFICIENT ``R_H = -(sigma^-1 sigma^H sigma^-1)_yx`` is
  tau-independent and tends to ``1/(n q)`` in the parabolic dilute
  limit with the electron/hole sign flip -- both tested.

Insulating chemical potentials are reported as NaN with a warning
(the RTA response of a gapped system at low T is exponentially small
and its ratios S, L, R_H are 0/0 -- same guard pattern as the NEGF
thermoelectrics).
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .geometry import _prep
from .model import PythtbError
from .parallel import mesh as pmesh

__all__ = ["transport_coefficients", "transport_distribution",
           "edelstein", "magnetotransport"]

_DEG_TOL = 1e-7


def _band_v_minv(static, data, kpts, lat, need_minv=True):
    """evals (B, S), diagonal velocities vd (B, d, S) and band
    inverse-mass tensors minv (B, d, d, S) from the exact sum rule."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_d2k, assemble_dk

    hp = jax.lax.Precision.HIGHEST
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)
    latj = jnp.asarray(lat, config.float_dtype()).astype(
        config.complex_dtype()
    )
    dH = assemble_dk(static, data, kpts)
    dHc = jnp.einsum("ra,brij->baij", latj, dH, precision=hp) / (2.0 * np.pi)
    V = jnp.einsum("bns,bast,bmt->banm", jnp.conj(vecs), dHc, vecs,
                   precision=hp)
    vd = jnp.real(jnp.einsum("bann->ban", V))
    if not need_minv:
        return evals, vd, None
    d2H = assemble_d2k(static, data, kpts)
    d2c = jnp.einsum("ra,sc,brsij->bacij", latj, latj, d2H,
                     precision=hp) / ((2.0 * np.pi) ** 2)
    W2d = jnp.einsum("bns,bacst,bnt->bacn", jnp.conj(vecs), d2c, vecs,
                     precision=hp)
    D = evals[:, :, None] - evals[:, None, :]  # D[b, n, m] = e_n - e_m
    mask = jnp.abs(D) > _DEG_TOL
    invD = jnp.where(mask, 1.0 / jnp.where(mask, D, 1.0), 0.0)
    minv = jnp.real(W2d) + 2.0 * jnp.real(jnp.einsum(
        "banm,bcmn,bnm->bacn", V, V, invD.astype(V.dtype), precision=hp))
    return evals, vd, minv


@partial(jax.jit, static_argnums=(0, 2, 6))
def _bt_jit(static, data, nk, lat, mus, kt, mesh=None):
    """(L0, L1, L2) (M, d, d), hall (M, d, d[, d]), n_e (M,) -- raw
    grid means (no volume/spin/tau factors; applied on host)."""
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    kpts = device_uniform_grid(nk, jnp.zeros((static.dim_k,),
                                             config.float_dtype()))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    evals, vd, minv = _band_v_minv(static, data, kpts, lat)
    hp = jax.lax.Precision.HIGHEST
    B = evals.shape[0]

    x = (evals[None, :, :] - mus[:, None, None]) / kt  # (M, B, S)
    f = jax.nn.sigmoid(-x)
    w = f * (1.0 - f) / kt  # -df/de, positive
    de = evals[None, :, :] - mus[:, None, None]

    L0 = jnp.einsum("ban,bcn,mbn->mac", vd, vd, w, precision=hp) / B
    L1 = jnp.einsum("ban,bcn,mbn,mbn->mac", vd, vd, w, de,
                    precision=hp) / B
    L2 = jnp.einsum("ban,bcn,mbn,mbn,mbn->mac", vd, vd, w, de, de,
                    precision=hp) / B
    n_e = jnp.sum(jnp.mean(f, axis=1), axis=-1)  # (M,) states per cell

    d = static.dim_k
    if d == 1:
        hall = jnp.zeros((mus.shape[0], 1, 1))
    elif d == 2:
        # B along z: eps_{dez} = [[0, 1], [-1, 0]][d, e]
        eps2 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]],
                           config.float_dtype())
        hall = jnp.einsum("ban,de,ben,bdcn,mbn->mac", vd, eps2, vd,
                          minv, w, precision=hp) / B
    else:
        eps3 = jnp.zeros((3, 3, 3), config.float_dtype())
        for i, j, k, s in ((0, 1, 2, 1.0), (1, 2, 0, 1.0), (2, 0, 1, 1.0),
                           (0, 2, 1, -1.0), (2, 1, 0, -1.0),
                           (1, 0, 2, -1.0)):
            eps3 = eps3.at[i, j, k].set(s)
        hall = jnp.einsum("ban,dec,ben,bdfn,mbn->mafc", vd, eps3, vd,
                          minv, w, precision=hp) / B
    return L0, L1, L2, hall, n_e


def transport_coefficients(model, mus, temperature, nk, tau=1.0):
    """RTA transport coefficients for a chemical-potential batch, one
    device program (the k-grid shards over an active device mesh).

    :param mus: chemical potentials (scalar or 1-D array)
    :param temperature: k_B T (scalar, model energy units)
    :param nk: k-grid (int or per-direction sizes)
    :param tau: relaxation time (constant; hbar = 1 units)
    :returns: dict of arrays over the mu batch --
      ``sigma`` (M, d, d) electrical conductivity / e^2,
      ``seebeck`` (M, d, d) in k_B/e units (negative for electron-like
      carriers), ``kappa_e`` (M, d, d) electronic thermal conductivity,
      ``lorenz`` (M,) kappa_xx / (sigma_xx T) (-> pi^2/3 in a metal),
      ``sigma_hall`` Hall conductivity (M,) for 2-D (B along z) or
      (M, d, d, d) for 3-D (last axis = B direction),
      ``hall_coefficient`` (M,) tau-independent R_H (2-D only;
      ``1/(n q)`` in the dilute limit, q = -1),
      ``n`` (M,) electron density per cell volume (spin-counted),
      ``mus``.  Gapped chemical potentials give NaN ratios + warning.
    """
    static, data, lat, _ = _prep(model, "transport_coefficients")
    if np.ndim(nk) == 0:
        nk = [int(nk)] * static.dim_k
    nk = tuple(int(n) for n in nk)
    if len(nk) != static.dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % static.dim_k)
    kt = float(temperature)
    if kt <= 0:
        raise PythtbError("temperature must be positive")
    tau = float(tau)
    mus = np.atleast_1d(np.asarray(mus, dtype=float))
    ftype = config.float_dtype()
    L0, L1, L2, hall, n_e = jax.device_get(_bt_jit(
        static, data, nk, jnp.asarray(lat, ftype),
        jnp.asarray(mus, ftype), jnp.asarray(kt, ftype),
        pmesh.current_mesh(),
    ))
    L0 = np.asarray(L0, dtype=np.float64)
    L1 = np.asarray(L1, dtype=np.float64)
    L2 = np.asarray(L2, dtype=np.float64)
    hall = np.asarray(hall, dtype=np.float64)
    n_e = np.asarray(n_e, dtype=np.float64)

    vol = abs(np.linalg.det(lat))
    spin = 2.0 if static.nspin == 1 else 1.0
    norm = spin / vol
    L0, L1, L2, hall = (norm * L0, norm * L1, norm * L2, norm * hall)
    n_e = spin * n_e / vol

    q = -1.0  # electron charge in units of e
    d = static.dim_k
    M = mus.shape[0]
    sigma = tau * L0  # q^2 = 1
    # insulator guard: L0 exponentially small -> ratios are 0/0
    floor = max(np.max(np.trace(L0, axis1=1, axis2=2)), 0.0) * 1e-10 + 1e-300
    dead = np.trace(L0, axis1=1, axis2=2) < floor
    if np.any(dead):
        warnings.warn(
            "transport_coefficients: %d of %d chemical potentials sit "
            "in a gap (sigma below the resolution floor); their "
            "Seebeck / Lorenz / Hall-coefficient entries are NaN"
            % (int(dead.sum()), M), stacklevel=2)
    seebeck = np.full((M, d, d), np.nan)
    kappa = np.full((M, d, d), np.nan)
    lorenz = np.full(M, np.nan)
    for i in range(M):
        if dead[i]:
            continue
        inv0 = np.linalg.inv(L0[i])
        seebeck[i] = inv0 @ L1[i] / (q * kt)
        kappa[i] = (tau / kt) * (L2[i] - L1[i] @ inv0 @ L1[i])
        lorenz[i] = kappa[i][0, 0] / (sigma[i][0, 0] * kt)
    out = {
        "mus": mus,
        "sigma": sigma,
        "seebeck": seebeck,
        "kappa_e": kappa,
        "lorenz": lorenz,
        "n": n_e,
    }
    if d == 2:
        sig_h = -(q ** 3) * tau ** 2 * hall[:, :, :]  # (M, d, d)
        out["sigma_hall"] = sig_h[:, 0, 1]
        rh = np.full(M, np.nan)
        for i in range(M):
            if dead[i]:
                continue
            inv0 = np.linalg.inv(sigma[i])
            rh[i] = -(inv0 @ sig_h[i] @ inv0)[1, 0]
        out["hall_coefficient"] = rh
    elif d == 3:
        out["sigma_hall"] = -(q ** 3) * tau ** 2 * hall
    return out


def transport_distribution(model, energies, nk, smearing=0.05):
    """Transport distribution function ``Sigma_ab(eps) =
    (spin/(N_k V_c)) sum_kn v_a v_b delta(eps - eps_kn)`` with a
    Gaussian delta of width ``smearing`` -- the energy-resolved weight
    whose Fermi-window integrals are the ``L_n`` of
    :func:`transport_coefficients` (BoltzTraP-style spectral view).

    :returns: (nE, d, d) float array
    """
    static, data, lat, _ = _prep(model, "transport_distribution")
    if np.ndim(nk) == 0:
        nk = [int(nk)] * static.dim_k
    nk = tuple(int(n) for n in nk)
    if len(nk) != static.dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % static.dim_k)
    if float(smearing) <= 0:
        raise PythtbError("smearing must be positive")
    energies = np.atleast_1d(np.asarray(energies, dtype=float))
    ftype = config.float_dtype()
    td = jax.device_get(_tdf_jit(
        static, data, nk, jnp.asarray(lat, ftype),
        jnp.asarray(energies, ftype), jnp.asarray(float(smearing), ftype),
        pmesh.current_mesh(),
    ))
    spin = 2.0 if static.nspin == 1 else 1.0
    return spin * np.asarray(td, dtype=np.float64) / abs(np.linalg.det(lat))


@partial(jax.jit, static_argnums=(0, 2, 6))
def _tdf_jit(static, data, nk, lat, energies, smear, mesh=None):
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    kpts = device_uniform_grid(nk, jnp.zeros((static.dim_k,),
                                             config.float_dtype()))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    evals, vd, _ = _band_v_minv(static, data, kpts, lat, need_minv=False)
    B = evals.shape[0]
    x = (energies[:, None, None] - evals[None, :, :]) / smear
    g = jnp.exp(-0.5 * x * x) / (smear * np.sqrt(2.0 * np.pi))
    return jnp.einsum("ban,bcn,ebn->eac", vd, vd, g,
                      precision=jax.lax.Precision.HIGHEST) / B


@partial(jax.jit, static_argnums=(0, 2, 6))
def _edelstein_jit(static, data, nk, lat, mus, kt, mesh=None):
    """Raw Edelstein kernel K[m, a, c] = (1/N_k) sum_kn (-f')
    <n|s_a|n> v_c^n (spin in hbar/2*Pauli/2 units, velocity Cartesian;
    host applies charge / tau / volume factors)."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_dk
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    hp = jax.lax.Precision.HIGHEST
    kpts = device_uniform_grid(nk, jnp.zeros((static.dim_k,),
                                             config.float_dtype()))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    evals, vecs = eigh_batched(assemble(static, data, kpts))
    latj = jnp.asarray(lat, config.float_dtype()).astype(
        config.complex_dtype())
    dH = assemble_dk(static, data, kpts)
    dHc = jnp.einsum("ra,brij->baij", latj, dH, precision=hp) \
        / (2.0 * np.pi)
    vd = jnp.real(jnp.einsum("bns,bast,bnt->ban", jnp.conj(vecs), dHc,
                             vecs, precision=hp))
    # spin expectations: row-convention eigenvectors, spin-fastest
    # component layout (comp = 2*orb + spin)
    B, S = evals.shape
    vc = vecs.reshape(B, S, S // 2, 2)
    cdt = vecs.dtype
    sig = jnp.asarray(np.stack([
        [[0, 1], [1, 0]], [[0, -1j], [1j, 0]], [[1, 0], [0, -1]],
    ]) / 2.0, cdt)
    sd = jnp.real(jnp.einsum("bnor,xrs,bnos->bxn", jnp.conj(vc), sig,
                             vc, precision=hp))
    x = (evals[None, :, :] - mus[:, None, None]) / kt
    f = jax.nn.sigmoid(-x)
    w = f * (1.0 - f) / kt  # -df/de
    K = jnp.einsum("bxn,bcn,mbn->mxc", sd, vd, w, precision=hp) / B
    return K


def edelstein(model, mus, temperature, nk, tau=1.0):
    """Edelstein (inverse spin-galvanic) tensor of a spinful model:
    the RTA spin accumulation per electric field,

    ``<s_a> = alpha_ab E_b``,  ``alpha_ab = q tau / (N_k V_c)
        sum_kn (-df/de) <nk|s_a|nk> v_b^{nk}``

    with s in hbar/2-Pauli units (s = sigma/2), q = -1, hbar = 1.
    Nonzero only when inversion symmetry is broken (e.g. Rashba SOC);
    the committed oracles (``tests/test_edelstein.py``) check the
    exact inversion-symmetric zero, Rashba C4 antisymmetry
    ``alpha_xy = -alpha_yx``, linearity in the SOC strength, and a
    differential T -> 0 cross-check against an INDEPENDENT
    Fermi-surface line integral built from
    :func:`pythtb_tpu.fermisurface.fermi_surface` contours.

    :param model: fully periodic :class:`tb_model` with nspin == 2
    :param mus: chemical potentials (scalar or 1-D)
    :param temperature: k_B T > 0
    :param nk: k-grid (int or per-direction sizes)
    :param tau: relaxation time
    :returns: (M, 3, dim_k) array alpha[mu, spin_axis, field_axis]
    """
    static, data, lat, _ = _prep(model, "edelstein")
    if static.nspin != 2:
        raise PythtbError("edelstein requires a spinful model "
                          "(nspin == 2)")
    if np.ndim(nk) == 0:
        nk = [int(nk)] * static.dim_k
    nk = tuple(int(n) for n in nk)
    if len(nk) != static.dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % static.dim_k)
    kt = float(temperature)
    if kt <= 0:
        raise PythtbError("temperature must be positive")
    mus = np.atleast_1d(np.asarray(mus, dtype=float))
    ftype = config.float_dtype()
    K = np.asarray(jax.device_get(_edelstein_jit(
        static, data, nk, jnp.asarray(lat, ftype),
        jnp.asarray(mus, ftype), jnp.asarray(kt, ftype),
        pmesh.current_mesh())), dtype=np.float64)
    vol = abs(np.linalg.det(lat))
    q = -1.0
    return q * float(tau) * K / vol


def _chambers_orbit(v, dt, tau):
    """One periodic orbit's contribution ``oint dt v_a(t) J_b(t)`` to
    the Chambers tensor, with ``J(t) = integral_0^inf e^{-s/tau}
    v(t - s) ds`` solved by an EXACT exponential integrator on the
    native (non-uniform) orbit time grid: on each segment ``v`` is
    linear in t, so ``J_{i+1} = E_i J_i + A_i v_i + C_i v_{i+1}`` in
    closed form (E = e^{-dt/tau}); the periodic fixed point comes from
    one pass (J_N = P J_0 + b -> J_0 = b / (1 - P)).  Exact in BOTH
    limits: dt >> tau reduces to J = tau v (Drude), dt << tau to the
    continuum orbit average -- no resampling resolution to tune.

    v: (m, 2) velocities at the orbit nodes in traversal order;
    dt: (m,) time from node i to node i+1 (wrapping at m-1).
    """
    m = v.shape[0]
    x = dt / tau
    one_m_E = -np.expm1(-x)            # 1 - e^{-dt/tau}, no cancellation
    E = 1.0 - one_m_E
    # segment integral  int_0^dt e^{-(dt-u)/tau} v(u) du  with v linear:
    #   A v_i + C v_{i+1}
    C = tau - tau * tau * one_m_E / dt
    A = tau * one_m_E - C
    Jp = np.zeros(2)
    P = 1.0
    b = np.zeros(2)
    vn = np.roll(v, -1, axis=0)
    # one period: J_N = P J_0 + b
    for i in range(m):
        b = E[i] * b + A[i] * v[i] + C[i] * vn[i]
        P *= E[i]
    J0 = b / max(1.0 - P, 1e-300)
    # second pass: accumulate the trapezoid quadrature of v_a J_b
    out = np.zeros((2, 2))
    J = J0
    for i in range(m):
        Jn = E[i] * J + A[i] * v[i] + C[i] * vn[i]
        out += 0.5 * dt[i] * (np.outer(v[i], J) + np.outer(vn[i], Jn))
        J = Jn
    return out


def magnetotransport(model, ef, bfields, tau=1.0, nk=301, bands=None):
    """Finite-field RTA conductivity tensor ``sigma_ab(B)`` of a 2-D
    metal by the Chambers path-integral solution of the Boltzmann
    equation (T = 0, B along z, hbar = 1, q = -1):

    ``sigma_ab(B) = spin q^2 / (2 pi)^2 sum_orbits oint (dl/|v|)
        v_a(k) integral_0^inf ds e^{-s/tau} v_b(k(-s))``

    where ``k(t)`` follows the semiclassical orbit ``dk/dt =
    q v x B`` -- i.e. the iso-energy contour itself, traversed at
    speed ``|B||v|``.  The Fermi surface comes from the marching-
    squares engine (:func:`pythtb_tpu.fermisurface.fermi_surface`),
    CLOSED and OPEN (zone-traversing) orbits both: an open orbit is
    periodic in the extended zone (velocities repeat after one
    winding), so the memory integral folds into one period either way
    (periodic fixed point of the segment recurrence).  The memory
    integral is solved by an exact exponential integrator on the
    native orbit time grid (see :func:`_chambers_orbit`) -- no
    resampling resolution to tune, exact in both the ``dt >> tau``
    (Drude) and ``dt << tau`` (continuum) limits.

    Physics this reproduces (all committed oracles,
    ``tests/test_magnetotransport.py``):

    * Drude collapse for a closed near-circular pocket:
      ``sigma_xx = sigma_0 / (1 + (w_c tau)^2)``,
      ``sigma_xy = -sign(q B) ... w_c tau``-scaled, with
      ``w_c = |B| / m*`` the cyclotron frequency from
      :func:`pythtb_tpu.fermisurface.cyclotron_mass`;
    * ``B -> 0``: ``sigma`` matches :func:`transport_coefficients`
      at low T, and ``d sigma_xy / dB`` matches its low-field
      ``sigma_hall`` -- two completely independent formulations
      (orbit memory integral vs inverse-mass-tensor grid sum);
    * ``B -> inf`` with only closed orbits: ``sigma_xy -> q n / B``
      (tau-independent), ``sigma_xx ~ 1/B^2``;
    * open orbits: the longitudinal conductivity along the open
      direction saturates instead of vanishing -- the classic
      open-orbit magnetoresistance signature.

    :param model: fully periodic 2-D :class:`tb_model`
    :param ef: Fermi energy (T = 0 contour level)
    :param bfields: magnetic fields B_z (scalar or 1-D array; sign
        respected)
    :param tau: relaxation time
    :param nk: marching-squares grid resolution
    :param bands: band indices to include (default: all bands crossing
        ``ef``)
    :returns: dict with ``Bs`` (nB,), ``sigma`` (nB, 2, 2) in the same
        e^2 units as :func:`transport_coefficients`, and ``orbits``
        (count of (closed, open) contours used)
    """
    from .fermisurface import fermi_surface, fermi_velocity

    static, data, lat, _ = _prep(model, "magnetotransport")
    if static.dim_k != 2:
        raise PythtbError("magnetotransport: dim_k == 2 required")
    tau = float(tau)
    if tau <= 0:
        raise PythtbError("tau must be positive")
    Bs = np.atleast_1d(np.asarray(bfields, dtype=float))
    if np.any(Bs == 0.0):
        raise PythtbError(
            "magnetotransport: B = 0 is singular in the orbit "
            "parametrization; use transport_coefficients for the "
            "zero-field tensor (the B -> 0 limit is smooth)")
    G = 2.0 * np.pi * np.linalg.inv(np.asarray(lat, dtype=float)).T

    conts = fermi_surface(model, ef, nk=nk, bands=bands)
    spin = 2.0 if static.nspin == 1 else 1.0
    sigma = np.zeros((Bs.shape[0], 2, 2))
    n_closed = n_open = 0
    for b, lines in conts.items():
        for pts, closed in lines:
            if pts.shape[0] < 8:
                continue  # marching artifact: too short to integrate
            if closed:
                n_closed += 1
            else:
                # genuinely open orbits end one winding away from the
                # start; anything else is a truncated chain
                W = np.round(pts[-1] - pts[0])
                if not np.all(np.abs(pts[-1] - pts[0] - W) < 0.25) \
                        or np.all(W == 0):
                    warnings.warn(
                        "magnetotransport: skipping a non-periodic "
                        "open chain on band %d (raise nk)" % b,
                        stacklevel=2)
                    continue
                n_open += 1
                pts = pts[:-1] if np.all(
                    np.abs(pts[-1] - W - pts[0]) < 1e-9) else pts
            # drop zero-length segments (marching chains can emit
            # duplicate nodes at cell corners -> dt = 0 -> NaN)
            step = np.linalg.norm(np.diff(pts, axis=0), axis=1)
            keep = np.concatenate([[True], step > 1e-10])
            pts = pts[keep]
            if closed and np.linalg.norm(pts[-1] - pts[0]) < 1e-10:
                pts = pts[:-1]  # explicit closing node: wrap handles it
            if pts.shape[0] < 8:
                continue
            kc = pts @ G  # Cartesian contour points
            v = fermi_velocity(model, pts % 1.0, bands=[b])[:, :, 0]
            speed = np.linalg.norm(v, axis=1)
            if np.any(speed < 1e-12):
                warnings.warn(
                    "magnetotransport: orbit touches a van Hove "
                    "point (|v| = 0); its contribution is skipped",
                    stacklevel=2)
                continue
            # segment from point i to i+1 (wrap: closed -> start;
            # open -> start shifted by the winding vector)
            nxt = np.roll(kc, -1, axis=0)
            if not closed:
                nxt[-1] = kc[0] + W @ G
            dl = np.linalg.norm(nxt - kc, axis=1)
            # traversal orientation for B > 0: dk/dt = q v x B with
            # q = -1, B = +z  ->  dk/dt = (-v_y, v_x) * B
            tang = nxt - kc
            kdot = np.stack([-v[:, 1], v[:, 0]], axis=1)
            orient = np.sum(np.einsum("ia,ia->i", tang, kdot))
            if orient < 0.0:
                # reversed point order: segment j runs q_j -> q_{j+1}
                # = old segment m-2-j, and the wrap segment is shared
                v = v[::-1]
                speed = speed[::-1]
                dl = np.roll(dl[::-1], -1)
            # time along the orbit at |B| = 1 (scales as 1/|B|)
            dt1 = dl / speed
            for iB, Bz in enumerate(Bs):
                if Bz < 0.0:
                    # field reversal runs the same contour backwards
                    v_s = v[::-1]
                    dt_s = np.roll(dt1[::-1], -1) / abs(Bz)
                else:
                    v_s = v
                    dt_s = dt1 / abs(Bz)
                contrib = abs(Bz) * _chambers_orbit(v_s, dt_s, tau)
                sigma[iB] += spin * contrib / (2.0 * np.pi) ** 2
    if n_closed + n_open == 0:
        warnings.warn("magnetotransport: no Fermi-surface orbit at "
                      "ef = %g (insulator or ef outside bands); sigma "
                      "is zero" % ef, stacklevel=2)
    return {"Bs": Bs, "sigma": sigma, "tau": tau,
            "orbits": (n_closed, n_open)}
