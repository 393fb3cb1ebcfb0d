"""Lattice dynamics: force-constant models, phonon bands, thermodynamics.

Beyond-reference capability (the reference is purely electronic).  A
:class:`force_model` carries Born force-constant blocks on a lattice
-- either raw ``(dim_r, dim_r)`` matrices (:meth:`force_model.set_fc`)
or longitudinal/transverse springs resolved along the equilibrium bond
(:meth:`force_model.set_spring`) -- with the acoustic sum rule
enforced by construction: the self term is
``Phi_ii(0) = -sum_{(j,R) != (i,0)} Phi_ij(R)`` (+ any explicit
substrate pinning), so rigid translations are exact zero modes and the
acoustic branches are gapless at Gamma to machine precision (tested).

The dynamical matrix ``D(k)_{ia,jb} = (M_i M_j)^{-1/2} sum_R
Phi_ij(R)_{ab} e^{2 pi i k . R}`` is assembled for whole k-batches in
one jitted program (scatter + batched eigh, the same hot path as the
electronic solver); ``omega = sqrt(eig(D))`` with an instability check
(a negative eigenvalue beyond tolerance means the reference
configuration is not a stable equilibrium and raises).

Thermodynamics and transport:

* :func:`heat_capacity` -- Bose-Einstein C_v(T) per cell (k_B = 1,
  Dulong-Petit ``n_modes`` at high T, Debye ``T^d`` at low T: tested);
* :func:`thermal_conductivity` -- RTA kappa_ab(T) with Hellmann-
  Feynman group velocities ``d omega/dk_a = <e| dD/dk_a |e> /
  (2 omega)`` on a half-step-shifted grid (dodges the measure-zero
  degeneracy lines where per-mode velocities need subspace rotation);
* :func:`dos` -- Gaussian-smeared phonon DOS;
* :func:`dynamical_cluster` -- the dense mass-weighted Hessian of a
  glued (periodic) supercell, with optional per-cell mass overrides
  for isotope defects.  The exact torus identity "union of omega(k)
  over the nk = L grid == spectrum of the L-cell glued cluster" is the
  module's machine-precision oracle, and a light isotope pushes a
  localized mode above the band top (both tested).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .parallel import mesh as pmesh

__all__ = [
    "force_model",
    "bands",
    "dos",
    "heat_capacity",
    "thermal_conductivity",
    "dynamical_cluster",
]

_HP = jax.lax.Precision.HIGHEST


class force_model:
    """Harmonic force-constant model on a lattice.

    :param lat: (dim_r, dim_r) lattice vectors (rows)
    :param pos: (natom, dim_r) reduced atom positions
    :param masses: atomic masses, scalar or per-atom
    :param dim_k: number of periodic directions (default all)
    """

    def __init__(self, lat, pos, masses=1.0, dim_k=None):
        self._lat = np.asarray(lat, dtype=float)
        self._pos = np.atleast_2d(np.asarray(pos, dtype=float))
        self._dim_r = self._lat.shape[0]
        if self._lat.shape != (self._dim_r, self._dim_r):
            raise PythtbError("force_model: lat must be square")
        if self._pos.shape[1] != self._dim_r:
            raise PythtbError("force_model: pos must have dim_r columns")
        self._natom = self._pos.shape[0]
        m = np.asarray(masses, dtype=float)
        self._mass = np.full(self._natom, float(m)) if m.ndim == 0 else m
        if self._mass.shape != (self._natom,) or np.any(self._mass <= 0):
            raise PythtbError("force_model: bad masses")
        self._dim_k = self._dim_r if dim_k is None else int(dim_k)
        if not 0 <= self._dim_k <= self._dim_r:
            raise PythtbError("force_model: bad dim_k")
        self._fcs = []  # (Phi (d, d), i, j, R (dim_r,))
        self._pin = [np.zeros((self._dim_r, self._dim_r))
                     for _ in range(self._natom)]

    def _check_bond(self, i, j, R):
        if not (0 <= i < self._natom and 0 <= j < self._natom):
            raise PythtbError("force_model: atom index out of range")
        R = (np.zeros(self._dim_r) if R is None
             else np.asarray(R, dtype=float))
        if R.shape != (self._dim_r,):
            raise PythtbError("force_model: R must have dim_r entries")
        if self._dim_k < self._dim_r and np.any(
            np.abs(R[self._dim_k:]) > 1e-12
        ):
            raise PythtbError(
                "force_model: R nonzero along a non-periodic direction")
        if i == j and np.max(np.abs(R)) < 1e-12:
            raise PythtbError(
                "force_model: the on-site block is fixed by the acoustic "
                "sum rule; use set_pin for substrate pinning")
        return R

    def set_fc(self, phi, i, j, R=None):
        """Add the force-constant block ``Phi_ij(R)`` coupling the
        displacement of atom i in the home cell to atom j in cell R
        (list each bond once; the Hermitian partner ``Phi_ji(-R) =
        Phi_ij(R)^T`` is implied).  ``phi`` scalar (isotropic) or
        (dim_r, dim_r).  Sign convention: the potential energy is
        ``(1/2) sum u_i Phi_ij u_j``, so an attractive spring
        contributes a NEGATIVE off-site block (see set_spring)."""
        R = self._check_bond(i, j, R)
        d = self._dim_r
        P = np.asarray(phi, dtype=float)
        P = np.eye(d) * float(P) if P.ndim == 0 else P
        if P.shape != (d, d):
            raise PythtbError("set_fc: phi must be scalar or (d, d)")
        self._fcs.append((P.copy(), int(i), int(j), R))

    def set_spring(self, kl, i, j, R=None, kt=0.0):
        """Add a two-body spring along the equilibrium bond i(0)->j(R):
        longitudinal stiffness ``kl`` and transverse (bond-bending)
        stiffness ``kt``, i.e. the off-site block
        ``Phi_ij(R) = -(kl n n^T + kt (1 - n n^T))`` with n the unit
        bond vector (the standard Born model)."""
        R = self._check_bond(i, j, R)
        dvec = (R + self._pos[j] - self._pos[i]) @ self._lat
        dn = np.linalg.norm(dvec)
        if dn < 1e-12:
            raise PythtbError("set_spring: coincident atoms (zero bond)")
        n = dvec / dn
        P = -(float(kl) * np.outer(n, n)
              + float(kt) * (np.eye(self._dim_r) - np.outer(n, n)))
        self._fcs.append((P, int(i), int(j), R))

    def set_pin(self, k, i=None):
        """External harmonic pinning ``(1/2) k |u_i|^2`` (substrate
        coupling; deliberately breaks the acoustic sum rule).  ``k``
        scalar or (d, d); all atoms when i is None."""
        d = self._dim_r
        K = np.asarray(k, dtype=float)
        K = np.eye(d) * float(K) if K.ndim == 0 else K
        if K.shape != (d, d):
            raise PythtbError("set_pin: k must be scalar or (d, d)")
        for a in (range(self._natom) if i is None else [int(i)]):
            self._pin[a] = self._pin[a] + K

    def _tables(self, masses=None):
        """Host tables: (iidx, jidx, R (nb, dim_r), blocks (nb, d, d),
        self-blocks (natom, d, d), minv_sqrt (natom,)).  Each listed
        bond appears once; the assembly adds the transpose partner.
        The self term enforces the acoustic sum rule."""
        d = self._dim_r
        mass = self._mass if masses is None else np.asarray(masses, float)
        if mass.shape != (self._natom,) or np.any(mass <= 0):
            raise PythtbError("force_model: bad mass override")
        selfb = [self._pin[a].copy() for a in range(self._natom)]
        for P, i, j, R in self._fcs:
            # ASR: rigid translation u_i = u_j = const gives zero force
            selfb[i] -= P
            selfb[j] -= P.T
        if self._fcs:
            iidx = np.array([b[1] for b in self._fcs], dtype=np.int32)
            jidx = np.array([b[2] for b in self._fcs], dtype=np.int32)
            Rs = np.array([b[3] for b in self._fcs], dtype=float)
            blocks = np.array([b[0] for b in self._fcs], dtype=float)
        else:
            iidx = np.zeros(0, dtype=np.int32)
            jidx = np.zeros(0, dtype=np.int32)
            Rs = np.zeros((0, self._dim_r))
            blocks = np.zeros((0, d, d))
        return (iidx, jidx, Rs, blocks, np.array(selfb),
                1.0 / np.sqrt(mass))


@partial(jax.jit, static_argnums=(0, 8))
def _dynmat_jit(natom, kpts, iidx, jidx, Rs, blocks, selfb, misq,
                mesh=None):
    """Mass-weighted dynamical matrices (B, natom*d, natom*d) -- built
    real/imag separately (no complex host constants cross the
    boundary) and returned ri-packed."""
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        kpts = shard_grid_axis0(kpts, mesh)
    d = selfb.shape[-1]
    n = natom
    B = kpts.shape[0]
    ftype = config.float_dtype()
    ph = 2.0 * np.pi * jnp.einsum("bk,hk->bh", kpts,
                                  Rs[:, : kpts.shape[1]], precision=_HP)
    c, s = jnp.cos(ph), jnp.sin(ph)  # (B, nb)
    w = misq[iidx] * misq[jidx]  # (nb,)
    bw = blocks * w[:, None, None]

    def scatter(weights_direct, weights_partner):
        out = jnp.zeros((B, n, n, d, d), dtype=ftype)
        out = out.at[:, iidx, jidx].add(
            weights_direct[:, :, None, None] * bw[None])
        out = out.at[:, jidx, iidx].add(
            weights_partner[:, :, None, None]
            * jnp.swapaxes(bw, -1, -2)[None])
        return out

    re = scatter(c, c)
    im = scatter(s, -s)
    diag = selfb * (misq ** 2)[:, None, None]
    re = re.at[:, jnp.arange(n), jnp.arange(n)].add(diag[None])
    re = re.transpose(0, 1, 3, 2, 4).reshape(B, n * d, n * d)
    im = im.transpose(0, 1, 3, 2, 4).reshape(B, n * d, n * d)
    return jnp.stack([re, im], axis=-1)


@partial(jax.jit, static_argnums=(0, 8, 9))
def _solve_jit(natom, kpts, iidx, jidx, Rs, blocks, selfb, misq,
               want_vectors=False, mesh=None):
    from .ops.eigh import eigh_batched
    from .utils.xfer import pack_cplx, unpack_cplx

    D_ri = _dynmat_jit(natom, kpts, iidx, jidx, Rs, blocks, selfb, misq,
                       mesh)
    D = unpack_cplx(D_ri)
    w2, vecs = eigh_batched(D)  # rows are modes
    if want_vectors:
        return w2, pack_cplx(vecs)
    return w2, None


def _solve(model, kpts, want_vectors=False, instability_tol=None):
    """Host wrapper: (omega (B, nmode), vecs or None).  Raises on a
    genuinely unstable configuration (w2 < -tol)."""
    if not isinstance(model, force_model):
        raise PythtbError("expected a force_model")
    kpts = np.atleast_2d(np.asarray(kpts, dtype=float))
    if kpts.shape[1] != model._dim_k:
        raise PythtbError("k-points must have dim_k components")
    ftype = config.float_dtype()
    iidx, jidx, Rs, blocks, selfb, misq = model._tables()
    out = _solve_jit(
        model._natom, jnp.asarray(kpts, ftype), jnp.asarray(iidx),
        jnp.asarray(jidx), jnp.asarray(Rs, ftype),
        jnp.asarray(blocks, ftype), jnp.asarray(selfb, ftype),
        jnp.asarray(misq, ftype), want_vectors, pmesh.current_mesh(),
    )
    w2 = np.asarray(jax.device_get(out[0]), dtype=np.float64)
    if instability_tol is None:
        instability_tol = 1e3 * np.finfo(
            np.dtype(ftype).name).eps * max(1.0, np.abs(w2).max())
    if w2.min() < -instability_tol:
        raise PythtbError(
            "phonon: negative eigenvalue %.3e of the dynamical matrix "
            "-- the configuration is not a stable equilibrium"
            % float(w2.min()))
    omega = np.sqrt(np.clip(w2, 0.0, None))
    if not want_vectors:
        return omega, None
    from .utils.xfer import host_unpack

    return omega, host_unpack(np.asarray(jax.device_get(out[1])))


def bands(model, kpts, return_vectors=False):
    """Phonon frequencies (and optionally mass-weighted polarization
    vectors, rows = modes) at the given reduced k-points.

    :returns: omega (nk, nmode) [, vecs (nk, nmode, nmode) complex]
    """
    omega, vecs = _solve(model, kpts, want_vectors=return_vectors)
    return (omega, vecs) if return_vectors else omega


def dynamical_cluster(model, sizes, masses=None):
    """Dense mass-weighted Hessian of the glued (periodic) supercell
    with ``sizes[a]`` cells along each periodic direction -- the exact
    real-space counterpart of the k-grid: its spectrum equals the
    union of ``omega(k)`` over the uniform ``sizes`` grid (the torus
    identity, a committed machine-precision test).

    :param masses: optional (ncells * natom,) per-atom mass override
      (cells ordered C-style by cell index, atoms fastest) -- isotope
      defects, mass disorder
    :returns: (H, omega) -- the dense Hessian (N d, N d) and its mode
      frequencies (clipped at 0; raises on instability)
    """
    if not isinstance(model, force_model):
        raise PythtbError("expected a force_model")
    if model._dim_k == 0:
        sizes = []
    else:
        if np.ndim(sizes) == 0:
            sizes = [int(sizes)] * model._dim_k
        sizes = [int(s) for s in sizes]
        if len(sizes) != model._dim_k or min(sizes) < 1:
            raise PythtbError("dynamical_cluster: bad sizes")
    ncell = int(np.prod(sizes)) if sizes else 1
    na, d = model._natom, model._dim_r
    N = ncell * na
    mass = np.tile(model._mass, ncell) if masses is None else (
        np.asarray(masses, dtype=float))
    if mass.shape != (N,) or np.any(mass <= 0):
        raise PythtbError("dynamical_cluster: mass override must have "
                          "ncells * natom positive entries")
    if sizes:
        grids = np.meshgrid(*[np.arange(s) for s in sizes], indexing="ij")
        cells = np.stack([g.reshape(-1) for g in grids], axis=-1)
    else:
        cells = np.zeros((1, 0), dtype=int)
    H = np.zeros((N * d, N * d))
    iidx, jidx, Rs, blocks, selfb, _ = model._tables()

    def flat(cell, atom):
        idx = 0
        for a in range(len(sizes)):
            idx = idx * sizes[a] + int(cell[a]) % sizes[a]
        return idx * na + atom

    for c in range(ncell):
        for b in range(len(iidx)):
            p = flat(cells[c], iidx[b])
            q = flat(cells[c] + np.rint(Rs[b][: len(sizes)]).astype(int),
                     jidx[b])
            H[p * d:(p + 1) * d, q * d:(q + 1) * d] += blocks[b]
            H[q * d:(q + 1) * d, p * d:(p + 1) * d] += blocks[b].T
        for a in range(na):
            p = flat(cells[c], a)
            H[p * d:(p + 1) * d, p * d:(p + 1) * d] += selfb[a]
    w = np.repeat(1.0 / np.sqrt(mass), d)
    Hm = H * np.outer(w, w)
    w2 = np.linalg.eigvalsh(Hm)
    tol = 1e3 * np.finfo(float).eps * max(1.0, np.abs(w2).max()) * N
    if w2.min() < -tol:
        raise PythtbError(
            "dynamical_cluster: negative eigenvalue %.3e -- unstable "
            "configuration" % float(w2.min()))
    return Hm, np.sqrt(np.clip(w2, 0.0, None))


def _grid(model, nk, shift=0.0):
    if model._dim_k == 0:
        return np.zeros((1, 0))
    if np.ndim(nk) == 0:
        nk = [int(nk)] * model._dim_k
    nk = [int(n) for n in nk]
    if len(nk) != model._dim_k or min(nk) < 1:
        raise PythtbError("nk must give %d sizes >= 1" % model._dim_k)
    grids = np.meshgrid(*[(np.arange(n) + shift) / n for n in nk],
                        indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1)


def dos(model, energies, nk, smearing=0.05):
    """Gaussian-smeared phonon density of states per cell."""
    if float(smearing) <= 0:
        raise PythtbError("smearing must be positive")
    energies = np.atleast_1d(np.asarray(energies, dtype=float))
    omega, _ = _solve(model, _grid(model, nk))
    x = (energies[:, None, None] - omega[None]) / float(smearing)
    g = np.exp(-0.5 * x * x) / (float(smearing) * np.sqrt(2 * np.pi))
    return g.sum(axis=(1, 2)) / omega.shape[0]


def heat_capacity(model, temperatures, nk):
    """Harmonic phonon heat capacity per cell, ``C_v(T) = sum_modes
    x^2 e^x / (e^x - 1)^2`` with ``x = omega / T`` (k_B = 1): the
    Dulong-Petit value is the total mode count, the low-T behavior is
    Debye ``T^dim``.  Zero modes (acoustic Gamma) contribute their
    classical limit 1.

    :returns: (nT,) float array
    """
    Ts = np.atleast_1d(np.asarray(temperatures, dtype=float))
    if np.any(Ts <= 0):
        raise PythtbError("temperatures must be positive")
    omega, _ = _solve(model, _grid(model, nk))
    x = omega[None, :, :] / Ts[:, None, None]  # (nT, B, nmode)
    # x^2 e^x/(e^x-1)^2 = (x / (2 sinh(x/2)))^2, -> 1 as x -> 0
    small = x < 1e-8
    xs = np.where(small, 1.0, x)
    c = np.where(small, 1.0, (xs / (2.0 * np.sinh(np.minimum(xs, 350.0)
                                                  / 2.0))) ** 2)
    return c.sum(axis=(1, 2)) / omega.shape[0]


@partial(jax.jit, static_argnums=(0, 9))
def _kappa_jit(natom, kpts, iidx, jidx, Rs, blocks, selfb, misq, Ts,
               mesh=None):
    """RTA kappa integrand sums: (nT, d, d) grid means of
    C(omega) v_a v_b with Hellmann-Feynman velocities."""
    from .ops.eigh import eigh_batched
    from .utils.xfer import unpack_cplx

    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        kpts = shard_grid_axis0(kpts, mesh)
    D = unpack_cplx(_dynmat_jit(natom, kpts, iidx, jidx, Rs, blocks,
                                selfb, misq, None))
    w2, vecs = eigh_batched(D)
    omega = jnp.sqrt(jnp.clip(w2, 0.0, None))
    # dD/dk_a (reduced): the bond phases differentiate to 2 pi i R_a
    d = selfb.shape[-1]
    n = natom
    B = kpts.shape[0]
    ftype = config.float_dtype()
    dimk = kpts.shape[1]
    ph = 2.0 * np.pi * jnp.einsum("bk,hk->bh", kpts, Rs[:, :dimk],
                                  precision=_HP)
    c, s = jnp.cos(ph), jnp.sin(ph)
    w = misq[iidx] * misq[jidx]
    bw = blocks * w[:, None, None]
    fac = 2.0 * np.pi * Rs[:, :dimk]  # (nb, dimk)

    # d/dk of cos = -sin * fac; of sin = cos * fac
    def scatter(wd, wp):
        out = jnp.zeros((B, dimk, n, n, d, d), dtype=ftype)
        out = out.at[:, :, iidx, jidx].add(
            wd.transpose(0, 2, 1)[:, :, :, None, None] * bw[None, None])
        out = out.at[:, :, jidx, iidx].add(
            wp.transpose(0, 2, 1)[:, :, :, None, None]
            * jnp.swapaxes(bw, -1, -2)[None, None])
        return out.transpose(0, 1, 2, 4, 3, 5).reshape(
            B, dimk, n * d, n * d)

    # direct phase e^{+i ph}: d(re) = -s fac, d(im) = +c fac;
    # partner phase e^{-i ph}: d(re) = -s fac, d(im) = -c fac
    dre = scatter(-s[:, :, None] * fac[None], -s[:, :, None] * fac[None])
    dim_ = scatter(c[:, :, None] * fac[None], -c[:, :, None] * fac[None])
    dD = jax.lax.complex(dre, dim_)
    dw2 = jnp.real(jnp.einsum("bns,bast,bnt->ban", jnp.conj(vecs), dD,
                              vecs, precision=_HP))  # (B, dimk, nmode)
    safe = omega > 1e-9
    v = jnp.where(safe[:, None, :], dw2 / jnp.where(
        safe[:, None, :], 2.0 * omega[:, None, :], 1.0), 0.0)
    x = omega[None] / Ts[:, None, None]
    xs = jnp.where(x < 1e-8, 1.0, x)
    cv = jnp.where(x < 1e-8, 1.0,
                   (xs / (2.0 * jnp.sinh(jnp.minimum(xs, 80.0) / 2.0)))
                   ** 2)
    return jnp.einsum("tbn,ban,bcn->tac", cv, v, v, precision=_HP) / B


def thermal_conductivity(model, temperatures, nk, tau=1.0):
    """RTA lattice thermal conductivity per cell volume,
    ``kappa_ab(T) = (tau / V_c) <C(omega_kn) v_a v_b>_grid`` with
    Hellmann-Feynman group velocities (REDUCED k converted to
    Cartesian via the lattice).  The k-grid is shifted by half a step
    to dodge exact band crossings (per-mode velocities at a
    degeneracy need a subspace rotation; the shifted grid never sits
    on one for the committed models).

    :returns: (nT, dim_k, dim_k) float array
    """
    if not isinstance(model, force_model):
        raise PythtbError("expected a force_model")
    if model._dim_k == 0:
        raise PythtbError("thermal_conductivity needs a periodic model")
    if model._dim_k != model._dim_r:
        raise PythtbError("thermal_conductivity requires dim_k == dim_r")
    Ts = np.atleast_1d(np.asarray(temperatures, dtype=float))
    if np.any(Ts <= 0):
        raise PythtbError("temperatures must be positive")
    kpts = _grid(model, nk, shift=0.5)
    ftype = config.float_dtype()
    iidx, jidx, Rs, blocks, selfb, misq = model._tables()
    kap_red = np.asarray(jax.device_get(_kappa_jit(
        model._natom, jnp.asarray(kpts, ftype), jnp.asarray(iidx),
        jnp.asarray(jidx), jnp.asarray(Rs, ftype),
        jnp.asarray(blocks, ftype), jnp.asarray(selfb, ftype),
        jnp.asarray(misq, ftype), jnp.asarray(Ts, ftype),
        pmesh.current_mesh(),
    )), dtype=np.float64)
    # reduced -> Cartesian velocities: v_cart_a = sum_r J_ra v_red_r,
    # J = lat / (2 pi)
    J = np.asarray(model._lat, dtype=float) / (2.0 * np.pi)
    kap = np.einsum("ra,sc,trs->tac", J, J, kap_red)
    vol = abs(np.linalg.det(model._lat))
    return float(tau) * kap / vol
