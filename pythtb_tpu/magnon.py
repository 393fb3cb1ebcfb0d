"""Linear spin-wave theory: magnon bands, Berry curvature, thermal Hall.

Beyond-reference capability (the reference framework at
``/root/reference/pythtb.py`` is electronic tight-binding only): a
:class:`spin_model` describes localized moments with bilinear
exchange ``H = sum_bonds S_i^T J_b S_j + sum_i S_i^T A_i S_i -
sum_i h . S_i`` (each bond listed ONCE; ``J`` a scalar Heisenberg
coupling or a full 3x3 matrix -- DM vectors are the antisymmetric
part), Holstein-Primakoff bosonizes it to quadratic order about a
user-supplied classical moment configuration, and the resulting
bosonic BdG Hamiltonian is diagonalized para-unitarily (Colpa,
Physica 93A, 327 (1978)) in one batched device program.

Conventions (all pinned by the oracle tier in
``tests/test_magnon.py``):

* local frames: moment direction ``v_i`` (unit), transverse frame
  ``u_i = e1 + i e2`` with ``(e1, e2, v)`` right-handed, so
  ``S_i ~ sqrt(S/2) (conj(u) a + u a^dag) + v (S - n)`` -- the
  STANDARD Holstein-Primakoff assignment with ``S^+_local ~ a``
  (an up-moment's ``S^+`` annihilates magnons).  The conjugated
  frame is a consistent quantization too but relabels every band
  ``omega(k) -> omega(-k)``; sorted-energy oracles cannot see the
  difference, so the momentum label is pinned by a translation-
  eigenvalue oracle (``tests/test_magnon_sf.py``): ``bands(q)[n]``
  is the energy of the exact one-magnon eigenstate with Bloch
  momentum ``+q`` (``T|psi> = e^{-2 pi i q}|psi>``);
* dynamical matrix (Toth & Lake, J. Phys. CM 27, 166002 (2015)
  structure): each physical bond is symmetrized into two directed
  entries carrying half the coupling, and per DIRECTED entry

  ``A(k)_ij += sqrt(S_i S_j) u_i^T J'_b conj(u_j) e^{2 pi i k d_b}``
  ``B(k)_ij += sqrt(S_i S_j) u_i^T J'_b u_j e^{2 pi i k d_b}``
  ``C_ii    += 2 S_j v_i^T J'_b v_j``            (J' = J/2)

  plus ``C_ii -= h . v_i`` (Zeeman), assembled into
  ``h(k) = [[A - C, B], [B^H, conj(A(-k)) - C]]`` whose para-unitary
  spectrum ``eig(sigma3 h)`` gives the magnon energies (positive
  branch).  These factors reproduce the textbook FM chain
  ``omega = 4|J|S sin^2(k/2)`` and AFM chain ``2JS |sin k|`` and are
  pinned numerically by the exact one-magnon oracle below;
* single-ion terms use normal-ordered HP (``(v.S)^2`` contributes
  ``-(2S-1) n``), so an ``S = 1/2`` single-ion anisotropy has exactly
  zero effect on the spectrum -- as it must;
* displacement phases are Convention-I-like, ``d = R + t_j - t_i``
  in reduced coordinates.

The one-magnon sector of a FERROMAGNETIC ground state is exact (the
fully polarized state is an exact eigenstate and LSWT truncation is
exact at one flip), so the oracle tier compares magnon energies with
the full Pauli-kron spin Hamiltonian's ``S^z_tot = N/2 - 1`` sector
-- an independent construction with no HP, no bosons, no local
frames -- including DM and field terms.  Antiferromagnets are pinned
to the analytic Bogoliubov chain dispersion ``2JS |sin k|``.

Topology: magnon Berry curvature uses the para-unitary eigenvectors
with the BOSONIC sigma3 metric in the link overlaps; when ``B(k) = 0``
(e.g. collinear FM with z-DM) the problem reduces to a fermion-like
Bloch Hamiltonian and the magnon Chern number must equal the
electronic Chern number of the equivalent ``tb_model`` -- a pinned
differential oracle.  Thermal Hall conductivity follows
Matsumoto-Murakami (PRL 106, 197202 (2011)) with the c2 weight
evaluated via dilogarithms.
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .parallel import mesh as pmesh
from .utils.xfer import host_unpack, pack_cplx

__all__ = ["spin_model", "bands", "chern", "thermal_hall",
           "berry_curvature", "structure_factor"]

_HP = jax.lax.Precision.HIGHEST


class spin_model:
    """Localized-moment model on a lattice.

    :param lat: (dim_r, dim_r) lattice vectors (rows)
    :param pos: (nsite, dim_r) reduced site positions
    :param spin: spin length S, scalar or per-site
    :param dim_k: number of periodic directions (default all)
    """

    def __init__(self, lat, pos, spin=0.5, dim_k=None):
        self._lat = np.asarray(lat, dtype=float)
        self._pos = np.atleast_2d(np.asarray(pos, dtype=float))
        self._dim_r = self._lat.shape[0]
        if self._lat.shape != (self._dim_r, self._dim_r):
            raise PythtbError("spin_model: lat must be square")
        if self._pos.shape[1] != self._dim_r:
            raise PythtbError("spin_model: pos must have dim_r columns")
        self._nsite = self._pos.shape[0]
        s = np.asarray(spin, dtype=float)
        self._S = np.full(self._nsite, float(s)) if s.ndim == 0 else s
        if self._S.shape != (self._nsite,) or np.any(self._S <= 0):
            raise PythtbError("spin_model: bad spin lengths")
        self._dim_k = self._dim_r if dim_k is None else int(dim_k)
        self._bonds = []  # (J 3x3, i, j, R)
        self._single_ion = [np.zeros((3, 3)) for _ in range(self._nsite)]
        self._field = np.zeros((self._nsite, 3))
        self._moments = np.tile([0.0, 0.0, 1.0], (self._nsite, 1))

    # -- construction ---------------------------------------------------

    def set_coupling(self, J, i, j, R=None, dm=None):
        """Add a bond ``S_i^T J S_j`` (listed once).  ``J`` scalar
        (Heisenberg) or 3x3; ``dm`` an optional Dzyaloshinskii-Moriya
        vector D with ``D . (S_i x S_j)`` added to the coupling."""
        if not (0 <= i < self._nsite and 0 <= j < self._nsite):
            raise PythtbError("set_coupling: site index out of range")
        R = np.zeros(self._dim_r) if R is None else np.asarray(R, float)
        if R.shape != (self._dim_r,):
            raise PythtbError("set_coupling: R must have dim_r entries")
        if self._dim_k < self._dim_r and np.any(
            np.abs(R[self._dim_k:]) > 1e-12
        ):
            raise PythtbError(
                "set_coupling: R nonzero along a non-periodic direction"
            )
        Jm = np.asarray(J, dtype=float)
        Jm = np.eye(3) * float(Jm) if Jm.ndim == 0 else Jm
        if Jm.shape != (3, 3):
            raise PythtbError("set_coupling: J must be scalar or 3x3")
        Jm = Jm.copy()
        if dm is not None:
            D = np.asarray(dm, dtype=float)
            if D.shape != (3,):
                raise PythtbError("set_coupling: dm must be a 3-vector")
            # D . (S_i x S_j) = S_i^T M S_j with M_ab = sum_c eps_abc D_c
            Jm += np.array([
                [0.0, D[2], -D[1]],
                [-D[2], 0.0, D[0]],
                [D[1], -D[0], 0.0],
            ])
        if i == j and np.max(np.abs(R)) < 1e-12:
            raise PythtbError(
                "set_coupling: same-site R=0 term is single-ion "
                "anisotropy; use set_single_ion"
            )
        self._bonds.append((Jm, int(i), int(j), R))

    def set_single_ion(self, A, i):
        """Single-ion term ``S_i^T A S_i`` (A symmetrized; the
        antisymmetric part is a constant for a single spin)."""
        Am = np.asarray(A, dtype=float)
        Am = np.eye(3) * float(Am) if Am.ndim == 0 else Am
        if Am.shape != (3, 3):
            raise PythtbError("set_single_ion: A must be scalar or 3x3")
        self._single_ion[i] = self._single_ion[i] + 0.5 * (Am + Am.T)

    def set_field(self, h, i=None):
        """Zeeman term ``-h . S_i`` (all sites when i is None)."""
        h = np.asarray(h, dtype=float)
        if h.shape != (3,):
            raise PythtbError("set_field: h must be a 3-vector")
        if i is None:
            self._field[:] = h
        else:
            self._field[i] = h

    def set_moments(self, directions):
        """Classical ground-state moment directions (unit 3-vectors,
        one per site).  LSWT is an expansion about this configuration;
        it is the caller's responsibility that it is the classical
        minimum (a non-positive-definite dynamical matrix raises at
        solve time)."""
        d = np.atleast_2d(np.asarray(directions, dtype=float))
        if d.shape != (self._nsite, 3):
            raise PythtbError("set_moments: need (nsite, 3) directions")
        n = np.linalg.norm(d, axis=1)
        if np.any(n < 1e-12):
            raise PythtbError("set_moments: zero direction")
        self._moments = d / n[:, None]

    def classical_energy(self):
        """Energy per cell of the classical moment configuration."""
        e = 0.0
        for Jm, i, j, R in self._bonds:
            e += self._S[i] * self._S[j] * (
                self._moments[i] @ Jm @ self._moments[j]
            )
        for i in range(self._nsite):
            e += self._S[i] ** 2 * (
                self._moments[i] @ self._single_ion[i] @ self._moments[i]
            )
            e -= self._S[i] * (self._field[i] @ self._moments[i])
        return float(e)

    # -- LSWT assembly tables --------------------------------------------

    def _frames(self):
        """(u, v): transverse complex frames and moment directions."""
        v = self._moments
        u = np.zeros((self._nsite, 3), dtype=complex)
        for i in range(self._nsite):
            ref = np.array([0.0, 0.0, 1.0])
            if abs(v[i] @ ref) > 0.9:
                ref = np.array([1.0, 0.0, 0.0])
            e1 = np.cross(ref, v[i])
            e1 /= np.linalg.norm(e1)
            e2 = np.cross(v[i], e1)
            u[i] = e1 + 1j * e2
        return u, v

    def _tables(self):
        """Host-side LSWT bond tables.

        Returns (iidx, jidx, d, a_amp, b_amp, Cdiag, nsite) where the
        per-bond amplitudes follow the symmetrized-and-halved
        convention in the module docstring, and Cdiag collects the
        k-independent diagonal (vv exchange, single-ion, Zeeman).
        """
        u, v = self._frames()
        S = self._S
        # symmetrize: every user bond contributes itself and its
        # transpose-reversed partner, each at half weight
        sym = []
        for Jm, i, j, R in self._bonds:
            sym.append((0.5 * Jm, i, j, R))
            sym.append((0.5 * Jm.T, j, i, -R))
        iidx, jidx, dvec, a_amp, b_amp = [], [], [], [], []
        Cdiag = np.zeros(self._nsite)
        for Jm, i, j, R in sym:
            d = R + self._pos[j] - self._pos[i]
            # per-directed-entry factor sqrt(SiSj) on the HALVED Jm:
            # the a_i a^dag_j reordering terms double the naive
            # sqrt(SiSj)/2 coefficient of each ordered expansion (see
            # module docstring; pinned by the FM-chain analytic and
            # the exact one-magnon oracle)
            pref = np.sqrt(S[i] * S[j])
            iidx.append(i)
            jidx.append(j)
            dvec.append(d[: self._dim_k])
            # standard HP frame (S^+_local ~ a): the a^dag_i a_j
            # coefficient is u_i^T J conj(u_j); the conjugated frame
            # relabels omega(k) -> omega(-k) (caught by the exact
            # translation-eigenvalue oracle in test_magnon_sf.py)
            a_amp.append(pref * (u[i] @ Jm @ np.conj(u[j])))
            b_amp.append(pref * (u[i] @ Jm @ u[j]))
            # n_i coefficient -S_j v_i J v_j (full J); each directed
            # entry carries J/2 and only touches its own i slot
            Cdiag[i] += 2.0 * S[j] * (v[i] @ Jm @ v[j])
        for i in range(self._nsite):
            Am = self._single_ion[i]
            if np.max(np.abs(Am)) > 0:
                # normal-ordered HP: (v.S)^2 -> -(2S-1) n (so S = 1/2
                # single-ion terms drop out exactly); transverse parts
                # (standard frame) give n coeff S Re[u^T A conj(u)]
                # and a^dag a^dag coeff (S/2) u^T A u (single slot,
                # halved vs the bond-pair splitting)
                iidx.append(i)
                jidx.append(i)
                dvec.append(np.zeros(self._dim_k))
                a_amp.append(S[i] * np.real(u[i] @ Am @ np.conj(u[i])))
                b_amp.append(0.5 * S[i] * (u[i] @ Am @ u[i]))
                Cdiag[i] += (2.0 * S[i] - 1.0) * (v[i] @ Am @ v[i])
            Cdiag[i] -= self._field[i] @ v[i]
        if not iidx:
            raise PythtbError("spin_model: no couplings set")
        return (
            np.asarray(iidx, np.int32),
            np.asarray(jidx, np.int32),
            np.asarray(dvec, float).reshape(len(iidx), self._dim_k),
            np.asarray(a_amp, complex),
            np.asarray(b_amp, complex),
            # h(k) diagonal gets A_ii - C_ii with C as defined; fold
            # the standard minus sign here: diag contribution = -Cdiag
            Cdiag,
        )


@partial(jax.jit, static_argnums=(0, 9, 10))
def _lswt_solve_jit(nsite, kpts, iidx, jidx, dvec, a_ri, b_ri, cdiag,
                    shift, want_vectors, mesh=None):
    """Batched LSWT: assemble h(k), Colpa-diagonalize.

    Returns (omega (B, nsite) ascending positive branch, X_ri) with X
    the para-unitary eigenvector matrix (columns are modes, ri-packed)
    when requested.
    """
    from .utils.xfer import unpack_cplx

    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        kpts = shard_grid_axis0(kpts, mesh)
    a_amp = unpack_cplx(a_ri)
    b_amp = unpack_cplx(b_ri)
    B = kpts.shape[0]
    ph = jnp.exp(
        2j * jnp.pi * jnp.einsum("kd,bd->kb", kpts, dvec, precision=_HP)
    )  # (B, nbond)
    hot = jnp.zeros((B, nsite, nsite), dtype=ph.dtype)
    A_k = hot.at[:, iidx, jidx].add(a_amp[None, :] * ph)
    B_k = hot.at[:, iidx, jidx].add(b_amp[None, :] * ph)
    A_mk = hot.at[:, iidx, jidx].add(a_amp[None, :] * jnp.conj(ph))
    cmat = jnp.diag(cdiag.astype(ph.dtype))[None]
    top = jnp.concatenate([A_k - cmat, B_k], axis=2)
    bot = jnp.concatenate(
        [jnp.swapaxes(jnp.conj(B_k), 1, 2), jnp.conj(A_mk) - cmat], axis=2
    )
    h = jnp.concatenate([top, bot], axis=1)  # (B, 2n, 2n)
    h = 0.5 * (h + jnp.swapaxes(jnp.conj(h), 1, 2))
    eye2n = jnp.eye(2 * nsite, dtype=h.dtype)
    h = h + shift * eye2n[None]
    # Colpa: K^H K = h (use lower chol of h -> K = L^H), then the
    # Hermitian K sigma3 K^H shares the para-unitary spectrum
    L = jnp.linalg.cholesky(h)  # lower, h = L L^H
    K = jnp.swapaxes(jnp.conj(L), 1, 2)  # upper, h = K^H K
    sg = jnp.concatenate(
        [jnp.ones(nsite, h.real.dtype), -jnp.ones(nsite, h.real.dtype)]
    )
    # precision=HIGHEST: the TPU default bf16 matmul pass turns this
    # 2n x 2n product (which feeds eigh) into ~1e-2 weight errors on
    # the kagome BdG (measured on chip; CPU f32 is 9e-6)
    T = jnp.einsum("bij,bkj->bik", K * sg[None, None, :], jnp.conj(K),
                   precision=_HP)
    lam, W = jnp.linalg.eigh(T)  # ascending: n negative, n positive
    omega = lam[:, nsite:]  # positive branch, ascending
    if not want_vectors:
        return omega, None
    # para-unitary eigenvectors: X = K^-1 W (sigma3 Lambda)^{1/2};
    # X^H sigma3 X = sigma3 and sigma3 h X = X sigma3 Lambda
    # para-unitary eigenvectors X = K^-1 W |Lambda|^{1/2} (Colpa);
    # K^-1 W solves L^H x = W (one batched triangular solve)
    e = jnp.abs(lam)
    Kinv_W = jax.lax.linalg.triangular_solve(
        L, W, left_side=True, lower=True, conjugate_a=True,
        transpose_a=True,
    )
    X = Kinv_W * jnp.sqrt(e)[:, None, :]
    return omega, pack_cplx(X)


def _solve(model, kpts, shift, want_vectors, mesh=None):
    iidx, jidx, dvec, a_amp, b_amp, cdiag = model._tables()
    # h(k) diagonal: A_ii(k) - C_ii with the sign convention folded in
    ftype = config.float_dtype()
    kpts = np.atleast_2d(np.asarray(kpts, dtype=float))
    if kpts.shape[1] != model._dim_k:
        raise PythtbError("magnon: kpts must have dim_k columns")
    from .utils.xfer import host_pack

    omega, X = _lswt_solve_jit(
        model._nsite,
        jnp.asarray(kpts, ftype),
        jnp.asarray(iidx),
        jnp.asarray(jidx),
        jnp.asarray(dvec, ftype),
        jnp.asarray(host_pack(a_amp), ftype),
        jnp.asarray(host_pack(b_amp), ftype),
        jnp.asarray(cdiag, ftype),
        jnp.asarray(float(shift), ftype),
        bool(want_vectors),
        mesh,
    )
    w = np.asarray(jax.device_get(omega), dtype=np.float64)
    if np.any(~np.isfinite(w)):
        raise PythtbError(
            "magnon: Colpa decomposition failed (dynamical matrix not "
            "positive definite) -- the moment configuration is not a "
            "classical minimum, or a Goldstone mode needs a larger "
            "shift"
        )
    if X is None:
        return w, None
    return w, host_unpack(X)


def bands(model, kpts, shift=1e-9):
    """Magnon energies on a k-list: (nk, nsite), ascending.

    ``shift`` regularizes Goldstone zeros (added to the dynamical
    matrix diagonal before the Cholesky factorization)."""
    w, _ = _solve(model, kpts, shift, False, pmesh.current_mesh())
    return w


def berry_curvature(model, nk, band, shift=1e-8):
    """Plaquette Berry fluxes of one magnon band on an nk x nk grid
    (2-D models): (nk, nk) array summing to 2 pi C.

    Links use the bosonic para-unitary metric:
    ``L = X_n(k)^H sigma3 X_n(k')`` -- for B(k) = 0 this reduces to
    the fermionic plaquette flux of the A(k) Bloch matrix (tested)."""
    if model._dim_k != 2:
        raise PythtbError("berry_curvature: dim_k == 2 required")
    n = model._nsite
    ks = np.arange(nk) / nk
    kx, ky = np.meshgrid(ks, ks, indexing="ij")
    kpts = np.stack([kx.reshape(-1), ky.reshape(-1)], axis=-1)
    _, X = _solve(model, kpts, shift, True, pmesh.current_mesh())
    # column of the positive branch for the requested band (ascending)
    Xn = X[:, :, n + band].reshape(nk, nk, 2 * n)
    sg = np.concatenate([np.ones(n), -np.ones(n)])
    def link(a, b):
        return np.einsum("xym,m,xym->xy", np.conj(a), sg, b)

    Xr = np.roll(Xn, -1, axis=0)
    Xu = np.roll(Xn, -1, axis=1)
    Xru = np.roll(Xr, -1, axis=1)
    l1 = link(Xn, Xr)
    l2 = link(Xr, Xru)
    l3 = link(Xru, Xu)
    l4 = link(Xu, Xn)
    prod = l1 * l2 * l3 * l4
    if np.min(np.abs(prod)) < 1e-8:
        warnings.warn(
            "magnon.berry_curvature: near-singular plaquette link "
            "(band crossing on the grid?)", stacklevel=2
        )
    # minus sign: match the package-wide flux orientation
    # (flows.chern_number / wf_array.berry_flux, which follow the
    # reference's convention) -- tested against the electronic Chern
    # of the equivalent tb_model in the B = 0 reduction
    return -np.angle(prod)


def chern(model, band, nk=31, shift=1e-8):
    """Chern number of one magnon band (positive branch, ascending)."""
    return float(
        np.round(np.sum(berry_curvature(model, nk, band, shift))
                 / (2 * np.pi))
    )


def _c2(x):
    """Matsumoto-Murakami c2 weight of the Bose function value x > 0:
    ``c2(x) = (1+x) ln^2((1+x)/x) - ln^2 x - 2 Li2(-x)``."""
    from scipy.special import spence

    x = np.asarray(x, dtype=np.float64)
    li2 = spence(1.0 + x)  # Li2(-x) = spence(1 - (-x))
    return (1.0 + x) * np.log((1.0 + x) / x) ** 2 - np.log(x) ** 2 \
        - 2.0 * li2


def thermal_hall(model, temperatures, nk=41, shift=1e-8):
    """Magnon thermal Hall conductivity kappa_xy(T) (2-D models),

    ``kappa_xy = -(k_B^2 T / hbar) sum_n int d^2k/(2 pi)^2
        [c2(g(omega_nk)) - pi^2/3] Omega_nk``

    in units of ``k_B^2 / hbar`` with energies in the model's units
    (k_B = 1).  The pi^2/3 offset makes every band's weight vanish as
    T -> 0 (Matsumoto-Murakami PRL 106, 197202 (2011) form); the BZ
    integral is the sum of plaquette fluxes over (2 pi)^2.
    """
    if model._dim_k != 2:
        raise PythtbError("thermal_hall: dim_k == 2 required")
    n = model._nsite
    ks = np.arange(nk) / nk
    kx, ky = np.meshgrid(ks, ks, indexing="ij")
    kpts = np.stack([kx.reshape(-1), ky.reshape(-1)], axis=-1)
    w, X = _solve(model, kpts, shift, True, pmesh.current_mesh())
    # per-band plaquette curvature from the same X
    sg = np.concatenate([np.ones(n), -np.ones(n)])
    temperatures = np.atleast_1d(np.asarray(temperatures, dtype=float))
    kap = np.zeros(len(temperatures))
    for bnd in range(n):
        Xn = X[:, :, n + bnd].reshape(nk, nk, 2 * n)
        Xr = np.roll(Xn, -1, axis=0)
        Xu = np.roll(Xn, -1, axis=1)
        Xru = np.roll(Xr, -1, axis=1)
        lk = (
            np.einsum("xym,m,xym->xy", np.conj(Xn), sg, Xr)
            * np.einsum("xym,m,xym->xy", np.conj(Xr), sg, Xru)
            * np.einsum("xym,m,xym->xy", np.conj(Xru), sg, Xu)
            * np.einsum("xym,m,xym->xy", np.conj(Xu), sg, Xn)
        )
        # package-orientation plaquette flux F = Omega_cart * dk^2
        flux = -np.angle(lk)
        wn = w[:, bnd].reshape(nk, nk)
        for ti, T in enumerate(temperatures):
            if T <= 0:
                continue
            # clip the exponent: overflow in expm1 just means g = 0
            g = 1.0 / np.expm1(np.minimum(np.maximum(wn, 1e-12) / T,
                                          500.0))
            wt = _c2(np.maximum(g, 1e-300)) - np.pi ** 2 / 3.0
            # kappa_xy = -T int d^2k/(2pi)^2 [c2 - pi^2/3] Omega
            #          = -T sum_plaq wt * F / (2 pi)^2
            kap[ti] += -T * np.sum(wt * flux) / (2.0 * np.pi) ** 2
    return kap if len(kap) > 1 else float(kap[0])


def structure_factor(model, qpts, omegas=None, eta=0.02,
                     temperature=0.0, shift=1e-9, polarization=True):
    """One-magnon dynamical spin structure factor ``S(q, omega)``.

    The inelastic-neutron-scattering observable of :class:`spin_model`
    at LSWT level (beyond-reference capability; the reference at
    ``/root/reference/pythtb.py`` has no spin models at all).  With
    ``S^a(q) = N^{-1/2} sum_{R,i} e^{+2 pi i q.(R+t_i)} S^a_{R,i}``
    (momentum +q transferred TO the sample), the transverse one-magnon
    part is

    ``S^{ab}(q, w) = sum_n conj(F^a_n(q)) F^b_n(q) delta(w - w_n(q))``

    where ``F^a_n(q) = sum_i sqrt(S_i/2) [conj(u_i^a) conj(X(q)_{N+i, N+n})
    + u_i^a conj(X(q)_{i, N+n})]`` follows from the bosonic
    particle-hole symmetry ``h(-q) = sigma1 conj(h(q)) sigma1``: the
    creation columns of ``X(-q)`` are the sigma1-conjugated positive
    branch of ``X(q)``, so the weights come from the SAME batched Colpa
    program that :func:`bands` runs (per-mode phases cancel in
    ``conj(F) F``).  The longitudinal ``v_i (S - n)`` part (elastic
    Bragg + two-magnon continuum) is NOT included.

    Conventions are pinned by the exact one-flip oracle in
    ``tests/test_magnon.py``: for a ferromagnet the polarized state is
    an exact eigenstate, so ``|<n| S^a(q) |0>|^2`` from the full
    Pauli-kron Hamiltonian must match exactly -- including a DM chain
    with ``w(q) != w(-q)`` (pins the momentum label) and a two-site
    basis (pins the ``t_i`` phases).

    :param model: :class:`spin_model`
    :param qpts: (nq, dim_k) reduced momentum transfers
    :param omegas: optional (nw,) energy-transfer grid; when given the
        return value is the broadened intensity map
    :param eta: Lorentzian HWHM for the broadened map
    :param temperature: when > 0, the map includes the detailed-balance
        Bose factors: ``(1 + g(w_n(q)))`` on the loss side and the
        anti-Stokes gain peak at ``-w_n(-q)`` with weight ``g``
    :param shift: Goldstone regularization (see :func:`bands`)
    :param polarization: apply the unpolarized-neutron projector
        ``sum_ab (delta_ab - qhat_a qhat_b) S^{ab}`` (Cartesian qhat
        from the reciprocal lattice; at q = 0 the isotropic average
        ``(2/3) tr S`` is used).  ``False`` sums the trace.
    :returns: ``(w, Sab)`` when ``omegas`` is None -- magnon energies
        (nq, nsite) and complex mode weights (nq, nsite, 3, 3) -- else
        the real intensity map (nq, nw).
    """
    qpts = np.atleast_2d(np.asarray(qpts, dtype=float))
    if qpts.shape[1] != model._dim_k:
        raise PythtbError("structure_factor: qpts must have dim_k "
                          "columns")
    nq = qpts.shape[0]
    want_gain = omegas is not None and temperature > 0
    qs = np.concatenate([qpts, -qpts], axis=0) if want_gain else qpts
    w, X = _solve(model, qs, shift, True, pmesh.current_mesh())
    n = model._nsite
    u, _ = model._frames()
    pref = np.sqrt(model._S / 2.0)  # (nsite,)
    # creation amplitudes from the positive branch of X(q):
    # F^a_n = sum_i pref_i [u_i^a conj(X_{N+i,N+n}) + conj(u_i^a) conj(X_{i,N+n})]
    Xp = np.conj(X[:, :, n:])  # (nQ, 2n, n) conj positive columns
    F = np.einsum("i,ia,qin->qna", pref, np.conj(u), Xp[:, n:, :]) \
        + np.einsum("i,ia,qin->qna", pref, u, Xp[:, :n, :])
    Sab = np.einsum("qna,qnb->qnab", np.conj(F), F)  # (nQ, n, 3, 3)
    if omegas is None:
        return w, Sab

    def _project(Sab_q, qred):
        if not polarization:
            return np.real(np.einsum("naa->n", Sab_q))
        qc = qred @ np.linalg.inv(model._lat).T[: model._dim_k]
        qn = np.linalg.norm(qc)
        if qn < 1e-12:
            return (2.0 / 3.0) * np.real(np.einsum("naa->n", Sab_q))
        qh = np.zeros(3)
        qh[: len(qc)] = qc / qn
        proj = np.eye(3) - np.outer(qh, qh)
        return np.real(np.einsum("nab,ab->n", Sab_q, proj))

    omegas = np.asarray(omegas, dtype=float)
    out = np.zeros((nq, len(omegas)))
    for qi in range(nq):
        wt = _project(Sab[qi], qpts[qi])  # (n,)
        wn = w[qi]
        if temperature > 0:
            g = 1.0 / np.expm1(
                np.minimum(np.maximum(wn, 1e-12) / temperature, 500.0))
            wt = wt * (1.0 + g)
        lor = (eta / np.pi) / ((omegas[None, :] - wn[:, None]) ** 2
                               + eta ** 2)
        out[qi] = wt @ lor
        if want_gain:
            wtg = _project(Sab[nq + qi], -qpts[qi])
            wng = w[nq + qi]
            gg = 1.0 / np.expm1(
                np.minimum(np.maximum(wng, 1e-12) / temperature, 500.0))
            lorg = (eta / np.pi) / ((omegas[None, :] + wng[:, None]) ** 2
                                    + eta ** 2)
            out[qi] += (wtg * gg) @ lorg
    return out
