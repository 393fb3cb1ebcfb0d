"""Real-space topology and transport for large (disordered) samples.

The reference framework is strictly k-space: every topological
diagnostic it offers (berry_phase, berry_flux, and the library built on
them) requires translation invariance, and its finite-sample story ends
at dense diagonalization of flakes (pythtb.py:955-1079 with dim_k=0).
Disordered samples -- the setting where topological protection actually
gets tested -- have no tools at all.  This module supplies them,
TPU-first:

* :func:`torus_sample` -- tile a fully periodic model onto an
  ``L1 x ... x Ld`` torus as a matrix-free ELL hop table
  (:class:`pythtb_tpu.ops.matvec.SparseH`), with *exact per-hop
  displacement vectors* (``r_j + R.lat - r_i``), so the velocity
  operators ``v_a = -i [X_a, H]`` are exact on the torus (a naive
  position-difference commutator is wrong for hops that wrap the
  boundary).  Optional Anderson on-site disorder.
* :func:`kpm_conductivity` -- Kubo-Bastin conductivity tensor by the
  kernel polynomial method (Garcia, Covaci, Rappoport, PRL 114, 116602
  (2015)): stochastic Chebyshev moments ``mu_nm = Tr[v_a T_n(H) v_b
  T_m(H)]`` as ONE ``lax.scan`` device program per random vector (the
  row products are (M,N)x(N) matmuls -- MXU work, not scalar loops),
  with the energy post-processing on host in float64.  sigma_xy of a
  disordered Chern insulator and sigma_xx of an Anderson model at
  10^5+ sites become a few seconds of TPU time.
* :func:`chern_marker` -- the Bianco-Resta local Chern marker
  ``c(r) = -(4 pi / A_c) Im <r| P X Q Y P |r>`` for finite flakes
  (open boundaries): everything after the dense eigensolve is three
  occupied-basis matmuls.
* :func:`bott_index` -- the Loring-Hastings Bott index on a disordered
  torus (the finite-size proxy for the Chern number that needs no
  translation invariance).
* :func:`sector_marker` / :func:`spin_chern_marker` -- the Prodan
  sector construction (PRB 80, 125327 (2009)) fused with the
  Bianco-Resta marker: split the occupied space by the sign of a
  projected grading ``P O P`` (spin Sz, a mirror, ...) and compute
  each sector's local Chern marker.  This is the real-space QSH / Z2
  diagnostic: it works on disordered flakes and quasicrystals where
  no Brillouin zone (and hence no k-space ``flows.spin_chern``)
  exists, and its bulk average matches ``flows.spin_chern`` sector
  for sector on clean samples (committed oracle).

Conventions: ``hbar = e = 1`` internally; 2-D conductivities are
returned in units of e^2/h.  Complex data crosses the host<->device
boundary ri-packed (utils/xfer.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .ops.matvec import SparseH, matvec, _ell_tables
from .utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx

__all__ = [
    "TorusSample",
    "torus_sample",
    "kpm_conductivity",
    "kpm_ldos",
    "chern_marker",
    "bott_index",
    "sector_marker",
    "spin_chern_marker",
]


# --------------------------------------------------------------------
# torus sample construction
# --------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TorusSample:
    """A periodic model tiled onto a finite torus (host container).

    ``h`` is the matrix-free Hamiltonian; ``velocity[a]`` the Cartesian
    velocity operator ``-i [X_a, H]`` built from exact per-hop
    displacements (correct across the periodic wrap); ``theta`` the
    reduced orbital positions in supercell units (in [0, 1), for the
    Bott-index loop phases); ``pos`` Cartesian orbital positions;
    ``volume`` the torus area/volume (|det lat| * ncells).
    """

    h: SparseH
    velocity: tuple
    theta: np.ndarray
    pos: np.ndarray
    volume: float
    supercell: tuple

    @property
    def norb(self):
        return self.h.norb

    @property
    def nspin(self):
        return self.h.nspin

    @property
    def nsta(self):
        return self.h.nsta


def _window_from_tables(tcols, tvals, norb, nspin):
    """Gershgorin spectral bounds from ELL tables (host)."""
    diag_idx = np.arange(norb, dtype=tcols.dtype)
    isdiag = tcols == diag_idx[:, None]
    if nspin == 1:
        center = np.real(np.sum(np.where(isdiag, tvals, 0.0), axis=1))
        radius = np.sum(np.where(~isdiag, np.abs(tvals), 0.0), axis=1)
    else:
        dblk = np.sum(np.where(isdiag[..., None, None], tvals, 0.0), axis=1)
        ev = np.linalg.eigvalsh(dblk)
        center = ev.mean(axis=-1)
        radius = (ev[:, 1] - ev[:, 0]) / 2.0
        bnorm = np.linalg.norm(tvals, ord=2, axis=(-2, -1))
        radius = radius + np.sum(np.where(~isdiag, bnorm, 0.0), axis=1)
    return (float((center - radius).min()), float((center + radius).max()))


def _sparse_from_coo(rows, cols, vals, norb, nspin):
    tcols, tvals = _ell_tables(rows, cols, vals, norb)
    window = _window_from_tables(tcols, tvals, norb, nspin)
    return SparseH(
        cols=jnp.asarray(tcols),
        vals=jnp.asarray(host_pack(tvals)),
        norb=norb,
        nspin=nspin,
        window=window,
    )


def torus_sample(model, supercell, onsite_disorder=0.0, seed=0):
    """Tile a fully periodic model onto a finite torus.

    The reference can only emulate this by ``cut_piece(..,
    glue_edgs=True)`` per direction (pythtb.py:1105-1231), which loses
    the hop displacement vectors -- so no velocity operator can be
    reconstructed from it.  Here each hop ``(amp, i, j, R)`` of the
    periodic model maps, for every cell ``c`` of the ``L1 x ... x Ld``
    torus, to a matrix element between site ``(c, i)`` and site
    ``((c + R) mod L, j)`` carrying the *exact* Cartesian displacement
    ``d = (orb_j + R - orb_i) . lat`` -- the wrap changes the site
    index, never the displacement.

    :param model: a ``tb_model`` with ``dim_k == dim_r`` (fully
      periodic)
    :param supercell: ints ``(L1, ..., Ld)``, cells per direction
    :param onsite_disorder: Anderson disorder: a float ``W`` draws
      uniform on-site energies in ``[-W/2, W/2]`` per site (added to
      both spin components when nspin=2), or an explicit per-site array
      of length ``norb * ncells``
    :param seed: RNG seed for the disorder draw
    :returns: :class:`TorusSample`
    """
    if model._dim_k != model._dim_r or model._dim_k < 1:
        raise PythtbError(
            "torus_sample requires a fully periodic model "
            "(dim_k == dim_r >= 1)"
        )
    dim = model._dim_r
    L = tuple(int(x) for x in np.atleast_1d(supercell))
    if len(L) != dim or any(x < 1 for x in L):
        raise PythtbError(
            "supercell must give a positive cell count per periodic "
            "direction (got %r for dim %d)" % (supercell, dim)
        )
    norb = model._norb
    nspin = model._nspin
    lat = np.asarray(model._lat, dtype=np.float64)
    orb = np.asarray(model._orb, dtype=np.float64)
    ncells = int(np.prod(L))
    nsites = norb * ncells

    # cell grid, cell-major site index: site = cell_idx * norb + orbital
    cells = np.indices(L).reshape(dim, ncells).T  # (ncells, dim)
    cell_idx = np.arange(ncells)

    nhop = len(model._hoppings)
    if nhop:
        amps = np.array(
            [np.asarray(h[0], dtype=np.complex128) for h in model._hoppings]
        )  # (nhop,) or (nhop, 2, 2)
        ii = np.array([h[1] for h in model._hoppings], dtype=np.int64)
        jj = np.array([h[2] for h in model._hoppings], dtype=np.int64)
        RR = np.array([h[3] for h in model._hoppings], dtype=np.int64).reshape(
            nhop, dim
        )
        # target cell of each (hop, cell) pair, with periodic wrap
        tcell = np.mod(cells[None, :, :] + RR[:, None, :], np.array(L))
        tidx = np.ravel_multi_index(
            tuple(tcell[..., d] for d in range(dim)), L
        )  # (nhop, ncells)
        rows_f = (cell_idx[None, :] * norb + ii[:, None]).ravel()
        cols_f = (tidx * norb + jj[:, None]).ravel()
        amps_f = np.repeat(amps, ncells, axis=0)
        # exact Cartesian displacement per hop (same for every cell)
        disp = (orb[jj] + RR - orb[ii]) @ lat  # (nhop, dim)
        disp_f = np.repeat(disp, ncells, axis=0)
    else:
        rows_f = np.zeros(0, dtype=np.int64)
        cols_f = np.zeros(0, dtype=np.int64)
        amps_f = np.zeros((0,) if nspin == 1 else (0, 2, 2), np.complex128)
        disp_f = np.zeros((0, dim))

    # on-site energies tiled over cells + Anderson disorder
    ons = np.asarray(model._site_energies, dtype=np.complex128)
    ons_f = np.tile(ons, (ncells,) + (1,) * (ons.ndim - 1))
    if np.ndim(onsite_disorder) == 0:
        W = float(onsite_disorder)
        if W != 0.0:
            delta = np.random.default_rng(seed).uniform(-W / 2, W / 2, nsites)
        else:
            delta = None
    else:
        delta = np.asarray(onsite_disorder, dtype=np.float64)
        if delta.shape != (nsites,):
            raise PythtbError(
                "per-site disorder array must have length norb * ncells "
                "= %d (got shape %r)" % (nsites, delta.shape)
            )
    if delta is not None:
        if nspin == 1:
            ons_f = ons_f + delta
        else:
            ons_f = ons_f + delta[:, None, None] * np.eye(2)

    diag_idx = np.arange(nsites, dtype=np.int64)
    if nspin == 2:
        conj_amps = np.conj(np.swapaxes(amps_f, -1, -2))
    else:
        conj_amps = np.conj(amps_f)
    rows = np.concatenate([rows_f, cols_f, diag_idx])
    cols = np.concatenate([cols_f, rows_f, diag_idx])
    hvals = np.concatenate([amps_f, conj_amps, ons_f], axis=0)
    h = _sparse_from_coo(rows, cols, hvals, nsites, nspin)

    # velocity operators v_a = -i [X_a, H]: matrix element -i d_a H_ij
    # (Hermitian partner is the elementwise conjugate; diagonal drops)
    vel = []
    rows_v = np.concatenate([rows_f, cols_f])
    cols_v = np.concatenate([cols_f, rows_f])
    for a in range(dim):
        if nspin == 1:
            fwd = -1j * disp_f[:, a] * amps_f
        else:
            fwd = -1j * disp_f[:, a, None, None] * amps_f
        vvals = np.concatenate([fwd, np.conj(fwd)], axis=0)
        vel.append(_sparse_from_coo(rows_v, cols_v, vvals, nsites, nspin))

    theta = ((cells[:, None, :] + orb[None, :, :]) / np.array(L)).reshape(
        nsites, dim
    ) % 1.0
    pos = ((cells[:, None, :] + orb[None, :, :]) @ lat).reshape(nsites, dim)
    volume = float(abs(np.linalg.det(lat))) * ncells
    return TorusSample(
        h=h,
        velocity=tuple(vel),
        theta=theta,
        pos=pos,
        volume=volume,
        supercell=L,
    )


# --------------------------------------------------------------------
# KPM Kubo-Bastin conductivity
# --------------------------------------------------------------------


@partial(jax.jit, static_argnums=(4, 5))
def _kubo_moments_jit(h, va, vb, ab, M, R, key):
    """Stochastic Kubo-Bastin moment matrix.

    Returns the ri-packed (M, M) matrix ``C[n, m] = E<x| T_n(Ht) v_a
    T_m(Ht) v_b |x>`` averaged over R random-phase vectors (an unbiased
    estimate of ``Tr[T_n(Ht) v_a T_m(Ht) v_b]``).  One compiled
    program: the right Chebyshev block Phi (M, N) is built by a
    ``lax.scan`` recursion, then the left recursion emits one moment
    ROW per step as a (M, N) @ (N,) product -- dense MXU work.  Random
    vectors run under ``lax.map`` (sequential) to bound peak memory at
    Phi + a few vectors regardless of R.
    """
    N = h.nsta
    shape = (h.norb, 2, 1) if h.nspin == 2 else (h.norb, 1)

    def apply(op, v):
        return matvec(op, v.reshape(shape)).reshape(N)

    def scaled(v):  # (H - b) / a
        return (apply(h, v) - ab[1] * v) / ab[0]

    def one(key):
        th = jax.random.uniform(key, (N,), minval=0.0, maxval=2.0 * np.pi)
        x0 = jnp.exp(1j * th)

        r0 = apply(vb, x0)
        r1 = scaled(r0)

        def rstep(carry, _):
            tm, tc = carry
            tn = 2.0 * scaled(tc) - tm
            return (tc, tn), tn

        _, rest = jax.lax.scan(rstep, (r0, r1), None, length=M - 2)
        Phi = jnp.concatenate([r0[None], r1[None], rest], axis=0)  # (M, N)

        def row(psi):  # <psi| v_a |phi_m> for all m
            w = apply(va, psi)
            return Phi @ jnp.conj(w)

        p0 = x0
        p1 = scaled(x0)

        def lstep(carry, _):
            pm, pc = carry
            pn = 2.0 * scaled(pc) - pm
            return (pc, pn), row(pn)

        _, lrows = jax.lax.scan(lstep, (p0, p1), None, length=M - 2)
        return jnp.concatenate([row(p0)[None], row(p1)[None], lrows], axis=0)

    mu = jax.lax.map(one, jax.random.split(key, R))  # (R, M, M)
    return pack_cplx(jnp.mean(mu, axis=0))


def _jackson(M):
    m = np.arange(M)
    Mp = M + 1.0
    return (
        (Mp - m) * np.cos(np.pi * m / Mp)
        + np.sin(np.pi * m / Mp) / np.tan(np.pi / Mp)
    ) / Mp


def _fermi(e, mu, kt):
    if kt <= 0.0:
        return (e <= mu).astype(np.float64)
    x = np.clip((e - mu) / kt, -700, 700)
    return 1.0 / (np.exp(x) + 1.0)


def kpm_conductivity(
    sample,
    dirs=(0, 1),
    fermi_levels=None,
    num_moments=256,
    num_vectors=8,
    temperature=0.0,
    seed=0,
    n_energies=2048,
):
    """Kubo-Bastin conductivity ``sigma_{ab}(mu)`` by KPM.

    Implements the kernel-polynomial Kubo-Bastin formula of Garcia,
    Covaci & Rappoport (PRL 114, 116602 (2015)): with the Hamiltonian
    rescaled to ``Ht = (H - b)/a`` and Jackson-damped moment matrix
    ``mu_nm = g_n g_m / ((1+d_n0)(1+d_m0)) Tr[v_a T_n(Ht) v_b T_m(Ht)]``,

    ``sigma_ab(mu, T) = (8 / (Omega a^2)) int de f(e; mu, T)
    Re[Gamma(e)] / (1 - e^2)^2``   [units of e^2/h]

    where ``Gamma(e) = sum_nm Gamma_nm(e) mu_nm`` with

    ``Gamma_nm(e) = (e - i n sqrt(1-e^2)) e^{i n acos e} T_m(e)
    + (e + i m sqrt(1-e^2)) e^{-i m acos e} T_n(e)``.

    The contraction factorizes (``Gamma_nm = A_n T_m + conj(A_m) T_n``),
    so the energy post-processing is two (nE, M) x (M, M) zgemms on
    host in float64; the moment matrix itself is one device program
    (:func:`_kubo_moments_jit`).  At T=0 the Fermi integral is a single
    cumulative trapezoid, so the entire ``sigma(mu)`` staircase for any
    number of Fermi levels costs ONE moment computation.

    :param sample: :class:`TorusSample`
    :param dirs: Cartesian direction pair (a, b): (0, 0) for sigma_xx,
      (0, 1) for sigma_xy
    :param fermi_levels: chemical potentials (default: 201 points
      across the spectral window)
    :param num_moments: Chebyshev order M (energy resolution ~
      bandwidth * pi / M with the Jackson kernel)
    :param num_vectors: random-phase vectors for the stochastic trace
    :param temperature: k_B T in model energy units (0 = ground state)
    :param n_energies: internal energy-integration grid size
    :returns: ``(fermi_levels, sigma)`` -- sigma in units of e^2/h for
      2-D samples (e^2/(h * length) in 3-D, with length in lattice
      units)
    """
    h = sample.h
    lo, hi = h.window
    a = 0.5 * (hi - lo) / 0.98 + 1e-12
    b = 0.5 * (hi + lo)
    M = int(num_moments)
    R = int(num_vectors)
    va = sample.velocity[int(dirs[0])]
    vb = sample.velocity[int(dirs[1])]

    C = host_unpack(
        np.asarray(
            jax.device_get(
                _kubo_moments_jit(
                    h, va, vb, jnp.array([a, b]), M, R, jax.random.PRNGKey(seed)
                )
            )
        )
    ).astype(np.complex128)
    # C[n, m] = Tr[T_n v_a T_m v_b]; this IS the mu_nm the Gamma_nm
    # post-processing below expects -- calibrated so that sigma_xy of
    # the Haldane model matches the k-space TKNN value C e^2/h from
    # flows.anomalous_hall (sign AND magnitude; transposing mu flips
    # the Hall sign, tests/test_realspace.py pins it)
    mu = C.copy()
    if dirs[0] == dirs[1]:
        # exact symmetry mu_nm = conj(mu_mn) for a == b: enforcing it
        # halves the stochastic noise
        mu = 0.5 * (mu + np.conj(mu.T))

    g = _jackson(M)
    w = np.ones(M)
    w[0] = 0.5
    mu = mu * np.outer(g * w, g * w)

    # host energy grid, open interval (spectrum lives inside +-0.98)
    ne = int(n_energies)
    et = np.linspace(-0.99, 0.99, ne)
    acos = np.arccos(et)
    s = np.sqrt(1.0 - et * et)
    narr = np.arange(M)
    E = np.exp(1j * np.outer(acos, narr))  # (nE, M)
    A = (et[:, None] - 1j * np.outer(s, narr)) * E
    T = np.cos(np.outer(acos, narr))
    gam = np.sum(T * (A @ mu.T), axis=1) + np.sum(T * (np.conj(A) @ mu), axis=1)
    integrand = np.real(gam) / (1.0 - et * et) ** 2
    pref = 8.0 / (sample.volume * a * a)

    if fermi_levels is None:
        fermi_levels = np.linspace(lo, hi, 201)
    fermi_levels = np.asarray(fermi_levels, dtype=np.float64)
    mut = (fermi_levels - b) / a

    de = et[1] - et[0]
    if temperature <= 0.0:
        cum = np.concatenate(
            [[0.0], np.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * de)]
        )
        sig = pref * np.interp(mut, et, cum)
    else:
        kt = float(temperature) / a  # rescaled temperature
        f = _fermi(et[None, :], mut[:, None], kt)  # (nmu, nE)
        wtrap = np.full(ne, de)
        wtrap[0] = wtrap[-1] = de / 2
        sig = pref * (f * (integrand * wtrap)[None, :]).sum(axis=1)
    return fermi_levels, sig


# --------------------------------------------------------------------
# local density of states by KPM (deterministic, per-site)
# --------------------------------------------------------------------


@partial(jax.jit, static_argnums=(3,))
def _ldos_moments_jit(h, ab, states, M):
    """Deterministic Chebyshev LDOS moments ``mu_m(i) = <e_i| T_m(Ht)
    |e_i>`` for a block of unit vectors at the given flat state
    indices -- the same doubling recursion as flows._kpm_moments_jit
    (two moments per matvec) but with one-hot columns and NO trace
    averaging: the per-state moments are exact, not stochastic.
    Returns (M, B) float."""
    from .ops.matvec import matvec

    N = h.nsta
    B = states.shape[0]
    ctype = config.complex_dtype()
    x0 = jnp.zeros((N, B), dtype=ctype).at[
        states, jnp.arange(B)
    ].set(1.0)
    shape = (h.norb, 2, B) if h.nspin == 2 else (h.norb, B)

    def hmv(v):
        return (matvec(h, v.reshape(shape)).reshape(N, B)
                - ab[1] * v) / ab[0]

    t0 = x0
    t1 = hmv(x0)
    mu0 = jnp.ones((B,), config.float_dtype())  # <e|T_0|e> = 1
    mu1 = jnp.sum(jnp.real(jnp.conj(x0) * t1), axis=0)

    def step(carry, _):
        tm, tc = carry
        tn = 2.0 * hmv(tc) - tm
        even = 2.0 * jnp.sum(jnp.real(jnp.conj(tc) * tc), axis=0) - mu0
        odd = 2.0 * jnp.sum(jnp.real(jnp.conj(tn) * tc), axis=0) - mu1
        return (tc, tn), (even, odd)

    _, (ev, od) = jax.lax.scan(step, (t0, t1), None, length=M // 2)
    mu = jnp.zeros((M, B))
    mu = mu.at[0].set(mu0).at[1].set(mu1)
    mu = mu.at[2::2].set(ev[: (M - 2 + 1) // 2])
    mu = mu.at[3::2].set(od[: (M - 2) // 2])
    return mu


def kpm_ldos(sample, sites, energies=None, num_moments=512,
             n_energies=401):
    """Site-resolved local density of states by the kernel polynomial
    method -- deterministic (unit-vector moments, no stochastic trace),
    one compiled device program for the whole site block.

    ``rho_i(E) = sum_n |<i|psi_n>|^2 delta(E - E_n)`` Jackson-smeared
    to resolution ~ bandwidth * pi / num_moments.  The workhorse for
    impurity/edge/defect physics at sizes where diagonalization is
    impossible: cost is one Chebyshev recursion on an (nsta, nsites)
    block -- O(nhop * num_moments * nsites) -- independent of the
    total DOS.

    For a spinful sample each requested site's two spin states are
    expanded internally and summed, so ``sum(rho_i) dE = nspin`` per
    site.

    :param sample: :class:`TorusSample` (from :func:`torus_sample`) or
      a finite (dim_k == 0) :class:`pythtb_tpu.tb_model`
    :param sites: orbital indices to resolve (iterable of int)
    :param energies: energy grid (default: Gershgorin window,
      ``n_energies`` points)
    :param num_moments: Chebyshev order
    :returns: ``(energies, ldos)`` with ``ldos`` shaped (nsites, nE)
    """
    from .ops.matvec import gershgorin_window, sparse_h

    if isinstance(sample, TorusSample):
        h = sample.h
    else:
        h = sparse_h(sample)
    sites = np.asarray(sites, dtype=np.int64).reshape(-1)
    if sites.size == 0:
        raise PythtbError("kpm_ldos needs at least one site")
    if sites.min() < 0 or sites.max() >= h.norb:
        raise PythtbError("site indices out of range for %d orbitals"
                          % h.norb)
    if h.nspin == 2:  # states are spin-fastest: orbital i -> (2i, 2i+1)
        states = np.stack([2 * sites, 2 * sites + 1], axis=1).reshape(-1)
    else:
        states = sites
    lo, hi = gershgorin_window(h)
    a = 0.5 * (hi - lo) / 0.98 + 1e-12
    b = 0.5 * (hi + lo)
    M = int(num_moments)
    mu = np.asarray(jax.device_get(_ldos_moments_jit(
        h, jnp.asarray([a, b], config.float_dtype()),
        jnp.asarray(states), M,
    )), dtype=np.float64)  # (M, nstates)
    if h.nspin == 2:
        mu = mu.reshape(M, -1, 2).sum(axis=2)

    m_arr = np.arange(M)
    Mp = M + 1.0
    g = ((Mp - m_arr) * np.cos(np.pi * m_arr / Mp)
         + np.sin(np.pi * m_arr / Mp) / np.tan(np.pi / Mp)) / Mp
    if energies is None:
        energies = np.linspace(lo, hi, int(n_energies))
    energies = np.asarray(energies, dtype=np.float64)
    et_raw = (energies - b) / a
    inside = np.abs(et_raw) < 1.0 - 1e-12  # outside the window LDOS = 0
    et = np.clip(et_raw, -1.0 + 1e-12, 1.0 - 1e-12)
    tm = np.cos(m_arr[None, :] * np.arccos(et)[:, None])  # (nE, M)
    wgt = np.full(M, 2.0)
    wgt[0] = 1.0
    ldos = (tm * (wgt * g)[None, :]) @ mu  # (nE, nsites)
    ldos = ldos.T / (np.pi * np.sqrt(1.0 - et**2))[None, :] / a
    return energies, np.where(inside[None, :], ldos, 0.0)


# --------------------------------------------------------------------
# local Chern marker (Bianco-Resta)
# --------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 2))
def _marker_jit(static, data, nocc, X, Y):
    """Dense eigensolve + occupied-basis marker contraction, one
    program.  Everything past the eigh is three (nocc, S) matmuls:
    with W the occupied eigenvector rows,

    ``diag_s = sum_nm W[n,s] K[n,m] conj(W[m,s])``,
    ``K = <n|XY|m> - <n|X|p><p|Y|m>``  (= psi^H X Q Y psi).
    """
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble

    H = assemble(static, data, jnp.zeros((1, 0), config.float_dtype()))
    evals, vecs = eigh_batched(H)
    W = vecs[0, :nocc, :]  # (nocc, S), rows = states
    return _marker_core(W, X, Y), evals[0]


def _marker_core(W, X, Y):
    """Occupied-basis Bianco-Resta contraction (W rows = states)."""
    hp = jax.lax.Precision.HIGHEST
    cW = jnp.conj(W)
    A = jnp.einsum("ns,s,ps->np", cW, X, W, precision=hp)
    B = jnp.einsum("ps,s,ms->pm", cW, Y, W, precision=hp)
    Cm = jnp.einsum("ns,s,ms->nm", cW, X * Y, W, precision=hp)
    K = Cm - jnp.einsum("np,pm->nm", A, B, precision=hp)
    diag = jnp.einsum("ns,nm,ms->s", W, K, cW, precision=hp)
    return jnp.imag(diag)


@jax.jit
def _marker_W_jit(W_ri, X, Y):
    """Marker contraction from host-supplied occupied states (the
    ``eigensolver="host"`` path)."""
    return _marker_core(unpack_cplx(W_ri), X, Y)


def _use_host_eigh(eigensolver, caller):
    """Resolve the marker ``eigensolver`` knob ("auto"/"host"/
    "device")."""
    if eigensolver not in ("auto", "host", "device"):
        raise PythtbError(
            '%s: eigensolver must be "auto", "host" or "device"'
            % caller)
    if eigensolver == "auto":
        return np.dtype(config.float_dtype()) == np.float32
    return eigensolver == "host"


def _host_eigh_ell(h):
    """Host float64 eigensolve of an ELL-table sample (same densify
    semantics as ``_dense_eigh_jit`` / ``_dense_eigh_spin_jit``)."""
    cols = np.asarray(h.cols)
    vals = host_unpack(np.asarray(h.vals, dtype=np.float64))
    norb = cols.shape[0]
    rows = np.repeat(np.arange(norb), cols.shape[1])
    if h.nspin == 1:
        dense = np.zeros((norb, norb), dtype=complex)
        np.add.at(dense, (rows, cols.ravel()), vals.reshape(-1))
    else:
        blk = np.zeros((norb, norb, 2, 2), dtype=complex)
        np.add.at(blk, (rows, cols.ravel()), vals.reshape(-1, 2, 2))
        dense = blk.transpose(0, 2, 1, 3).reshape(2 * norb, 2 * norb)
    evals, vecs = np.linalg.eigh(dense)
    return evals, vecs.T  # rows = states


def _host_occ_states(model, nocc):
    """Host float64 dense eigensolve; returns (evals, W) with W rows =
    states in the package's orb-major (spin-fastest) flattening.

    Exists because the axon TPU's f32 eigh is unreliable on dense
    clustered spectra: on a 354-state Penrose + flux model the on-chip
    eigenvalues deviated up to 0.181 (3% of ||H||) from x64 while the
    ASSEMBLY was exact to 4e-8 (measured 2026-08-20; CPU f32 agreed
    with x64 to print precision).  Quasicrystals and strongly
    disordered samples are exactly the dense-spectrum cases real-space
    markers exist for, so marker wrappers default to this path on f32
    backends (``eigensolver="auto"``).
    """
    from .ed import dense_h

    H = dense_h(model)
    evals, vecs = np.linalg.eigh(H)
    return evals, vecs.T[:nocc]  # rows = states


def chern_marker(model, nocc=None, fermi=None, eigensolver="auto"):
    """Bianco-Resta local Chern marker of a finite 2-D flake.

    ``c(r) = -(4 pi / A_c) Im <r| P X Q Y P |r>`` summed over the
    orbitals (and spins) at site r (Bianco & Resta, PRB 84, 241106
    (2011)).  In the bulk of a topological flake the marker plateaus at
    the Chern number; its sum over the *whole* sample is exactly zero
    (the trace identity ``Im tr P X Q Y P = 0``), which edge
    contributions enforce.  This is the real-space diagnostic the
    k-space ``chern_number`` cannot provide: it works per-site, with
    disorder, vacancies, or any termination.

    :param model: finite model (``dim_k == 0``) with 2-D positions
      (``dim_r == 2``)
    :param nocc: number of occupied states (preferred: one device
      program)
    :param fermi: Fermi energy -- used to count nocc (costs an extra
      eigensolve; give nocc directly when known)
    :param eigensolver: ``"device"`` (eigh + contraction in one
      program), ``"host"`` (float64 host eigh feeding the device
      contraction), or ``"auto"`` (default) -- host on f32 backends,
      device on x64.  See :func:`_host_occ_states` for the measured
      TPU f32 eigh failure on dense clustered spectra that makes
      "host" the safe f32 default.
    :returns: ``(norb,)`` marker per orbital site
    """
    if model._dim_k != 0:
        raise PythtbError("chern_marker requires a finite model (dim_k == 0)")
    if model._dim_r != 2:
        raise PythtbError("chern_marker requires 2-D positions (dim_r == 2)")
    if (nocc is None) == (fermi is None):
        raise PythtbError("give exactly one of nocc / fermi")
    if fermi is None:
        nocc = int(nocc)
        if not (0 < nocc < model._norb * model._nspin):
            raise PythtbError("nocc must be in 1..nsta-1")
    else:
        evals = model.solve_all()
        nocc = int(np.count_nonzero(evals < fermi))
        if nocc == 0 or nocc == evals.size:
            raise PythtbError(
                "fermi = %g leaves no occupied/empty states" % fermi
            )
    lat = np.asarray(model._lat, dtype=np.float64)
    pos = np.asarray(model._orb, dtype=np.float64) @ lat  # (norb, 2)
    if model._nspin == 2:
        pos = np.repeat(pos, 2, axis=0)
    ftype = config.float_dtype()
    Xj = jnp.asarray(pos[:, 0], ftype)
    Yj = jnp.asarray(pos[:, 1], ftype)
    if _use_host_eigh(eigensolver, "chern_marker"):
        _, W = _host_occ_states(model, nocc)
        imdiag = _marker_W_jit(jnp.asarray(host_pack(W), ftype), Xj, Yj)
    else:
        static, data = model._get_finalized()
        imdiag, _ = _marker_jit(static, data, nocc, Xj, Yj)
    imdiag = np.asarray(jax.device_get(imdiag), dtype=np.float64)
    cell_area = abs(np.linalg.det(lat))
    c = -4.0 * np.pi / cell_area * imdiag
    if model._nspin == 2:
        c = c.reshape(-1, 2).sum(axis=1)
    return c


# --------------------------------------------------------------------
# Bott index
# --------------------------------------------------------------------


@jax.jit
def _dense_eigh_jit(cols, vals_ri):
    """Dense eigensolve of an ELL table (spinless layout baked by the
    caller): returns (evals, ri-packed eigenvector rows)."""
    from .ops.eigh import eigh_batched

    vals = unpack_cplx(vals_ri)
    norb = cols.shape[0]
    dense = jnp.zeros((norb, norb), dtype=vals.dtype)
    dense = dense.at[jnp.arange(norb)[:, None], cols].add(vals)
    evals, vecs = eigh_batched(dense[None])
    return evals[0], pack_cplx(vecs[0])


@jax.jit
def _dense_eigh_spin_jit(cols, vals_ri):
    from .ops.eigh import eigh_batched

    vals = unpack_cplx(vals_ri)  # (norb, D, 2, 2)
    norb = cols.shape[0]
    blk = jnp.zeros((norb, norb, 2, 2), dtype=vals.dtype)
    blk = blk.at[jnp.arange(norb)[:, None], cols].add(vals)
    dense = blk.transpose(0, 2, 1, 3).reshape(2 * norb, 2 * norb)
    evals, vecs = eigh_batched(dense[None])
    return evals[0], pack_cplx(vecs[0])


def bott_index(sample, nocc=None, fermi=None, eigensolver="auto"):
    """Loring-Hastings Bott index of a 2-D torus sample.

    With ``U = exp(2 pi i Theta_x)``, ``V = exp(2 pi i Theta_y)``
    (Theta the reduced positions on the torus) projected into the
    occupied subspace, ``Bott = (1/2 pi) Im tr log(Vp Up Vp^H Up^H)``
    (Loring & Hastings, EPL 92, 67004 (2010)).  Equals the Chern number
    for a clean gapped sample and stays quantized under disorder until
    localization kills the mobility gap -- the standard real-space
    invariant for disordered topological matter.

    The dense eigensolve runs on device (one program); the occupied
    projections and the final non-Hermitian eigenvalue sum run on host
    in float64 (they are (nocc, nocc) sized).

    :param sample: 2-D :class:`TorusSample` (disordered or clean)
    :param nocc: occupied state count, or
    :param fermi: Fermi energy used to count occupied states
    :param eigensolver: "device" / "host" / "auto" (default: host
      float64 eigh on f32 backends -- see :func:`_host_occ_states`)
    :returns: the Bott index (float; near-integer when gapped)
    """
    if sample.theta.shape[1] != 2:
        raise PythtbError("bott_index requires a 2-D torus sample")
    h = sample.h
    if _use_host_eigh(eigensolver, "bott_index"):
        evals, W = _host_eigh_ell(h)
    else:
        if h.nspin == 2:
            evals, W_ri = _dense_eigh_spin_jit(h.cols, h.vals)
        else:
            evals, W_ri = _dense_eigh_jit(h.cols, h.vals)
        evals = np.asarray(jax.device_get(evals), dtype=np.float64)
        W = host_unpack(np.asarray(jax.device_get(W_ri)))
    if (nocc is None) == (fermi is None):
        raise PythtbError("give exactly one of nocc / fermi")
    if nocc is None:
        nocc = int(np.count_nonzero(evals < fermi))
    nocc = int(nocc)
    if not (0 < nocc < h.nsta):
        raise PythtbError("nocc must leave both occupied and empty states")
    theta = sample.theta
    if h.nspin == 2:
        theta = np.repeat(theta, 2, axis=0)
    Wocc = W[:nocc]  # (nocc, S) rows = states
    px = np.exp(2j * np.pi * theta[:, 0])
    py = np.exp(2j * np.pi * theta[:, 1])
    U = (np.conj(Wocc) * px) @ Wocc.T
    V = (np.conj(Wocc) * py) @ Wocc.T
    Mb = V @ U @ np.conj(V.T) @ np.conj(U.T)
    lam = np.linalg.eigvals(Mb)
    return float(np.sum(np.angle(lam)) / (2.0 * np.pi))


# --------------------------------------------------------------------
# sector (spin) Chern markers -- real-space QSH diagnostics
# --------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 2, 3))
def _sector_marker_jit(static, data, nocc, split, X, Y, op_ri):
    """Dense eigensolve + Prodan sector split + per-sector Bianco-Resta
    contraction, one program.

    ``M = W* O W^T`` is the grading projected into the occupied space
    (rows of W = occupied states); its eigenvectors rotate W into the
    minus/plus sector bases ``V``.  Each sector's marker uses
    ``K = <a|XY|b> - <a|X|p><p|Y|b>`` with p running over THAT sector
    only, i.e. ``Q_s = 1 - P_s`` exactly (the complement includes both
    the unoccupied space and the other sector)."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble

    hp = jax.lax.Precision.HIGHEST
    H = assemble(static, data, jnp.zeros((1, 0), config.float_dtype()))
    evals, vecs = eigh_batched(H)
    W = vecs[0, :nocc, :]  # (nocc, S)
    op = unpack_cplx(op_ri)
    M = jnp.einsum("ns,st,mt->nm", jnp.conj(W), op, W, precision=hp)
    M = 0.5 * (M + jnp.conj(M.T))
    sig, U = jnp.linalg.eigh(M)  # ascending

    def marker_of(V):
        cV = jnp.conj(V)
        A = jnp.einsum("as,s,bs->ab", cV, X, V, precision=hp)
        B = jnp.einsum("bs,s,cs->bc", cV, Y, V, precision=hp)
        Cm = jnp.einsum("as,s,bs->ab", cV, X * Y, V, precision=hp)
        K = Cm - jnp.einsum("ab,bc->ac", A, B, precision=hp)
        return jnp.imag(jnp.einsum("as,ab,bs->s", V, K, cV,
                                   precision=hp))

    V_minus = jnp.einsum("na,ns->as", U[:, :split], W, precision=hp)
    V_plus = jnp.einsum("na,ns->as", U[:, split:], W, precision=hp)
    return (marker_of(V_minus), marker_of(V_plus), sig, evals[0])


def sector_marker(model, op, nocc=None, fermi=None, split=None,
                  eigensolver="auto"):
    """Per-site local Chern markers of the Prodan eigensectors of a
    grading operator ``op`` projected into the occupied space of a
    FINITE 2-D model -- :func:`flows.sector_chern` without a Brillouin
    zone.

    Splits the occupied space by the spectrum of ``P O P`` (``split``
    lowest eigenstates -> the minus sector, rest -> plus) and computes
    the Bianco-Resta marker of each sector projector.  In the bulk of
    a clean topological sample the markers plateau at the sector Chern
    numbers of the periodic parent (the committed oracle compares both
    engines on Kane-Mele at ~1% -- including signs); they stay
    quantized under TRS-preserving disorder, vacancies, or on
    quasicrystals, where no k-space method applies.

    :param model: finite model (``dim_k == 0``, ``dim_r == 2``)
    :param op: (nsta, nsta) Hermitian grading, or a length-nsta
      diagonal, in the flattened (orb x spin, spin fastest) space --
      same convention as :func:`flows.sector_chern`
    :param nocc: occupied state count (even, typically), or
    :param fermi: Fermi energy used to count occupied states
    :param split: minus-sector size (default ``nocc // 2``); a warning
      reports when the projected spectrum does not straddle zero there
    :param eigensolver: "device" / "host" / "auto" (default: host
      float64 eigh + sector split feeding the device contraction on
      f32 backends -- see :func:`_host_occ_states`)
    :returns: dict with ``c_minus`` / ``c_plus`` ((norb,) per-site
      markers, spin-summed), ``sector_marker`` (their half-difference),
      ``total_marker`` (their sum -- its BULK AVERAGE matches
      :func:`chern_marker`'s, but pointwise the two differ by
      cross-sector terms ``P_+ X Q Y P_-`` that integrate to zero;
      each sector marker alone sums to exactly zero over the whole
      sample, like the total one), ``gap`` (P O P spectral gap at the
      split)
    """
    if model._dim_k != 0:
        raise PythtbError("sector_marker requires a finite model (dim_k == 0)")
    if model._dim_r != 2:
        raise PythtbError("sector_marker requires 2-D positions (dim_r == 2)")
    if (nocc is None) == (fermi is None):
        raise PythtbError("give exactly one of nocc / fermi")
    nsta = model._norb * model._nspin
    if fermi is not None:
        evals = model.solve_all()
        nocc = int(np.count_nonzero(evals < fermi))
    nocc = int(nocc)
    if not (1 < nocc < nsta):
        raise PythtbError("nocc must be in 2..nsta-1")
    split = nocc // 2 if split is None else int(split)
    if not (1 <= split <= nocc - 1):
        raise PythtbError("split must be in [1, %d]" % (nocc - 1))
    op = np.asarray(op, dtype=np.complex128)
    if op.ndim == 1:
        op = np.diag(op)
    if op.shape != (nsta, nsta):
        raise PythtbError("op must be (%d, %d) (or a length-%d diagonal)"
                          % (nsta, nsta, nsta))
    if np.abs(op - op.conj().T).max() > 1e-12:
        raise PythtbError("op must be Hermitian (for a spinful mirror M "
                          "with M^2 = -1, pass 1j * M)")
    lat = np.asarray(model._lat, dtype=np.float64)
    pos = np.asarray(model._orb, dtype=np.float64) @ lat
    if model._nspin == 2:
        pos = np.repeat(pos, 2, axis=0)
    ftype = config.float_dtype()
    Xj = jnp.asarray(pos[:, 0], ftype)
    Yj = jnp.asarray(pos[:, 1], ftype)
    if _use_host_eigh(eigensolver, "sector_marker"):
        _, W = _host_occ_states(model, nocc)  # (nocc, S) float64
        M = np.einsum("ns,st,mt->nm", np.conj(W), op, W)
        M = 0.5 * (M + np.conj(M.T))
        sig, U = np.linalg.eigh(M)
        V_minus = np.einsum("na,ns->as", U[:, :split], W)
        V_plus = np.einsum("na,ns->as", U[:, split:], W)
        im_m = jax.device_get(_marker_W_jit(
            jnp.asarray(host_pack(V_minus), ftype), Xj, Yj))
        im_p = jax.device_get(_marker_W_jit(
            jnp.asarray(host_pack(V_plus), ftype), Xj, Yj))
    else:
        static, data = model._get_finalized()
        im_m, im_p, sig, _ = jax.device_get(_sector_marker_jit(
            static, data, nocc, split, Xj, Yj,
            jnp.asarray(host_pack(op), ftype),
        ))
    sig = np.asarray(sig, dtype=np.float64)
    gap = float(sig[split] - sig[split - 1])
    import warnings

    if gap < 1e-3:
        warnings.warn(
            "sector_marker: the P O P spectrum is (nearly) gapless at the "
            "split (min gap %.2e) -- the sector markers are ill-defined "
            "for this model/operator/filling." % gap,
            UserWarning, stacklevel=2)
    elif not (sig[split - 1] < 0.0 < sig[split]):
        warnings.warn(
            "sector_marker: the P O P spectrum does not straddle zero at "
            "the requested split (eigenvalues around it in [%.3f, %.3f]) "
            "-- the +- sector labels are arbitrary; check `split`."
            % (float(sig[split - 1]), float(sig[split])),
            UserWarning, stacklevel=2)
    cell_area = abs(np.linalg.det(lat))
    cm = -4.0 * np.pi / cell_area * np.asarray(im_m, dtype=np.float64)
    cp = -4.0 * np.pi / cell_area * np.asarray(im_p, dtype=np.float64)
    if model._nspin == 2:
        cm = cm.reshape(-1, 2).sum(axis=1)
        cp = cp.reshape(-1, 2).sum(axis=1)
    return {
        "c_minus": cm,
        "c_plus": cp,
        "sector_marker": 0.5 * (cp - cm),
        "total_marker": cp + cm,
        "gap": gap,
    }


def spin_chern_marker(model, nocc=None, fermi=None, eigensolver="auto"):
    """Per-site SPIN Chern marker of a finite spinful 2-D model: the
    Prodan P Sz P sector split of :func:`sector_marker` with the spin
    grading ``diag(+1, -1)`` per orbital -- the real-space Z2 / QSH
    diagnostic (``spin marker mod 2`` reads the Z2 index in the bulk).

    Works where :func:`flows.spin_chern` cannot: disordered flakes,
    vacancies, quasicrystalline QSH insulators.  Robust beyond Sz
    conservation (Rashba) as long as the reported ``gap`` stays open.

    :returns: dict as :func:`sector_marker` (``sector_marker`` is the
      per-site spin Chern marker)
    """
    if model._nspin != 2:
        raise PythtbError("spin_chern_marker requires a spinful model "
                          "(nspin = 2)")
    sz = np.tile([1.0, -1.0], model._norb)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = sector_marker(model, sz, nocc=nocc, fermi=fermi,
                            eigensolver=eigensolver)
    for w in caught:
        msg = str(w.message).replace("sector_marker", "spin_chern_marker"
                                     ).replace("P O P", "P Sz P")
        warnings.warn(msg, w.category, stacklevel=2)
    return out
