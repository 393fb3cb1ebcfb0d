"""Impurity embedding: lattice Green's functions and the T-matrix.

The reference can only study defects by brute force -- cut a large
finite flake, insert the impurity, diagonalize, and hope the edges are
far enough away.  This module embeds a LOCAL perturbation exactly in
the INFINITE crystal:

    G(E) = G0(E) + G0(E) T(E) G0(E),
    T(E) = V [1 - G0(E) V]^{-1},

where ``V`` is any Hermitian perturbation supported on a finite
cluster of sites (cells R, orbitals) and ``G0`` is the pristine-host
lattice Green's function between those sites,

    G0_{ab}(E) = (1/N_k) sum_{k n}
        phi_a(k,n) conj(phi_b(k,n)) / (E + i eta - eps_{k n}),
    phi_a(k,n) = e^{2 pi i k.(R_a + t_a)} c_n(k)_{orb_a}

(the orbital-embedding phase puts the amplitudes in the true site
basis; the committed oracle against a dense impurity flake pins the
convention).  One grid eigendecomposition serves every energy: the
whole (E-batch x cluster x cluster) G0 is a single device einsum over
the (k, n) spectrum -- MXU work.

* :func:`host_greens_function` -- G0(E) on a cluster, (nE, nc, nc).
* :func:`t_matrix` -- (G, T) with the impurity embedded; the diagonal
  of ``-Im G / pi`` is the LDOS at the cluster sites.
* :func:`bound_states` -- in-gap impurity levels as the zeros of
  ``det[1 - G0(E) V]`` on the real axis (where the gap makes G0
  Hermitian): scan a window for sign changes of the smallest
  eigenvalue of the (Hermitian) ``1 - G0 V`` pencil and bisect.

Physics oracle: a strong on-site impurity in a gapped host binds
states in the gap whose energies a 30x30 dense flake reproduces to
finite-size accuracy; a vacancy (U -> inf) in gapped graphene binds a
sublattice-polarized midgap state.  Complex crosses the host<->device
boundary ri-packed (utils/xfer.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_unpack, pack_cplx, unpack_cplx

__all__ = ["host_greens_function", "t_matrix", "bound_states"]


def _cluster_arrays(model, cluster):
    """Normalize a cluster spec into (R (nc, dim_r), state index (nc,),
    t+R reduced positions for the phase).  Cluster entries are either
    orbital indices (home cell) or ``(R_vector, orbital)`` pairs; for
    spinful models each orbital contributes its two spin states
    CONSECUTIVELY in the returned ordering."""
    static, _ = model._get_finalized()
    dim_r = model._dim_r
    Rs, orbs = [], []
    for entry in cluster:
        if isinstance(entry, (int, np.integer)):
            Rs.append(np.zeros(dim_r))
            orbs.append(int(entry))
        else:
            R, o = entry
            Rs.append(np.asarray(R, dtype=np.float64))
            orbs.append(int(o))
    orbs = np.asarray(orbs)
    if orbs.min() < 0 or orbs.max() >= model._norb:
        raise PythtbError("cluster orbital out of range")
    Rs = np.asarray(Rs, dtype=np.float64)
    if Rs.shape[1] != dim_r:
        raise PythtbError("cluster R vectors must have dim_r components")
    nonper = [d for d in range(dim_r) if d not in model._per]
    if nonper and np.abs(Rs[:, nonper]).max() > 1e-9:
        raise PythtbError(
            "cluster R vectors must vanish along non-periodic "
            "directions (there are no repeated cells there)"
        )
    orb_red = np.asarray(model._orb, dtype=np.float64)
    pos_red = Rs + orb_red[orbs]  # (nc, dim_r) reduced positions
    if static.nspin == 2:
        pos_red = np.repeat(pos_red, 2, axis=0)
        states = np.stack([2 * orbs, 2 * orbs + 1], axis=1).reshape(-1)
    else:
        states = orbs
    return pos_red, np.asarray(states, dtype=np.int64)


@partial(jax.jit, static_argnums=(0, 3))
def _spectrum_jit(static, data, pos_red_per, nk, states):
    """Grid eigendecomposition once: (evals (B, S), ri-packed site-
    basis amplitudes phi (B, S, nc))."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    kpts = device_uniform_grid(nk, jnp.zeros((static.dim_k,),
                                             config.float_dtype()))
    evals, vecs = eigh_batched(assemble(static, data, kpts))
    # site-basis amplitudes: phi[k, n, a] = e^{2 pi i k.(R_a + t_a)} c_a
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum(
        "bd,ad->ba", kpts.astype(config.complex_dtype()),
        pos_red_per.astype(config.complex_dtype()), precision=hp))
    phi = vecs[:, :, states] * ph[:, None, :]
    return evals, pack_cplx(phi)


@jax.jit
def _g0_eval_jit(evals, phi_ri, energies, eta):
    """G0(E) for an energy batch from the precomputed spectrum,
    ri-packed (nE, nc, nc) -- the per-energy cost is one einsum."""
    hp = jax.lax.Precision.HIGHEST
    phi = unpack_cplx(phi_ri)
    denom = (energies[:, None, None]
             + jax.lax.complex(jnp.zeros((), config.float_dtype()), eta)
             - evals[None].astype(config.complex_dtype()))
    G0 = jnp.einsum("kna,knc,ekn->eac", phi, jnp.conj(phi), 1.0 / denom,
                    precision=hp) / phi.shape[0]
    return pack_cplx(G0)


def _spectrum(model, static, data, pos_red, states, nk):
    """Host wrapper for the one-time grid eigendecomposition (only the
    periodic components of the positions enter the Bloch phase)."""
    ftype = config.float_dtype()
    evals, phi_ri = _spectrum_jit(
        static, data, jnp.asarray(pos_red[:, list(model._per)], ftype),
        nk, jnp.asarray(states))
    return evals, phi_ri


def _prep_host(model, nk, caller):
    static, data = model._get_finalized()
    if static.dim_k < 1:
        raise PythtbError("%s needs a periodic host model" % caller)
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != static.dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % static.dim_k)
    return static, data, nk


def host_greens_function(model, energies, cluster, nk=(64, 64), eta=1e-3):
    """Pristine-host lattice Green's function between cluster sites.

    :param energies: (nE,) real energies (complex shift ``i eta`` is
      added internally)
    :param cluster: site list -- orbital indices (home cell) or
      ``(R, orbital)`` pairs; spinful orbitals expand to their two
      spin states consecutively
    :param nk: BZ grid for the k-integral (convergence is O(1/N_k)
      against the eta broadening -- use nk >> bandwidth/(2 pi eta)
      per direction for spectral detail, less for in-gap work)
    :param eta: positive imaginary part (retarded)
    :returns: (nE, nc, nc) complex G0
    """
    static, data, nk = _prep_host(model, nk, "host_greens_function")
    pos_red, states = _cluster_arrays(model, cluster)
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    evals, phi_ri = _spectrum(model, static, data, pos_red, states, nk)
    ftype = config.float_dtype()
    G0 = jax.device_get(_g0_eval_jit(
        evals, phi_ri, jnp.asarray(energies, ftype),
        jnp.asarray(float(eta), ftype),
    ))
    return host_unpack(G0)


def t_matrix(model, V, energies, cluster, nk=(64, 64), eta=1e-3):
    """Exact embedding of a local perturbation: returns ``(G, T)`` on
    the cluster, each (nE, nc, nc) complex, with ``G = G0 + G0 T G0``
    the FULL Green's function of the infinite crystal plus impurity.
    The cluster-site LDOS is ``-Im diag(G) / pi``.

    :param V: (nc, nc) Hermitian perturbation in the cluster state
      basis (spinful: the spin-expanded ordering of ``cluster``)
    """
    G0 = host_greens_function(model, energies, cluster, nk=nk, eta=eta)
    V = np.asarray(V, dtype=np.complex128)
    nc = G0.shape[-1]
    if V.shape != (nc, nc):
        raise PythtbError("V must be (%d, %d) in the cluster state basis"
                          % (nc, nc))
    if np.abs(V - V.conj().T).max() > 1e-12:
        raise PythtbError("V must be Hermitian")
    eye = np.eye(nc)
    T = np.stack([V @ np.linalg.inv(eye - g @ V) for g in G0])
    G = G0 + np.einsum("eab,ebc,ecd->ead", G0, T, G0)
    return G, T


def bound_states(model, V, cluster, window, nk=(64, 64), n_scan=201,
                 tol=1e-9):
    """In-gap impurity levels: real zeros of ``det[1 - G0(E) V]``.

    Inside a spectral gap G0(E) is Hermitian on the real axis (eta ->
    0), so for invertible V the condition ``det[1 - G0 V] = 0`` is the
    zero crossing of an eigenvalue of the HERMITIAN pencil ``A(E) =
    V^{-1} - G0(E)``: the scan tracks the count of negative
    eigenvalues of A and recursively bisects every change, so two
    DISTINCT levels inside one scan interval are still separated (an
    exact degeneracy converges to one energy reported with its
    multiplicity).  A singular V falls back to sign changes of the
    real determinant of ``1 - G0 V`` (which misses even-multiplicity
    roots -- prefer invertible V).  The host spectrum is diagonalized
    ONCE; every scan/bisection energy costs one small einsum.

    :param window: (E_lo, E_hi) inside a host gap (states inside bands
      are resonances, not bound states -- they will not be found)
    :param n_scan: initial scan resolution (recursion refines each
      bracket to ``tol``)
    :returns: (nb,) array of bound-state energies (possibly empty)
    """
    E_lo, E_hi = float(window[0]), float(window[1])
    if not E_hi > E_lo:
        raise PythtbError("window must be (E_lo, E_hi) with E_hi > E_lo")
    V = np.asarray(V, dtype=np.complex128)

    static, data, nk = _prep_host(model, nk, "bound_states")
    pos_red, states = _cluster_arrays(model, cluster)
    nc = len(states)
    if V.shape != (nc, nc):
        raise PythtbError("V must be (%d, %d) in the cluster state basis"
                          % (nc, nc))
    if np.abs(V - V.conj().T).max() > 1e-12:
        raise PythtbError("V must be Hermitian")
    evals, phi_ri = _spectrum(model, static, data, pos_red, states, nk)
    ftype = config.float_dtype()
    eta = jnp.asarray(1e-7, ftype)

    # real-axis G0 from the precomputed spectrum: tiny eta, Hermitian
    # part (in a gap the anti-Hermitian part ~ eta -> 0)
    def g0_herm(Es):
        G0 = host_unpack(jax.device_get(_g0_eval_jit(
            evals, phi_ri, jnp.asarray(np.atleast_1d(Es), ftype), eta)))
        return 0.5 * (G0 + np.conj(np.swapaxes(G0, -1, -2)))

    invertible = (np.linalg.cond(V) < 1e12
                  if np.abs(V).max() > 0 else False)
    if invertible:
        Vinv = np.linalg.inv(V)

        def count(Es):
            A = Vinv[None] - g0_herm(Es)
            return (np.linalg.eigvalsh(A) < 0.0).sum(axis=-1)
    else:
        def count(Es):
            M = np.eye(nc)[None] - g0_herm(Es) @ V[None]
            return (np.real(np.linalg.det(M)) < 0.0).astype(int)

    roots = []

    def refine(lo, hi, clo, chi):
        mult = abs(int(chi) - int(clo))
        if mult == 0:
            return
        if hi - lo <= tol:
            roots.extend([0.5 * (lo + hi)] * mult)
            return
        mid = 0.5 * (lo + hi)
        cm = int(count(np.array([mid]))[0])
        refine(lo, mid, clo, cm)
        refine(mid, hi, cm, chi)

    Es = np.linspace(E_lo, E_hi, int(n_scan))
    c = count(Es)
    for i in range(len(Es) - 1):
        refine(Es[i], Es[i + 1], int(c[i]), int(c[i + 1]))
    return np.asarray(sorted(roots), dtype=np.float64)
