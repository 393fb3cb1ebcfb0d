"""Time-periodic (Floquet) driving of tight-binding models.

The reference framework is strictly static -- it has no notion of a
time-dependent Hamiltonian (the closest thing is the adiabatic pumping
of its examples, which sweeps a *parameter*, not time).  Periodically
driven lattices are one of the standard modern uses of tight-binding
models (Floquet topological insulators, light-induced Hall effects), so
this module adds them as a first-class subsystem, TPU-first:

* The drive enters through the **Peierls substitution**: a homogeneous
  time-periodic vector potential ``A(t)`` multiplies every hopping by
  ``exp(i A(t) . d)`` where ``d`` is the hop's full Cartesian
  displacement ``(R + t_j - t_i) @ lat`` (units: A in 1/length, charge
  and hbar absorbed).  Because the drive is a pure per-hop phase, its
  harmonic content is precomputed ON HOST in float64 -- an FFT of
  ``exp(i theta_h(t))`` over one period per hop -- and only small real
  coefficient tables cross the tunneled host<->device boundary
  (ri-packed; complex transfers are unsupported on axon, CLAUDE.md).
  This supports ANY periodic waveform / polarization, with the
  monochromatic case reproducing the Jacobi-Anger Bessel coefficients
  ``c_m = i^m J_m(|z|) e^{-i m phi}`` to spectral accuracy (tested
  against ``scipy.special.jv``).

* :func:`quasienergies` builds the extended-zone Floquet Hamiltonian
  ``K_{mm'}(k) = H^{(m-m')}(k) + m Omega delta_{mm'}`` (harmonics
  ``|m| <= nharm``, every block ``H^{(m)}`` with ``|m| <= 2 nharm``
  retained) and diagonalizes the whole k-batch in ONE device program --
  a single batched ``eigh`` on ``(B, (2M+1) S, (2M+1) S)``, which is
  exactly the large-batched-matmul shape the MXU wants.  Returned
  weights = projection onto the ``m = 0`` sector (the standard
  band-structure coloring).

* :func:`propagator` computes the exact one-period evolution operator
  ``U(T, k)`` by a midpoint-rule product of exponentials under one
  ``lax.scan`` (each factor via batched Hermitian ``eigh``); its
  eigenphases are the truncation-free quasienergies
  (:func:`quasienergies_exact`) -- the internal ORACLE for the Floquet
  matrix -- and its eigenvectors are the Floquet states at ``t = 0``,
  an orthonormal frame per k.

* :func:`chern` evaluates the Chern number of a quasienergy band from
  those t=0 Floquet states with the package's plaquette-link engine
  (ops/berry.plaquette_phases); ``U(T)`` inherits the Convention-I
  embedding ``U(k+G) = D U(k) D^H`` with ``D = diag(e^{-2 pi i G.t})``,
  so the same periodic-gauge boundary phases close the torus.

* :func:`effective_model` returns the leading van Vleck / high-frequency
  effective Hamiltonian ``H_eff = H^{(0)} + sum_{m>0} [H^{(m)},
  H^{(-m)}]/(m Omega)`` as an ordinary :class:`tb_model` -- the
  commutators are evaluated as real-space hop-table convolutions on
  host, so the output composes with EVERYTHING in the package (Chern,
  surfaces, wf_array, ...).  Circularly driven graphene yields the
  celebrated Haldane-like imaginary second-neighbor hops.

* :func:`winding_number` evaluates the Rudner-Lindner-Berg-Levin
  degree of the periodized evolution map -- the invariant of ANOMALOUS
  Floquet phases, whose chiral edge modes exist in both quasienergy
  gaps while every band Chern number vanishes (realized by the RLBL
  five-step drive; tested, with the bulk-boundary dictionary
  ``C = W(above) - W(below)``).

Drive specification (``drive`` argument everywhere): either a dict
``{"A": (dim_r,) amplitudes, "phase": (dim_r,) phases}`` meaning
``A_a(t) = A[a] * cos(Omega t - phase[a])`` (circular polarization in
the xy-plane: ``phase=(0, pi/2)``), or a callable ``t -> (dim_r,)``
vector sampled on host over one period, or ``{"hop_factors": fn}``
with ``fn(t) -> (nhop,)`` per-hop amplitude multipliers (set_hop
insertion order; piecewise-switched lattices).  Any dict form may add
``"onsite": fn(t) -> (norb,)`` real time-periodic onsite energies.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError, tb_model
from .utils.xfer import host_pack, pack_cplx, host_unpack, unpack_cplx

__all__ = [
    "quasienergies",
    "quasienergies_exact",
    "propagator",
    "chern",
    "winding_number",
    "effective_model",
]


# ---------------------------------------------------------------------------
# Host-side drive geometry and harmonics (float64)
# ---------------------------------------------------------------------------


def _drive_at(drive, omega, times, dim_r):
    """Sample the vector potential A(t) at host times, (nt, dim_r)."""
    times = np.asarray(times, dtype=np.float64)
    if callable(drive):
        out = np.array([np.asarray(drive(t), dtype=np.float64) for t in times])
        if out.shape != (len(times), dim_r):
            raise PythtbError(
                "drive callable must return a length-%d vector" % dim_r
            )
        return out
    amp = np.asarray(drive["A"], dtype=np.float64).reshape(-1)
    ph = np.asarray(drive.get("phase", np.zeros_like(amp)),
                    dtype=np.float64).reshape(-1)
    if amp.shape != (dim_r,) or ph.shape != (dim_r,):
        raise PythtbError('drive["A"]/"phase" must have length dim_r=%d'
                          % dim_r)
    return amp[None, :] * np.cos(omega * times[:, None] - ph[None, :])


def _hop_displacements(model):
    """Full Cartesian hop displacements d = (R + t_j - t_i) @ lat,
    (nhop, dim_r) -- includes the non-periodic directions (a finite
    ribbon can be driven across its finite width)."""
    from .magnetic import _hop_arrays

    ii, jj, R = _hop_arrays(model)
    orb = np.asarray(model._orb, dtype=np.float64)
    red = -orb[ii, :] + orb[jj, :] + R
    return red @ np.asarray(model._lat, dtype=np.float64)


def _phase_samples(model, drive, omega, nt, midpoint):
    """Per-hop drive factors c_h(t_s) over one period, (nt, nhop)
    complex128.  ``midpoint`` shifts samples to (s + 1/2) T / nt
    (propagator rule); otherwise s T / nt (DFT rule).

    Two drive families share every downstream code path (the Hermitian
    partner always carries the conjugate factor):
    - Peierls (``{"A": ..., "phase": ...}`` or a callable t -> A):
      c_h(t) = exp(i A(t) . d_h);
    - amplitude modulation (``{"hop_factors": fn}``): fn(t) returns a
      (nhop,) array multiplying the stored amplitudes, indexed in
      ``set_hop`` insertion order (piecewise drives like the
      Rudner-Lindner-Berg-Levin model)."""
    nhop = len(model._hoppings)
    T = 2.0 * np.pi / omega
    s = np.arange(nt, dtype=np.float64) + (0.5 if midpoint else 0.0)
    times = s * (T / nt)
    if isinstance(drive, dict) and not (
        "A" in drive or "hop_factors" in drive or "onsite" in drive
    ):
        raise PythtbError(
            'drive dict must contain "A", "hop_factors", and/or "onsite"'
        )
    if isinstance(drive, dict) and "onsite" in drive and not (
        "A" in drive or "hop_factors" in drive
    ):
        # pure onsite modulation: hops are undriven
        return np.ones((nt, nhop), dtype=np.complex128)
    if isinstance(drive, dict) and "hop_factors" in drive:
        fn = drive["hop_factors"]
        out = np.array(
            [np.asarray(fn(t), dtype=np.complex128).reshape(-1)
             for t in times]
        )
        if out.shape != (nt, nhop):
            raise PythtbError(
                'drive["hop_factors"] must return a length-%d array '
                "per time" % nhop
            )
        return out
    d = _hop_displacements(model)  # (nhop, dim_r)
    A = _drive_at(drive, omega, times, model._dim_r)  # (nt, dim_r)
    return np.exp(1j * (A @ d.T))  # (nt, nhop)


def _onsite_samples(model, drive, omega, nt, midpoint):
    """Optional time-periodic onsite modulation: ``drive["onsite"]`` is
    a callable t -> (norb,) REAL energies ADDED to the static site
    energies.  Returns (nt, nsta) float64 (spin-replicated) or None."""
    if not (isinstance(drive, dict) and "onsite" in drive):
        return None
    fn = drive["onsite"]
    T = 2.0 * np.pi / omega
    s = np.arange(nt, dtype=np.float64) + (0.5 if midpoint else 0.0)
    out = np.array(
        [np.asarray(fn(t), dtype=np.float64).reshape(-1)
         for t in s * (T / nt)]
    )
    if out.shape != (nt, model._norb):
        raise PythtbError(
            'drive["onsite"] must return a length-%d real array per time'
            % model._norb
        )
    if model._nspin == 2:
        out = np.repeat(out, 2, axis=1)
    return out


def _hop_fourier(model, drive, omega, mmax, nt):
    """Harmonics c_m of exp(i theta_h(t)) = sum_m c_m e^{i m Omega t},
    returned as (2*mmax+1, nhop) complex128 with m = -mmax..mmax.

    A plain DFT over one period: exact to aliasing, which decays
    spectrally for the smooth phase factors at hand (nt >= 4*mmax + 4
    enforced by callers)."""
    ph = _phase_samples(model, drive, omega, nt, midpoint=False)
    # c_m = (1/nt) sum_s x_s e^{-2 pi i m s / nt}  == fft(x)/nt at m
    c = np.fft.fft(ph, axis=0) / nt  # rows m = 0..nt-1
    rows = [c[m % nt] for m in range(-mmax, mmax + 1)]
    return np.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# Device assembly
# ---------------------------------------------------------------------------


def _assemble_hm(static, data, kpts, fac, fac_partner):
    """Assemble sum_h amp_h ph_h(k) fac[..., h] at (i_h, j_h) plus
    conj(amp_h ph_h(k)) fac_partner[..., h] at (j_h, i_h) into
    (B, ..., S, S) -- the Floquet generalization of ops.hamiltonian
    .assemble where the Hermitian partner's coefficient is NOT the
    conjugate of the direct one (H^{(m)} pairs with H^{(-m)}).

    fac/fac_partner: (nm, nhop) complex; returns (B, nm, S, S).
    Does NOT add the static diagonal."""
    from .ops.hamiltonian import _phases

    ctype = config.complex_dtype()
    B = kpts.shape[0]
    n = static.norb
    nm = fac.shape[0]
    if static.nhop == 0:
        return jnp.zeros((B, nm, static.nsta, static.nsta), dtype=ctype)
    ph = _phases(static, data.rv, kpts)  # (B, nhop)
    amps = unpack_cplx(jnp.asarray(data.amps))  # (nhop,) or (nhop,2,2)

    if static.nspin == 1:
        direct = ph[:, None, :] * (amps[None, None, :] * fac[None])
        partner = jnp.conj(ph[:, None, :] * amps[None, None, :]) * fac_partner[None]
        H = jnp.zeros((B, nm, n, n), dtype=ctype)
        H = H.at[:, :, data.ii, data.jj].add(direct)
        H = H.at[:, :, data.jj, data.ii].add(partner)
        return H
    # nspin == 2: spin blocks share the hop's scalar drive factor
    vals = ph[:, None, :, None, None] * (
        amps[None, None] * fac[None, :, :, None, None]
    )  # (B, nm, nhop, 2, 2)
    pvals = jnp.conj(
        ph[:, None, :, None, None]
        * jnp.swapaxes(amps, -1, -2)[None, None]
    ) * fac_partner[None, :, :, None, None]
    Hblk = jnp.zeros((B, nm, n, n, 2, 2), dtype=ctype)
    Hblk = Hblk.at[:, :, data.ii, data.jj].add(vals)
    Hblk = Hblk.at[:, :, data.jj, data.ii].add(pvals)
    nsta = static.nsta
    return Hblk.transpose(0, 1, 2, 4, 3, 5).reshape(B, nm, nsta, nsta)


@partial(jax.jit, static_argnums=(0, 1))
def _spectrum_jit(static, nharm, data, cm_ri, om_ri, kpts, omega):
    """Eigen-decompose the truncated Floquet matrix for a k-batch.

    Returns (evals (B, NM*S), m0-weights (B, NM*S)) with NM = 2*nharm+1
    and eigenvalues ascending (eigh order)."""
    from .ops.eigh import eigh_batched

    cm = unpack_cplx(cm_ri)  # (4*nharm+1, nhop), m = -2M..2M
    mmax = 2 * nharm
    # partner coefficient of block m is conj(c_{-m})
    cm_part = jnp.conj(cm[::-1])
    Hm = _assemble_hm(static, data, kpts, cm, cm_part)  # (B, nm_tot, S, S)
    diag = unpack_cplx(jnp.asarray(data.diag))
    Hm = Hm.at[:, mmax].add(diag[None])
    # onsite-modulation harmonics enter every block's diagonal
    om_h = unpack_cplx(om_ri)  # (nm_tot, S)
    Sd = om_h.shape[-1]
    didx = jnp.arange(Sd)
    Hm = Hm.at[:, :, didx, didx].add(om_h[None])
    NM = 2 * nharm + 1
    S = static.nsta
    p = jnp.arange(NM)
    idx = p[:, None] - p[None, :] + mmax  # (NM, NM) block harmonic index
    K = Hm[:, idx]  # (B, NM, NM, S, S)
    shift = (p - nharm).astype(config.float_dtype()) * omega
    eyeS = jnp.eye(S, dtype=K.dtype)
    K = K + (
        jnp.eye(NM, dtype=K.dtype)[None, :, :, None, None]
        * shift[None, :, None, None, None]
        * eyeS[None, None, None]
    )
    K = K.transpose(0, 1, 3, 2, 4).reshape(kpts.shape[0], NM * S, NM * S)
    evals, vecs = eigh_batched(K)  # rows of vecs are states
    central = vecs[:, :, nharm * S : (nharm + 1) * S]
    weights = jnp.sum(jnp.abs(central) ** 2, axis=-1)
    return evals, weights


def _propagation_scan(static, data, dphase_ri, ons, kpts, dt,
                      collect_history):
    """Shared midpoint-product evolution: assemble H(t_s) per step,
    multiply exp(-i H dt) factors under one lax.scan.  The SINGLE home
    of the time-step assembly for both propagator jits (duplicated
    step bodies have shipped bugs in this repo before).  Returns the
    final U, plus the full (nt, B, S, S) history when requested."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import _phases

    dphase = unpack_cplx(dphase_ri)  # (nt, nhop)
    B = kpts.shape[0]
    S = static.nsta
    n = static.norb
    ctype = config.complex_dtype()
    diag = unpack_cplx(jnp.asarray(data.diag))
    ph = _phases(static, data.rv, kpts)  # (B, nhop)
    amps = unpack_cplx(jnp.asarray(data.amps))

    def step(U, sample):
        dph_s, ons_s = sample
        if static.nhop == 0:
            H = jnp.broadcast_to(diag, (B, S, S)).astype(ctype)
        elif static.nspin == 1:
            vals = ph * (amps * dph_s)[None, :]
            H = jnp.zeros((B, n, n), dtype=ctype)
            H = H.at[:, data.ii, data.jj].add(vals)
            H = H.at[:, data.jj, data.ii].add(jnp.conj(vals))
            H = H + diag[None]
        else:
            vals = ph[:, :, None, None] * (
                amps[None] * dph_s[None, :, None, None]
            )
            Hblk = jnp.zeros((B, n, n, 2, 2), dtype=ctype)
            Hblk = Hblk.at[:, data.ii, data.jj].add(vals)
            Hblk = Hblk.at[:, data.jj, data.ii].add(
                jnp.conj(jnp.swapaxes(vals, -1, -2))
            )
            H = Hblk.transpose(0, 1, 3, 2, 4).reshape(B, S, S) + diag[None]
        H = H + jnp.diag(ons_s.astype(H.real.dtype)).astype(H.dtype)[None]
        w, V = eigh_batched(H)  # rows are eigenvectors
        phase = jnp.exp(jax.lax.complex(jnp.zeros_like(w), -w * dt))
        # expm(-i H dt)[s, t] = sum_n V[n, s] e^{-i w_n dt} conj(V[n, t])
        expH = jnp.einsum(
            "bns,bn,bnt->bst", V, phase, jnp.conj(V),
            precision=jax.lax.Precision.HIGHEST,
        )
        Unew = jnp.einsum(
            "bst,btu->bsu", expH, U, precision=jax.lax.Precision.HIGHEST
        )
        return Unew, (Unew if collect_history else None)

    U0 = jnp.broadcast_to(jnp.eye(S, dtype=ctype), (B, S, S))
    U, hist = jax.lax.scan(step, U0, (dphase, ons))
    return U0, U, hist


@partial(jax.jit, static_argnums=(0, 6))
def _propagator_jit(static, data, dphase_ri, ons, kpts, dt, mesh=None):
    """One-period evolution U(T, k) by the midpoint product rule, one
    lax.scan.  Returns ri-packed (B, S, S).  With a (static, hashable)
    ``mesh`` the k-batch is GSPMD-sharded over its first axis -- every
    step's assembly/eigh/matmul then runs data-parallel over the
    mesh."""
    from .ops.solver import shard_grid_axis0

    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    _, U, _ = _propagation_scan(static, data, dphase_ri, ons, kpts, dt,
                                collect_history=False)
    return pack_cplx(U)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _prep(model, omega, k_list):
    if float(omega) <= 0.0:
        raise PythtbError("drive frequency omega must be positive")
    static, data = model._get_finalized()
    if model._dim_k == 0:
        kpts = np.zeros((1, 0), dtype=np.float64)
    else:
        if k_list is None:
            raise PythtbError("k_list is required for periodic models")
        kpts = np.asarray(k_list, dtype=np.float64)
        if kpts.ndim == 1:
            kpts = kpts[:, None] if model._dim_k == 1 else kpts[None, :]
        if kpts.ndim != 2 or kpts.shape[1] != model._dim_k:
            raise PythtbError(
                "k_list must be (nk, %d) for this model" % model._dim_k
            )
    return static, data, kpts


def quasienergies(model, omega, drive, k_list=None, nharm=6, nt=None):
    """Floquet quasienergy spectrum from the truncated extended-zone
    Hamiltonian, one device program for the whole k-batch.

    :param model: any :class:`tb_model` (spinless or spinful; finite
      models pass ``k_list=None``)
    :param omega: drive frequency Omega (energy units, hbar = 1)
    :param drive: ``{"A": amps, "phase": phases}`` monochromatic vector
      potential ``A_a(t) = A_a cos(Omega t - phase_a)`` or a callable
      ``t -> A`` (see module docstring; A in 1/length units)
    :param k_list: (nk, dim_k) reduced k-points (e.g. from ``k_path``)
    :param nharm: Floquet harmonic cutoff M; the matrix keeps blocks
      ``H^{(m)}`` up to ``|m| = 2 M``
    :param nt: drive samples per period for the harmonic DFT
      (default ``max(64, 8*nharm+8)``)
    :returns: ``(quasi, weight)`` -- eigenvalues ``(nk, (2M+1)*nsta)``
      ascending and their m=0-sector weights (weights ~1 mark the
      physical first-zone copies; each physical band appears 2M+1
      times shifted by multiples of Omega)

    Oracle: agrees with the truncation-free
    :func:`quasienergies_exact` as ``nharm`` grows (tested).
    """
    omega = float(omega)
    static, data, kpts = _prep(model, omega, k_list)
    nharm = int(nharm)
    if nharm < 1:
        raise PythtbError("nharm must be >= 1")
    if nt is None:
        nt = max(64, 8 * nharm + 8)
    nt = int(nt)
    if nt < 4 * nharm + 4:
        raise PythtbError("nt must be >= 4*nharm + 4 for unaliased harmonics")
    cm = _hop_fourier(model, drive, omega, 2 * nharm, nt)
    ons = _onsite_samples(model, drive, omega, nt, midpoint=False)
    nm_tot = 4 * nharm + 1
    if ons is None:
        om_h = np.zeros((nm_tot, static.nsta), dtype=np.complex128)
    else:
        c = np.fft.fft(ons, axis=0) / nt
        om_h = np.stack([c[mi % nt] for mi in range(-2 * nharm,
                                                    2 * nharm + 1)], axis=0)
    ftype = config.float_dtype()
    evals, weights = _spectrum_jit(
        static, nharm, data, host_pack(cm), host_pack(om_h),
        jnp.asarray(kpts, ftype), jnp.asarray(omega, ftype),
    )
    out = jax.device_get((evals, weights))
    return np.asarray(out[0], np.float64), np.asarray(out[1], np.float64)


def _propagator_device(model, omega, drive, k_list, nt):
    """Run the propagator program; returns (static, ri-packed device
    U(T, k)) -- complex stays packed at the boundary (axon rule)."""
    static, data, kpts = _prep(model, omega, k_list)
    nt = int(nt)
    if nt < 4:
        raise PythtbError("nt must be >= 4")
    dph = _phase_samples(model, drive, omega, nt, midpoint=True)
    ons = _onsite_samples(model, drive, omega, nt, midpoint=True)
    if ons is None:
        ons = np.zeros((nt, static.nsta))
    ftype = config.float_dtype()
    dt = 2.0 * np.pi / (omega * nt)
    out = _propagator_jit(
        static, data, host_pack(dph), jnp.asarray(ons, ftype),
        jnp.asarray(kpts, ftype), jnp.asarray(dt, ftype),
    )
    return static, out


def propagator(model, omega, drive, k_list=None, nt=256):
    """Exact one-period evolution operator ``U(T, k)``, (nk, S, S)
    complex, by a midpoint product of ``nt`` exponential factors in one
    ``lax.scan`` (error O(1/nt^2)).  The truncation-free ground truth
    for everything Floquet."""
    _, out = _propagator_device(model, float(omega), drive, k_list, nt)
    return host_unpack(np.asarray(jax.device_get(out)))


@jax.jit
def _eigenphases_packed(U_ri):
    from .ops.berry import unitary_eigenphases

    return unitary_eigenphases(unpack_cplx(U_ri))


def quasienergies_exact(model, omega, drive, k_list=None, nt=256, ezero=0.0):
    """Truncation-free quasienergies from the eigenphases of
    :func:`propagator`, folded into ``(ezero - Omega/2, ezero +
    Omega/2]`` and sorted ascending, (nk, nsta)."""
    omega = float(omega)
    _, U_ri = _propagator_device(model, omega, drive, k_list, nt)
    theta = np.asarray(
        jax.device_get(_eigenphases_packed(U_ri)), np.float64
    )
    eps = -theta * omega / (2.0 * np.pi)
    eps = eps - omega * np.round((eps - float(ezero)) / omega)
    return np.sort(eps, axis=-1)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _floquet_states_jit(static, band, n0, n1, U_ri, omega, ezero, phases_ri):
    """Select quasienergy bands of U(T) on an interior (n0-1, n1-1)
    grid, close the torus with the periodic gauge, and sum plaquette
    phases -> total Berry flux of the selected Floquet bands."""
    from .ops.berry import plaquette_phases, unitary_eig
    from .ops.solver import extend_pbc_seq

    U = unpack_cplx(U_ri)  # (B, S, S)
    theta, P = unitary_eig(U)  # U = P diag(e^{i theta}) P^H
    eps = -theta * omega / (2.0 * np.pi)
    eps = eps - omega * jnp.round((eps - ezero) / omega)
    order = jnp.argsort(eps, axis=-1)
    w = jnp.swapaxes(P, -1, -2)  # rows are eigenvectors
    w = jnp.take_along_axis(w, order[..., None], axis=-2)
    w = w[:, jnp.asarray(band, jnp.int32), :]  # (B, nb, S)
    w = w.reshape(n0 - 1, n1 - 1, len(band), static.nsta)
    w = extend_pbc_seq(
        w, [unpack_cplx(phases_ri[0]), unpack_cplx(phases_ri[1])]
    )
    return jnp.sum(plaquette_phases(w))


def chern(model, omega, drive, band, nk=(31, 31), nt=256, ezero=0.0,
          mesh=None):
    """Chern number of Floquet quasienergy bands.

    Diagonalizes the exact one-period propagator on a BZ grid (the t=0
    Floquet states are an orthonormal frame per k), orders states by
    quasienergy folded around ``ezero``, and sums plaquette Berry
    phases of the ``band`` selection with the package's link-det
    engine.  Circularly driven graphene gives C = +-1 with the sign
    following the drive handedness (tested); linear polarization gives
    0.

    :param band: quasienergy band index or list of indices (ascending
      order within the folding zone)
    :param ezero: center of the folding zone -- move it if the band of
      interest wraps through the zone edge
    :param mesh: optional device mesh (or ambient ``use_mesh``): the
      k-grid propagation is sharded over its first axis
    """
    if model._dim_k != 2:
        raise PythtbError("floquet.chern requires dim_k == 2")
    from .flows import gauge_phases
    from .ops.solver import device_uniform_grid
    from .parallel import mesh as pmesh

    if mesh is None:
        mesh = pmesh.current_mesh()

    omega = float(omega)
    static, data, _ = _prep(model, omega, np.zeros((1, 2)))
    band = tuple(int(b) for b in np.atleast_1d(band))
    if any(not (0 <= b < static.nsta) for b in band):
        raise PythtbError("band indices out of range")
    n0, n1 = int(nk[0]), int(nk[1])
    nt = int(nt)
    dph = _phase_samples(model, drive, omega, nt, midpoint=True)
    ons = _onsite_samples(model, drive, omega, nt, midpoint=True)
    if ons is None:
        ons = np.zeros((nt, static.nsta))
    ftype = config.float_dtype()
    dt = 2.0 * np.pi / (omega * nt)
    kpts = device_uniform_grid(
        (n0 - 1, n1 - 1), jnp.asarray([-0.5, -0.5], ftype)
    )
    U_ri = _propagator_jit(
        static, data, host_pack(dph), jnp.asarray(ons, ftype), kpts,
        jnp.asarray(dt, ftype), mesh
    )
    p0, p1 = gauge_phases(model, (0, 1))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    flux = _floquet_states_jit(
        static, band, n0, n1, U_ri, jnp.asarray(omega, ftype),
        jnp.asarray(float(ezero), ftype), phases_ri,
    )
    return float(jax.device_get(flux)) / (2.0 * np.pi)


# ---------------------------------------------------------------------------
# Rudner winding number (anomalous Floquet topology)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _propagator_history_jit(static, data, dphase_ri, ons, kpts, dt):
    """Cumulative evolution U(k, s*dt) for s = 0..nt, (nt+1, B, S, S)
    ri-packed -- the shared _propagation_scan with the whole history
    collected."""
    U0, _, hist = _propagation_scan(static, data, dphase_ri, ons, kpts,
                                    dt, collect_history=True)
    return pack_cplx(jnp.concatenate([U0[None], hist], axis=0))


@partial(jax.jit, static_argnums=(0, 1))
def _winding_jit(n0, n1, hist_ri, omega, egaps, phases_ri):
    """Degree of the periodized evolution map (Rudner et al., PRX 3,
    031005 (2013), Eq. (10)):

    ``W = (1/8 pi^2) int dt dk1 dk2
    Tr( U_e^H dU_e/dt [U_e^H dU_e/dk1, U_e^H dU_e/dk2] )``

    with ``U_e(k, t) = U(k, t) exp(+i t H_eff^e)`` periodized through
    the quasienergy gap at ``egap``, vmapped over a batch of gap
    energies (the expensive U(k, t) history is shared; the
    periodization + degree integral are cheap).  Coordinates are
    (reduced k) x
    [0, T): the integrand is a reparameterization-invariant 3-form, so
    no 2pi Jacobians appear.  Central differences everywhere; the
    k-wrap uses the Convention-I conjugation ``U(k + G) = D U(k) D^H``
    with the same embedding phases the flux engines use."""
    from .ops.berry import unitary_eig

    hist = unpack_cplx(hist_ri)  # (nt+1, B, S, S)
    ntp1, B, S, _ = hist.shape
    nt = ntp1 - 1
    T = 2.0 * np.pi / omega
    theta, P = unitary_eig(hist[-1])  # (B, S), (B, S, S) cols eigvecs
    eps0 = -theta * omega / (2.0 * np.pi)

    def one_gap(egap):
        # branch the quasienergies into (egap, egap + omega): H_eff^e
        eps = eps0 - omega * jnp.floor((eps0 - egap) / omega) - omega
        eps = jnp.where(eps <= egap, eps + omega, eps)
        ts = (jnp.arange(nt + 1, dtype=eps.dtype) * (T / nt))
        # exp(+ i t H_eff) = P diag(e^{i eps t}) P^H, all times at once
        ph_t = jnp.exp(
            jax.lax.complex(
                jnp.zeros((ntp1, B, S), eps.dtype),
                ts[:, None, None] * eps[None],
            )
        )
        expH = jnp.einsum(
            "bsn,tbn,bun->tbsu", P, ph_t, jnp.conj(P),
            precision=jax.lax.Precision.HIGHEST,
        )
        Ue = jnp.einsum("tbsu,tbuv->tbsv", hist, expH,
                        precision=jax.lax.Precision.HIGHEST)
        # reshape to the (t, k1, k2) grid; drop the duplicated t = T
        # slice (U_e is periodic: the branch makes U_e(T) = U_e(0) = 1)
        Ue = Ue[:-1].reshape(nt, n0, n1, S, S)

        def a_mu(dU):
            return jnp.einsum("tijsu,tijsv->tijuv", jnp.conj(Ue), dU,
                              precision=jax.lax.Precision.HIGHEST)

        # periodic central differences; k-wraps conjugated by the
        # embedding
        p0 = unpack_cplx(phases_ri[0])  # (F,) = diag of D_0
        p1 = unpack_cplx(phases_ri[1])

        def d_k(axis, pfac):
            up = jnp.roll(Ue, -1, axis=axis)
            dn = jnp.roll(Ue, 1, axis=axis)
            # U(k + G) = D U(k) D^H, elementwise D_{su} = p_s conj(p_u)
            D = pfac[:, None] * jnp.conj(pfac)[None, :]
            idx_last = [slice(None)] * 5
            idx_last[axis] = -1
            idx_first = [slice(None)] * 5
            idx_first[axis] = 0
            up = up.at[tuple(idx_last)].multiply(D)          # k -> k+1
            dn = dn.at[tuple(idx_first)].multiply(jnp.conj(D))  # k -> k-1
            h = 1.0 / (n0 if axis == 1 else n1)
            return (up - dn) / (2.0 * h)

        dU_t = (jnp.roll(Ue, -1, axis=0) - jnp.roll(Ue, 1, axis=0)) / (
            2.0 * T / nt
        )
        A_t = a_mu(dU_t)
        A_1 = a_mu(d_k(1, p0))
        A_2 = a_mu(d_k(2, p1))
        comm = jnp.einsum("tijsu,tijuv->tijsv", A_1, A_2,
                          precision=jax.lax.Precision.HIGHEST) - jnp.einsum(
            "tijsu,tijuv->tijsv", A_2, A_1,
            precision=jax.lax.Precision.HIGHEST)
        tr = jnp.einsum("tijsu,tijus->tij", A_t, comm,
                        precision=jax.lax.Precision.HIGHEST)
        vol_cell = (T / nt) * (1.0 / n0) * (1.0 / n1)
        # minus sign: report in the package's (reference-mirrored) flux
        # orientation, so C_band = W(gap above) - W(gap below) holds
        # with the same chern() every other Hall quantity matches
        return -jnp.real(jnp.sum(tr)) * vol_cell / (8.0 * np.pi**2)

    return jax.vmap(one_gap)(egaps)


def winding_number(model, omega, drive, egap, nk=(21, 21), nt=128):
    """Rudner winding number ``W(egap)`` of a driven 2-D lattice -- the
    bulk invariant counting chiral edge modes in the quasienergy gap at
    ``egap``, including the ANOMALOUS phases where every band Chern
    number vanishes (Rudner, Lindner, Berg & Levin, PRX 3, 031005
    (2013)).

    The full evolution history U(k, t) over one period is built by the
    midpoint product (one lax.scan), periodized through the gap via the
    branch-cut effective Hamiltonian (device unitary_eig), and the
    degree integral discretized with periodic central differences --
    one device program end to end.

    The Chern number of a quasienergy band equals ``W(gap above) -
    W(gap below)`` (tested); a high-frequency drive has ``W = 0`` at
    the zone edge, while the RLBL piecewise drive realizes ``|W| = 1``
    in BOTH gaps with zero band Chern numbers (the anomalous phase;
    tested at and away from the ideal point).

    :param egap: a quasienergy INSIDE a spectral gap (e.g. 0 or
      omega/2), or a list of several -- the expensive U(k, t) history
      is computed ONCE and the cheap degree integral vmapped over the
      batch; a gapless choice gives a non-integer answer
    :param nk: grid with ``nk - 1`` unique points per direction (same
      convention as :func:`chern`, so nk-matched comparisons in the
      bulk-boundary dictionary use identical resolution)
    :param nt: time steps (use more for piecewise-constant drives --
      the kinks cost first-order errors locally)
    :returns: float close to the integer W (array for an egap batch)
    """
    if model._dim_k != 2:
        raise PythtbError("winding_number requires dim_k == 2")
    from .flows import gauge_phases
    from .ops.solver import device_uniform_grid

    omega = float(omega)
    static, data, _ = _prep(model, omega, np.zeros((1, 2)))
    n0, n1 = int(nk[0]) - 1, int(nk[1]) - 1
    if n0 < 2 or n1 < 2:
        raise PythtbError("nk must be at least (3, 3)")
    nt = int(nt)
    dph = _phase_samples(model, drive, omega, nt, midpoint=True)
    ons = _onsite_samples(model, drive, omega, nt, midpoint=True)
    if ons is None:
        ons = np.zeros((nt, static.nsta))
    ftype = config.float_dtype()
    dt = 2.0 * np.pi / (omega * nt)
    kpts = device_uniform_grid((n0, n1), jnp.zeros((2,), ftype))
    hist = _propagator_history_jit(
        static, data, host_pack(dph), jnp.asarray(ons, ftype), kpts,
        jnp.asarray(dt, ftype)
    )
    p0, p1 = gauge_phases(model, (0, 1))
    phases_ri = np.stack([host_pack(p0), host_pack(p1)], axis=0)
    egaps = np.atleast_1d(np.asarray(egap, dtype=np.float64))
    out = np.asarray(jax.device_get(_winding_jit(
        n0, n1, hist, jnp.asarray(omega, ftype),
        jnp.asarray(egaps, ftype), phases_ri,
    )), dtype=np.float64)
    return float(out[0]) if np.ndim(egap) == 0 else out


# ---------------------------------------------------------------------------
# van Vleck effective model (host-side hop-table algebra)
# ---------------------------------------------------------------------------


def _as_block(amp, nspin):
    a = np.asarray(amp, dtype=np.complex128)
    if nspin == 1:
        return complex(a)
    if a.shape == (2, 2):
        return a
    if a.ndim == 0:
        return np.eye(2, dtype=np.complex128) * complex(a)
    raise PythtbError("unexpected hopping block shape %s" % (a.shape,))


def _dagger(amp, nspin):
    return np.conj(amp) if nspin == 1 else np.conj(amp.T)


def _table_for_m(model, cm_row, cmneg_row, nspin):
    """Real-space matrix elements of H^{(m)}: dict (i, j, R) -> block.
    Direct hops carry c_m, the Hermitian partners conj(c_{-m})."""
    from .magnetic import _hop_arrays

    ii, jj, R = _hop_arrays(model)
    tab = {}
    for h, hop in enumerate(model._hoppings):
        amp = _as_block(hop[0], nspin)
        Rt = tuple(int(round(r)) for r in R[h])
        Rn = tuple(-r for r in Rt)
        key = (int(ii[h]), int(jj[h]), Rt)
        tab[key] = tab.get(key, 0.0) + amp * cm_row[h]
        keyp = (int(jj[h]), int(ii[h]), Rn)
        tab[keyp] = tab.get(keyp, 0.0) + _dagger(amp, nspin) * np.conj(
            cmneg_row[h]
        )
    return tab


def _table_product(A, B, nspin):
    """Hop-table convolution (A B)_{ij}(R) = sum_{p, R1+R2=R}
    A_{ip}(R1) B_{pj}(R2); spin blocks compose by matrix product."""
    byfirst = {}
    for (p, j, R2), b in B.items():
        byfirst.setdefault(p, []).append((j, R2, b))
    out = {}
    for (i, p, R1), a in A.items():
        for j, R2, b in byfirst.get(p, ()):
            R = tuple(r1 + r2 for r1, r2 in zip(R1, R2))
            term = a * b if nspin == 1 else a @ b
            prev = out.get((i, j, R))
            out[(i, j, R)] = term if prev is None else prev + term
    return out


def effective_model(model, omega, drive, nharm=6, nt=None, tol=1e-10):
    """Leading van Vleck high-frequency effective Hamiltonian as a new
    :class:`tb_model`:

    ``H_eff = H^{(0)} + (1/Omega) sum_{m=1}^{M} [H^{(m)}, H^{(-m)}] / m
    + O(1/Omega^2)``

    The zeroth harmonic renormalizes every hop by its ``c_0``
    (dynamical localization); the commutators generate new
    longer-range, generally complex hops -- for circularly driven
    graphene the Haldane imaginary second-neighbor terms, so
    ``flows.chern_number(effective_model(...))`` reproduces the full
    Floquet Chern number at high frequency (tested against
    :func:`chern`).  Hops with magnitude below ``tol`` (relative to
    the largest) are dropped.

    Undriven limit: returns a model with the original hop table
    (c_0 = 1, all other harmonics 0)."""
    omega = float(omega)
    if omega <= 0.0:
        raise PythtbError("drive frequency omega must be positive")
    nharm = int(nharm)
    if nt is None:
        nt = max(64, 8 * nharm + 8)
    if nt < 4 * nharm + 4:
        raise PythtbError("nt must be >= 4*nharm + 4 for unaliased harmonics")
    cm = _hop_fourier(model, drive, omega, nharm, nt)  # (2M+1, nhop)
    ons_s = _onsite_samples(model, drive, omega, int(nt), midpoint=False)
    if ons_s is None:
        om_h = np.zeros((2 * nharm + 1, model._norb), dtype=np.complex128)
    else:
        c = np.fft.fft(ons_s[:, :: model._nspin], axis=0) / int(nt)
        om_h = np.stack([c[mi % int(nt)]
                         for mi in range(-nharm, nharm + 1)], axis=0)
    nspin = model._nspin

    def row(m):
        return cm[m + nharm]

    def _acc(tab, key, val):
        prev = tab.get(key)
        tab[key] = val if prev is None else prev + val

    R0 = (0,) * model._dim_r

    def _with_onsite(tab, m):
        hrow = om_h[m + nharm]
        for i in range(model._norb):
            blk = (hrow[i] if nspin == 1
                   else hrow[i] * np.eye(2, dtype=np.complex128))
            _acc(tab, (i, i, R0), blk)
        return tab

    heff = _with_onsite(_table_for_m(model, row(0), row(0), nspin), 0)
    for m in range(1, nharm + 1):
        Am = _with_onsite(_table_for_m(model, row(m), row(-m), nspin), m)
        Amn = _with_onsite(_table_for_m(model, row(-m), row(m), nspin), -m)
        for key, val in _table_product(Am, Amn, nspin).items():
            _acc(heff, key, val / (m * omega))
        for key, val in _table_product(Amn, Am, nspin).items():
            _acc(heff, key, -val / (m * omega))

    out = tb_model(
        model._dim_k,
        model._dim_r,
        lat=np.array(model._lat),
        orb=np.array(model._orb),
        per=list(model._per),
        nspin=nspin,
    )
    if nspin == 1:
        out.set_onsite(np.array(model._site_energies, dtype=float))
    else:
        out.set_onsite([np.array(b) for b in model._site_energies])

    scale = max(
        (np.max(np.abs(np.asarray(v))) for v in heff.values()), default=0.0
    )
    cut = tol * max(scale, 1.0)
    done = set()
    for key in sorted(heff.keys()):
        if key in done:
            continue
        i, j, R = key
        pkey = (j, i, tuple(-r for r in R))
        amp = heff[key]
        partner = heff.get(pkey)
        if pkey == key:  # onsite: i == j, R == 0
            blk = _as_block(amp, nspin) if nspin == 2 else amp
            if nspin == 1:
                if abs(blk.imag) > 1e-8 * max(abs(blk), 1.0):
                    raise PythtbError("effective onsite term not real")
                out.set_onsite(blk.real, i, mode="add")
            else:
                blk = 0.5 * (blk + np.conj(blk.T))
                out.set_onsite(blk, i, mode="add")
            done.add(key)
            continue
        done.add(key)
        done.add(pkey)
        # Hermiticity: average the pair (they agree analytically)
        sym = amp if partner is None else 0.5 * (amp + _dagger(partner, nspin))
        if np.max(np.abs(np.asarray(sym))) <= cut:
            continue
        if model._dim_k != 0:
            out.set_hop(sym, i, j, ind_R=list(R), mode="add",
                        allow_conjugate_pair=True)
        else:
            out.set_hop(sym, i, j, mode="add", allow_conjugate_pair=True)
    return out
