"""Single-site dynamical mean-field theory with an ED impurity solver.

The reference framework (PythTB 1.8.0, ``/root/reference/pythtb.py``)
is strictly single-particle.  This module adds the standard workhorse
of strong correlations: single-site DMFT for the one-band Hubbard model
on any ``tb_model`` lattice (one correlated orbital per cell, Hubbard
``U``), solved self-consistently on the Matsubara axis with a
finite-temperature exact-diagonalization (Anderson impurity) solver
built on the package's Fock-space machinery (``ed.sector_basis`` /
``ed.build_sector``).

Formalism (fermionic Matsubara frequencies ``w_n = (2n+1) pi / beta``)
----------------------------------------------------------------------

The DMFT cycle maps the lattice problem onto an Anderson impurity
model (AIM) whose hybridization is fixed self-consistently:

1. lattice local Green's function at the correlated orbital ``o``::

       G_loc(iw) = (1/N_k) sum_k [ (iw + mu) I - H(k) - P Sigma(iw) P ]^-1 |_oo

   where ``P`` projects onto orbital ``o`` (both spins of a
   paramagnetic solution see the same Sigma);
2. Weiss field ``G0^-1(iw) = G_loc^-1(iw) + Sigma(iw)``;
3. bath discretization: fit ``G0^-1(iw) ~ iw + mu - eps_d -
   sum_l V_l^2 / (iw - eps_l)`` with ``n_bath`` bath levels
   (weighted least squares on the Matsubara grid, multi-start L-BFGS
   with analytic gradients);
4. ED of the (1 + n_bath)-site AIM: all ``(N_up, N_dn)`` sectors are
   diagonalized exactly and the impurity Green's function is the full
   finite-temperature Lehmann sum

       G_imp(iw) = (1/Z) sum_{ij} |<j| c^dag_{0,up} |i>|^2
                   (e^{-beta E_i} + e^{-beta E_j}) / (iw - (E_j - E_i))

   whose spectral weights obey ``sum A = <{c, c^dag}> = 1`` exactly
   (asserted after every solve);
5. ``Sigma(iw) = G0_AIM^-1(iw) - G_imp^-1(iw)`` with the *fitted*
   (discretized) Weiss field -- the standard consistent ED-DMFT pair --
   then linear mixing, and back to 1.

Exact limits pinned by the test tier (``tests/test_dmft.py``):

* ``U = 0``: the ED Lehmann G_imp equals the analytic noninteracting
  ``1/(iw - eps_eff - Delta(iw))`` at 1e-12 (the whole sector/sign/
  thermal-weight machine, no fit error involved);
* atomic limit (``n_bath = 0``): G_imp equals the exact finite-T atomic
  Green's function ``(1-<n>)/(iw-e) + <n>/(iw-e-U)`` at 1e-12;
* lattice atomic limit (``t = 0``): the converged self-energy is
  ``Sigma(iw) = U/2 + (U^2/4)/(iw)`` at half filling (analytic);
* particle-hole symmetry: half-filled bipartite lattices keep
  ``Re Sigma = U/2`` and ``Re G_loc = 0`` to solver tolerance;
* Bethe lattice: metallic quasiparticle weight at small ``U``,
  Mott-insulating collapse (``Z -> 0``, vanishing double occupancy) at
  large ``U``, monotonic in between.

TPU-first layout
----------------

DMFT's heavy direction is the *lattice* sum -- N_k x n_w pole
evaluations per iteration -- not the impurity diagonalization (ED
sector dimensions are bounded by construction; host float64 eigh is
exact and instantaneous there, and f32 device spectra would feed noise
into the self-consistency).  The k-sum runs as ONE jitted device
program per iteration with no matrix inversions on device: writing
``v`` for the non-correlated orbital block, the Schur complement

    G_oo(k, z) = 1 / ( z - eps_o(k) - Sigma(z)
                       - sum_m |(H_ov W)_m|^2 / (z - lam_m(k)) )

needs only the z-INDEPENDENT eigendecomposition ``H_vv(k) = W lam W^+``
(one batched eigh over k, done once per model, not per iteration) and
an elementwise pole reduction over ``(n_w, N_k, norb-1)`` -- MXU/VPU
work with static shapes, no complex LU under jit.  The Bethe-lattice
reference path integrates the semicircular DOS by Gauss-Chebyshev
quadrature in the same one-program shape.  Everything crossing the
host<->device boundary is ri-packed (the axon runtime cannot transfer
complex buffers).

The bath fit is a tiny (``2 n_bath + 1``)-parameter host optimization
(scipy L-BFGS-B, analytic gradients, particle-hole-symmetric start +
random restarts); fit quality is reported as ``fit_err`` and the
self-consistency residual ``|G_imp - G_loc|`` as ``sc_residual``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from functools import partial

from . import config
from .model import PythtbError
from .ops.hamiltonian import assemble
from .utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx
from . import ed

__all__ = ["solve", "bethe", "matsubara", "band_spectral", "DMFTResult"]


def matsubara(beta, n):
    """First ``n`` positive fermionic Matsubara frequencies
    ``w_m = (2m+1) pi / beta``, float64."""
    if beta <= 0:
        raise PythtbError("matsubara: beta must be positive")
    return (2.0 * np.arange(int(n), dtype=np.float64) + 1.0) * np.pi / beta


# ---------------------------------------------------------------------------
# lattice local Green's function (device)


@partial(jax.jit, static_argnums=(6,))
def _gloc_pole_jit(epso, amps, lams, wn, mu, sigma_ri, mesh=None):
    """Schur-complement local G on the correlated orbital.

    epso: (Nk,) correlated-orbital diagonal eps_o(k)
    amps: (Nk, nv) hybridization weights |(H_ov W)_m|^2  (nv >= 1; a
          zero-padded column is harmless)
    lams: (Nk, nv) eigenvalues of H_vv(k)
    wn:   (nw,) positive Matsubara frequencies
    sigma_ri: (nw, 2) ri-packed Sigma(iw)

    Returns (nw, 2) ri-packed G_loc(iw) = mean_k G_oo(k, iw).

    With a ``mesh``, the N_k pole axis -- the heavy direction of the
    lattice sum (N_k x n_w x nv pole fractions per iteration) -- is
    GSPMD-sharded; the final k-mean is the only collective (a psum
    over the mesh axis).
    """
    from .ops.solver import shard_grid_axis0

    if mesh is not None:
        epso = shard_grid_axis0(epso, mesh)
        amps = shard_grid_axis0(amps, mesh)
        lams = shard_grid_axis0(lams, mesh)
    sig = unpack_cplx(sigma_ri)  # (nw,)
    z = jax.lax.complex(jnp.broadcast_to(mu, wn.shape), wn)  # iw + mu
    # hybridization function F(k, z) = sum_m amps/(z - lam): (nw, Nk)
    den = z[:, None, None] - lams[None, :, :]  # (nw, Nk, nv)
    F = jnp.sum(amps[None, :, :] / den, axis=-1)
    g = 1.0 / (z[:, None] - epso[None, :] - sig[:, None] - F)
    return pack_cplx(jnp.mean(g, axis=1))


@jax.jit
def _gloc_bethe_jit(eps_nodes, weights, wn, mu, sigma_ri):
    """Semicircular-DOS local G by fixed quadrature: (nw, 2) ri."""
    sig = unpack_cplx(sigma_ri)
    z = jax.lax.complex(jnp.broadcast_to(mu, wn.shape), wn)
    g = weights[None, :] / (z[:, None] - eps_nodes[None, :] - sig[:, None])
    return pack_cplx(jnp.sum(g, axis=1))


# ---------------------------------------------------------------------------
# real-frequency kernels (z = w + mu + i eta instead of iw + mu; same
# Schur pole reduction -- see the module docstring's TPU-first layout)


@partial(jax.jit, static_argnums=(7,))
def _gloc_real_pole_jit(epso, amps, lams, omegas, eta, mu, sigma_ri,
                        mesh=None):
    """G_loc(w + i eta) = mean_k G_oo(k, w + mu + i eta): (nw, 2) ri.

    Identical pole reduction to :func:`_gloc_pole_jit` with the
    Matsubara axis replaced by the eta-shifted real axis and the
    real-axis Sigma(w) ri-packed in ``sigma_ri``."""
    from .ops.solver import shard_grid_axis0

    if mesh is not None:
        epso = shard_grid_axis0(epso, mesh)
        amps = shard_grid_axis0(amps, mesh)
        lams = shard_grid_axis0(lams, mesh)
    sig = unpack_cplx(sigma_ri)  # (nw,)
    z = jax.lax.complex(omegas + mu, jnp.broadcast_to(eta, omegas.shape))
    den = z[:, None, None] - lams[None, :, :]  # (nw, Nk, nv)
    F = jnp.sum(amps[None, :, :] / den, axis=-1)
    g = 1.0 / (z[:, None] - epso[None, :] - sig[:, None] - F)
    return pack_cplx(jnp.mean(g, axis=1))


@jax.jit
def _gloc_real_bethe_jit(eps_nodes, weights, omegas, eta, mu, sigma_ri):
    """Semicircular-DOS real-axis local G: (nw, 2) ri."""
    sig = unpack_cplx(sigma_ri)
    z = jax.lax.complex(omegas + mu, jnp.broadcast_to(eta, omegas.shape))
    g = weights[None, :] / (z[:, None] - eps_nodes[None, :] - sig[:, None])
    return pack_cplx(jnp.sum(g, axis=1))


@partial(jax.jit, static_argnums=(7,))
def _aspec_pole_jit(epso, amps, lams, omegas, eta, mu, sigma_ri,
                    mesh=None):
    """Momentum-resolved correlated-orbital spectral function
    ``A_oo(k, w) = -(1/pi) Im G_oo(k, w + mu + i eta)``: (Nk, nw) real
    (only the imaginary part crosses the boundary -- half the d2h of
    the complex map).  Mesh-shardable over the k axis."""
    from .ops.solver import shard_grid_axis0

    if mesh is not None:
        epso = shard_grid_axis0(epso, mesh)
        amps = shard_grid_axis0(amps, mesh)
        lams = shard_grid_axis0(lams, mesh)
    sig = unpack_cplx(sigma_ri)
    z = jax.lax.complex(omegas + mu, jnp.broadcast_to(eta, omegas.shape))
    den = z[:, None, None] - lams[None, :, :]
    F = jnp.sum(amps[None, :, :] / den, axis=-1)  # (nw, Nk)
    g = 1.0 / (z[:, None] - epso[None, :] - sig[:, None] - F)
    return -jnp.imag(g).T / jnp.pi


@partial(jax.jit, static_argnums=(8,))
def _aspec_full_jit(epso, lams, w_ri, b_ri, omegas, eta, mu, sigma_ri,
                    mesh=None):
    """Orbital-resolved spectral map including the spectator block.

    With ``R_m(k, z) = 1/(z - lam_m(k))``, ``b = W^+ H_vo`` and the
    Schur identity ``G_vv = R + R H_vo G_oo H_ov R`` everything is an
    elementwise reduction in the H_vv eigenbasis:

        G_oo       = 1/(z - eps_o - Sigma - sum_m |b_m|^2 R_m)
        c_j        = sum_m W_jm b_m R_m          (= (R H_vo)_j)
        d_j        = sum_m W_jm^* b_m^* R_m      (= (H_ov R)_j)
        G_vv,jj    = sum_m |W_jm|^2 R_m + c_j G_oo d_j

    Returns ``(A_oo (Nk, nw), A_vv (Nk, nw, nv))``.  The einsums feed
    spectral weights (not phases) but stay at HIGHEST precision -- the
    default bf16 pass visibly distorts sharp quasiparticle peaks."""
    from .ops.solver import shard_grid_axis0

    if mesh is not None:
        epso = shard_grid_axis0(epso, mesh)
        lams = shard_grid_axis0(lams, mesh)
        w_ri = shard_grid_axis0(w_ri, mesh)
        b_ri = shard_grid_axis0(b_ri, mesh)
    W = unpack_cplx(w_ri)  # (Nk, nv, nv), columns are eigenvectors
    b = unpack_cplx(b_ri)  # (Nk, nv)
    sig = unpack_cplx(sigma_ri)
    hi = jax.lax.Precision.HIGHEST
    z = jax.lax.complex(omegas + mu, jnp.broadcast_to(eta, omegas.shape))
    R = 1.0 / (z[:, None, None] - lams[None, :, :])  # (nw, Nk, nv)
    F = jnp.sum((jnp.abs(b) ** 2)[None, :, :] * R, axis=-1)
    goo = 1.0 / (z[:, None] - epso[None, :] - sig[:, None] - F)
    c = jnp.einsum("kjm,km,wkm->wkj", W, b, R, precision=hi)
    d = jnp.einsum("kjm,km,wkm->wkj", W.conj(), b.conj(), R,
                   precision=hi)
    gvv = jnp.einsum("kjm,wkm->wkj", jnp.abs(W) ** 2, R,
                     precision=hi) + c * goo[:, :, None] * d
    return (-jnp.imag(goo).T / jnp.pi,
            -jnp.imag(gvv).transpose(1, 0, 2) / jnp.pi)


@jax.jit
def _lehmann_matsubara_jit(amps, poles, wn):
    """sum_p amps_p / (iw - pole_p) for real amplitudes: (nw, 2) ri."""
    den = jax.lax.complex(-poles[None, :],
                          jnp.broadcast_to(wn[:, None],
                                           (wn.shape[0], poles.shape[0])))
    return pack_cplx(jnp.sum(amps[None, :] / den, axis=1))


def _lehmann_matsubara(amps, poles, wn):
    ftype = config.float_dtype()
    out = _lehmann_matsubara_jit(
        jnp.asarray(np.asarray(amps, dtype=np.float64), ftype),
        jnp.asarray(np.asarray(poles, dtype=np.float64), ftype),
        jnp.asarray(np.asarray(wn, dtype=np.float64), ftype),
    )
    return host_unpack(np.asarray(jax.device_get(out)))


@partial(jax.jit, static_argnums=(0,))
def _assemble_ri_jit(static, data, kpts):
    """H(k) batch, ri-packed for the host (complex cannot cross)."""
    return pack_cplx(assemble(static, data, kpts))


def _lattice_pole_data(model, orb, nk):
    """Host+device prep: eps_o(k), hybridization weights/poles from the
    z-independent eigh of the non-correlated block (done ONCE)."""
    if model._nspin != 1:
        raise PythtbError(
            "dmft.solve: spinless-basis lattice models only (spin is "
            "carried by the impurity up/dn doubling; nspin=2 models "
            "would double-count it)")
    if model._dim_k == 0:
        raise PythtbError("dmft.solve needs a periodic model")
    nk = [int(x) for x in (nk if np.ndim(nk) else [nk] * model._dim_k)]
    if len(nk) != model._dim_k:
        raise PythtbError("dmft.solve: need one nk per periodic direction")
    kpts = model.k_uniform_mesh(nk)
    static, data = model._get_finalized()
    ftype = config.float_dtype()
    hk = np.asarray(host_unpack(np.asarray(jax.device_get(
        _assemble_ri_jit(static, data, jnp.asarray(kpts, ftype))))),
        dtype=complex)  # (Nk, norb, norb)
    norb = hk.shape[-1]
    o = int(orb)
    if not 0 <= o < norb:
        raise PythtbError("dmft.solve: orb out of range")
    keep = [i for i in range(norb) if i != o]
    epso = np.real(hk[:, o, o]).astype(np.float64)
    if keep:
        hvv = hk[np.ix_(range(len(hk)), keep, keep)]
        hov = hk[:, o, :][:, keep]  # (Nk, nv)
        lam, W = np.linalg.eigh(hvv)  # host f64 once per model
        amps = np.abs(np.einsum("kv,kvm->km", hov, W)) ** 2
    else:
        lam = np.zeros((len(hk), 1))
        amps = np.zeros((len(hk), 1))
    eps_d = float(np.mean(epso))
    return epso, amps, lam, eps_d


def _gloc_lattice(epso, amps, lams, wn, mu, sigma):
    from .parallel import mesh as pmesh

    ftype = config.float_dtype()
    out = _gloc_pole_jit(
        jnp.asarray(epso, ftype), jnp.asarray(amps, ftype),
        jnp.asarray(lams, ftype), jnp.asarray(wn, ftype),
        jnp.asarray(float(mu), ftype), host_pack(np.asarray(sigma)),
        pmesh.current_mesh())  # resolved at CALL time (stale-mesh gotcha)
    return host_unpack(np.asarray(jax.device_get(out)))


# ---------------------------------------------------------------------------
# bath fit (host, tiny)


def _delta_fit(params, wn):
    """Delta(iw) = sum_l V_l^2/(iw - eps_l) and d/d params.

    params = [eps_d, eps_1..eps_nb, V_1..V_nb].  Returns (eps_d +
    Delta, grad) with grad complex of shape (2 nb + 1, nw)."""
    nb = (len(params) - 1) // 2
    eps_d = params[0]
    e = params[1:1 + nb]
    v = params[1 + nb:]
    iw = 1j * wn
    den = iw[None, :] - e[:, None]  # (nb, nw)
    hyb = (v[:, None] ** 2) / den
    f = eps_d + np.sum(hyb, axis=0)
    grad = np.empty((len(params), len(wn)), dtype=complex)
    grad[0] = 1.0
    grad[1:1 + nb] = hyb / den  # d/d eps_l = V^2/(iw-e)^2
    grad[1 + nb:] = 2.0 * v[:, None] / den
    return f, grad


def _fit_bath(target, wn, n_bath, half_bw, ph_symmetric, seed=0,
              restarts=4, p_prev=None):
    """Weighted least-squares bath fit of ``target(iw) ~ eps_d +
    Delta(iw)`` (the 1/w_n-weighted standard).  Returns (eps_d,
    eps_bath, V_bath, fit_err, params).

    ``p_prev`` warm-starts the optimizer from the previous DMFT
    iteration's bath -- without it the fit hops between near-degenerate
    minima run to run and the self-consistency rattles at the fit-noise
    level instead of converging (measured: a U = 6 Bethe run cycled at
    |dSigma|/|Sigma| ~ 1e-2 forever; warm-started it converges)."""
    from scipy.optimize import minimize

    nb = int(n_bath)
    w = 1.0 / wn  # emphasize low frequencies
    wsum = float(np.sum(w))

    def chi2(p):
        f, grad = _delta_fit(p, wn)
        r = f - target
        val = float(np.sum(w * np.abs(r) ** 2)) / wsum
        g = 2.0 * np.real(grad @ (w * np.conj(r))) / wsum
        return val, g

    rng = np.random.default_rng(seed)
    eps_d0 = float(np.real(target[-1]))  # iw->inf limit of the target
    starts = []
    if p_prev is not None and (len(p_prev) - 1) // 2 == nb:
        starts.append(np.asarray(p_prev, dtype=float))
    if nb > 0:
        # ph-symmetric ladder spanning the band
        lad = np.linspace(-half_bw, half_bw, nb)
        starts.append(np.concatenate([[eps_d0], lad,
                                      np.full(nb, 0.5 * half_bw)]))
        for _ in range(restarts):
            starts.append(np.concatenate(
                [[eps_d0], rng.uniform(-half_bw, half_bw, nb),
                 rng.uniform(0.1, 1.0, nb) * half_bw]))
    elif p_prev is None:
        starts.append(np.array([eps_d0]))
    best = None
    for p0 in starts:
        res = minimize(chi2, p0, jac=True, method="L-BFGS-B",
                       options={"maxiter": 500})
        if best is None or res.fun < best.fun:
            best = res
    p = best.x
    if nb > 0 and ph_symmetric:
        # symmetrize the fitted bath about eps_d (pairs (e, -e) with
        # equal couplings) -- keeps half-filled runs exactly ph
        # symmetric instead of drifting on fit noise
        e = p[1:1 + nb] - p[0]
        v = np.abs(p[1 + nb:])
        order = np.argsort(e)
        e, v = e[order], v[order]
        e_s = 0.5 * (e - e[::-1])
        v_s = np.sqrt(0.5 * (v ** 2 + v[::-1] ** 2))
        p = np.concatenate([[p[0]], e_s + p[0], v_s])
    f, _ = _delta_fit(p, wn)
    fit_err = float(np.max(np.abs(f - target)))
    nb_ = (len(p) - 1) // 2
    return float(p[0]), p[1:1 + nb_].copy(), np.abs(p[1 + nb_:]).copy(), \
        fit_err, p


# ---------------------------------------------------------------------------
# ED Anderson impurity solver (host f64 sectors, device Lehmann sums)


def _aim_solve(eps_eff, U, eps_bath, V_bath, beta, wn, amp_tol=1e-12):
    """Finite-T ED of the AIM; returns (G_imp(iw), observables dict).

    Modes per spin: [impurity, bath_1..bath_nb]; spin blocks decouple
    in the one-body part (paramagnetic, density-density U), so each
    (N_up, N_dn) sector is a product basis and the Lehmann sum runs
    over adjacent (N_up -> N_up + 1) sector pairs for c^dag_{0,up}.
    """
    nb = len(eps_bath)
    ns = nb + 1  # modes per spin
    h1 = np.zeros((ns, ns), dtype=complex)
    h1[0, 0] = eps_eff
    for l in range(nb):
        h1[l + 1, l + 1] = eps_bath[l]
        h1[0, l + 1] = V_bath[l]
        h1[l + 1, 0] = V_bath[l]

    # per-spin sector bases and spectra of the one-body + U problem:
    # basis masks live on 2*ns modes, up block first (modes 0..ns-1),
    # dn block after (ns..2ns-1); U couples n_{0,up} n_{0,dn}
    M = 2 * ns
    h2 = np.zeros((M, M), dtype=complex)
    h2[:ns, :ns] = h1
    h2[ns:, ns:] = h1
    vmat = np.zeros((M, M))
    vmat[0, ns] = vmat[ns, 0] = U

    sectors = {}
    e_min = np.inf
    for nu in range(ns + 1):
        bu = ed.sector_basis(ns, nu)
        for nd in range(ns + 1):
            bd = ed.sector_basis(ns, nd)
            # product masks: up bits | dn bits shifted
            masks = (bu[:, None] | (bd[None, :] << np.uint64(ns))).ravel()
            masks.sort()
            H = ed.build_sector(h2, masks, vmat)
            wv, Vv = np.linalg.eigh(H)  # host f64: sectors are tiny
            sectors[(nu, nd)] = (masks, wv, Vv.T)  # rows are states
            e_min = min(e_min, float(wv[0]))

    # thermal weights relative to the global ground energy
    Z = 0.0
    for (nu, nd), (_, wv, _) in sectors.items():
        Z += float(np.sum(np.exp(-beta * (wv - e_min))))

    # Lehmann over c^dag_{0,up}: (nu, nd) -> (nu+1, nd)
    amps_all, poles_all = [], []
    for (nu, nd), (masks, wv, Vv) in sectors.items():
        if nu + 1 > ns:
            continue
        masks2, wv2, Vv2 = sectors[(nu + 1, nd)]
        valid, new, sign = ed._apply_cdag(masks, 0)
        src = np.nonzero(valid)[0]
        if len(src) == 0:
            continue
        dst = np.searchsorted(masks2, new[src])
        # C[dst, src] = sign: T = V2* C V^T -> <j| c^dag |i>
        T = (Vv2.conj()[:, dst] * sign[None, src]) @ Vv[:, src].T
        bw_i = np.exp(-beta * (wv - e_min))
        bw_j = np.exp(-beta * (wv2 - e_min))
        amp = (np.abs(T) ** 2) * (bw_i[None, :] + bw_j[:, None]) / Z
        pole = wv2[:, None] - wv[None, :]
        amps_all.append(amp.ravel())
        poles_all.append(np.broadcast_to(pole, amp.shape).ravel())
    amps = np.concatenate(amps_all)
    poles = np.concatenate(poles_all)
    total = float(np.sum(amps))
    if abs(total - 1.0) > 1e-8:
        raise PythtbError(
            "dmft ED solver: Lehmann sum rule violated (sum A = %.3e, "
            "must be 1) -- this is a bug, please report" % total)
    keep = amps > amp_tol * max(float(np.max(amps)), 1e-300)
    amps_k, poles_k = amps[keep], poles[keep]
    # put the dropped tail back as weight at its centroid so the sum
    # rule (and the 1/iw tail of G) stays exact
    lost = total - float(np.sum(amps_k))
    if lost > 0:
        cen = float(np.sum(amps[~keep] * poles[~keep]) / max(lost, 1e-300))
        amps_k = np.append(amps_k, lost)
        poles_k = np.append(poles_k, cen)
    g = _lehmann_matsubara(amps_k, poles_k, wn)

    # thermal observables on the impurity
    n_up = docc = 0.0
    for (nu, nd), (masks, wv, Vv) in sectors.items():
        bw = np.exp(-beta * (wv - e_min))
        if not np.any(bw > 1e-300):
            continue
        occ = ed._occupations(masks, M)
        pu = np.abs(Vv) ** 2 @ occ[:, 0]  # <n_{0,up}> per state
        pd2 = np.abs(Vv) ** 2 @ (occ[:, 0] * occ[:, ns])
        n_up += float(np.sum(bw * pu)) / Z
        docc += float(np.sum(bw * pd2)) / Z
    return g, {"n_imp": 2.0 * n_up, "docc": docc,
               "amps": amps_k, "poles": poles_k}


# ---------------------------------------------------------------------------
# results + main loops


class DMFTResult:
    """Converged (or best-effort) DMFT state.

    Attributes: ``wn`` (n_w,) Matsubara grid; ``sigma``, ``g_loc``,
    ``g_imp``, ``g0_inv`` (n_w,) complex; ``mu``, ``eps_d``; ``bath``
    = (eps_bath, V_bath); ``Z`` quasiparticle weight; ``n_imp``
    impurity filling (both spins); ``docc`` double occupancy;
    ``iterations``, ``converged``, ``sc_residual`` (max |G_imp -
    G_loc|), ``fit_err``, ``history`` per-iteration max |dSigma|.
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def spectral(self, omegas, eta=0.05):
        """Real-axis impurity spectral function ``A(w)`` from the exact
        Lehmann poles of the converged AIM (eta-broadened), normalized
        to ``int A dw = 1`` up to the Lorentzian tails."""
        omegas = np.asarray(omegas, dtype=float)
        g = ed._lorentz_sum(self._amps.astype(complex), self._poles,
                            omegas, eta)
        return -np.imag(g) / np.pi

    def quasiparticle_weight(self):
        """Z = [1 - Im Sigma(iw_0)/w_0]^-1 (first-frequency estimate)."""
        return float(1.0 / (1.0 - np.imag(self.sigma[0]) / self.wn[0]))

    # -- real-frequency observables (exact in ED-DMFT: no analytic
    #    continuation is needed -- the converged AIM is a finite pole
    #    model whose Green's function and Weiss field are closed-form
    #    rational functions of z, so Sigma(z) = G0_AIM^-1(z) -
    #    G_imp^-1(z) evaluates anywhere in the upper half plane)

    def _sigma_at(self, z):
        """Self-energy of the converged AIM at arbitrary complex
        ``z`` (grand-canonical frame: z = iw_n on the Matsubara axis,
        z = w + i eta on the real axis with w measured from mu).

        Sigma(z) = z - (eps_d - mu) - sum_l V_l^2/(z - eps_l)
                   - 1/G_imp(z)

        with G_imp(z) the exact finite-T Lehmann sum of the solved
        impurity model.  Pure host float64 complex (tiny)."""
        z = np.asarray(z, dtype=complex)
        g = np.sum(self._amps[None, :]
                   / (z[:, None] - self._poles[None, :]), axis=1)
        eps_b, v_b = self.bath
        hyb = 0.0
        if len(eps_b):
            hyb = np.sum((np.asarray(v_b)[None, :] ** 2)
                         / (z[:, None] - np.asarray(eps_b)[None, :]),
                         axis=1)
        return z - (self.eps_d - self.mu) - hyb - 1.0 / g

    def sigma_real(self, omegas, eta=0.05):
        """Exact real-axis self-energy ``Sigma(w + i eta)`` of the
        converged AIM (see :meth:`_sigma_at`); ``w`` is measured from
        the chemical potential.  Between the discrete Lehmann poles of
        a small-``n_bath`` AIM, ``Im Sigma`` can show spiky structure
        (the standard ED-DMFT discretization artifact); a moderate
        ``eta`` (0.05-0.2 of the bandwidth) smooths it."""
        omegas = np.asarray(omegas, dtype=float)
        return self._sigma_at(omegas + 1j * float(eta))

    def local_spectral(self, omegas, eta=0.05, eta_sigma=None):
        """Interacting LATTICE local spectral function
        ``A_loc(w) = -(1/pi) Im G_loc(w + i eta)`` with the exact
        real-axis ``Sigma(w + i eta_sigma)`` inserted into the same
        lattice sum the self-consistency used (Schur pole form for
        ``solve``, Gauss-Chebyshev quadrature for ``bethe``).  The
        (N_k x n_w) pole reduction runs as one device program (mesh-
        shardable over k).  ``eta_sigma`` defaults to ``eta``."""
        omegas = np.asarray(omegas, dtype=float)
        if eta_sigma is None:
            eta_sigma = eta
        sigma = self._sigma_at(omegas + 1j * float(eta_sigma))
        kind, dat = self._real_axis
        ftype = config.float_dtype()
        if kind == "bethe":
            nodes, weights = dat
            out = _gloc_real_bethe_jit(
                jnp.asarray(nodes, ftype), jnp.asarray(weights, ftype),
                jnp.asarray(omegas, ftype),
                jnp.asarray(float(eta), ftype),
                jnp.asarray(float(self.mu), ftype), host_pack(sigma))
        else:
            from .parallel import mesh as pmesh

            epso, amps, lams = dat
            out = _gloc_real_pole_jit(
                jnp.asarray(epso, ftype), jnp.asarray(amps, ftype),
                jnp.asarray(lams, ftype), jnp.asarray(omegas, ftype),
                jnp.asarray(float(eta), ftype),
                jnp.asarray(float(self.mu), ftype), host_pack(sigma),
                pmesh.current_mesh())
        g = host_unpack(np.asarray(jax.device_get(out)))
        return -np.imag(g) / np.pi


def _filling_from_g(g, wn, beta):
    """n per spin from the Matsubara sum with exact 1/(iw) tail:
    n = 1/2 + (2/beta) sum_n Re[G(iw_n)] + O(tail^2) correction."""
    from scipy.special import polygamma

    re = np.real(g)
    # second-moment tail Re G ~ -c2/wn^2 beyond the grid
    c2 = -re[-1] * wn[-1] ** 2
    n_grid = len(wn)
    tail = float(c2) * (beta / (2.0 * np.pi)) ** 2 \
        * float(polygamma(1, n_grid + 0.5))
    return 0.5 + (2.0 / beta) * (float(np.sum(re)) - tail)


def _dmft_cycle(gloc_fn, U, beta, wn, n_bath, mu, filling, mix,
                max_iter, tol, half_bw, sigma0, seed, ph_symmetric):
    nw = len(wn)
    sigma = np.zeros(nw, dtype=complex) if sigma0 is None \
        else np.asarray(sigma0, dtype=complex).copy()
    if sigma.shape != (nw,):
        raise PythtbError("dmft: sigma0 must match the Matsubara grid")
    mu = float(mu)
    history = []
    g_loc = gloc_fn(mu, sigma)
    info = {"n_imp": np.nan, "docc": np.nan, "amps": None, "poles": None}
    g_imp = g_loc.copy()
    eps_d_fit, eps_b, v_b, fit_err = 0.0, np.zeros(0), np.zeros(0), np.inf
    p_prev = None
    g0_inv = 1.0 / g_loc + sigma
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        if filling is not None:
            # secant/bisection on the lattice filling at fixed Sigma
            mu = _adjust_mu(gloc_fn, sigma, wn, beta, mu, filling,
                            half_bw)
        g_loc = gloc_fn(mu, sigma)
        g0_inv = 1.0 / g_loc + sigma
        # target of the bath fit: eps_d + Delta = iw + mu - G0^-1
        target = 1j * wn + mu - g0_inv
        eps_d_fit, eps_b, v_b, fit_err, p_prev = _fit_bath(
            target, wn, n_bath, half_bw, ph_symmetric, seed=seed,
            p_prev=p_prev)
        # grand-canonical AIM: the fitted eps_l are already pole
        # positions in iw (grand canonical); only the impurity level
        # carries the explicit -mu shift (G0^-1 = iw - (eps_d - mu)
        # - sum V^2/(iw - eps_l) by construction of the fit target)
        g_imp, info = _aim_solve(eps_d_fit - mu, U, eps_b, v_b,
                                 beta, wn)
        # discretized Weiss field consistent with the solved AIM
        hyb = np.sum((v_b[:, None] ** 2)
                     / (1j * wn[None, :] - eps_b[:, None]),
                     axis=0) if n_bath > 0 else 0.0
        g0_inv_aim = 1j * wn - (eps_d_fit - mu) - hyb
        sigma_new = g0_inv_aim - 1.0 / g_imp
        # relative where Sigma is large: an insulating Sigma(iw_0) ~
        # (U^2/4)/w_0 would never meet an absolute tol on its O(1/w)
        # pole-weight wiggles
        d = float(np.max(np.abs(sigma_new - sigma)
                         / (1.0 + np.abs(sigma_new))))
        history.append(d)
        sigma = mix * sigma_new + (1.0 - mix) * sigma
        if d < tol:
            converged = True
            break
    g_loc = gloc_fn(mu, sigma)
    res = DMFTResult(
        wn=wn, sigma=sigma, g_loc=g_loc, g_imp=g_imp, g0_inv=g0_inv,
        mu=mu, eps_d=eps_d_fit, bath=(eps_b, v_b),
        n_imp=info["n_imp"], docc=info["docc"],
        iterations=it, converged=converged,
        sc_residual=float(np.max(np.abs(g_imp - g_loc))),
        fit_err=fit_err, history=np.asarray(history),
        beta=beta, U=U,
        _amps=info["amps"], _poles=info["poles"])
    res.Z = res.quasiparticle_weight()
    if not converged:
        import warnings

        warnings.warn(
            "dmft: not converged after %d iterations (last |dSigma| = "
            "%.2e, tol %.1e); near the Mott coexistence region try "
            "more iterations, smaller mix, or a sigma0 seed from a "
            "nearby U" % (max_iter, history[-1], tol), stacklevel=3)
    return res


def _adjust_mu(gloc_fn, sigma, wn, beta, mu0, target, half_bw,
               iters=40, tol=1e-6):
    lo, hi = mu0 - 2.0 * half_bw - 1.0, mu0 + 2.0 * half_bw + 1.0

    def n_of(m):
        return 2.0 * _filling_from_g(gloc_fn(m, sigma), wn, beta)

    nlo, nhi = n_of(lo), n_of(hi)
    if not (nlo <= target <= nhi):
        raise PythtbError(
            "dmft: target filling %.3f outside the reachable bracket "
            "[%.3f, %.3f]" % (target, nlo, nhi))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        nm = n_of(mid)
        if abs(nm - target) < tol:
            return mid
        if nm < target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def solve(model, U, orb=0, beta=20.0, nk=None, n_matsubara=256,
          n_bath=4, mu=None, filling=None, mix=0.7, max_iter=40,
          tol=1e-5, sigma0=None, seed=0, ph_symmetric=None):
    """Single-site DMFT of the one-band Hubbard model on ``model``.

    The correlated orbital ``orb`` carries the Hubbard ``U`` (both
    spins of a paramagnetic solution); remaining orbitals are treated
    as a non-interacting screening environment entering through the
    exact Schur-complement hybridization (see module docstring).

    :param model: spinless-basis periodic tb_model (nspin == 1)
    :param U: Hubbard repulsion on ``orb``
    :param orb: correlated orbital index
    :param beta: inverse temperature (sets the Matsubara grid AND the
      thermal weights of the ED solver -- this is genuine finite-T)
    :param nk: k-grid per periodic direction (default 32 each)
    :param n_matsubara: positive Matsubara frequencies kept
    :param n_bath: bath levels of the ED impurity model (4-6 typical;
      cost grows as the central-sector dimension cubed)
    :param mu: chemical potential (default ``eps_d + U/2``, the
      particle-hole-symmetric half-filling point of bipartite models)
    :param filling: target total impurity filling in [0, 2]; when
      given, ``mu`` is re-bisected every iteration (``mu`` then only
      seeds the search)
    :param mix: linear mixing of Sigma (1 = no damping)
    :param max_iter, tol: stop when ``max |dSigma| < tol``
    :param sigma0: optional (n_matsubara,) complex Sigma seed (e.g.
      from a converged nearby U -- the standard hysteresis probe)
    :param seed: bath-fit restart seed
    :param ph_symmetric: force (True) or forbid (False) particle-hole
      symmetrization of the bath fit.  Default None auto-detects: on
      only when ``filling == 1`` or ``mu`` sits exactly at the ph
      point ``eps_d + U/2`` (a doped mu must NOT be symmetrized)
    :returns: :class:`DMFTResult`
    """
    if nk is None:
        nk = [32] * model._dim_k
    epso, amps, lams, eps_d = _lattice_pole_data(model, orb, nk)
    wn = matsubara(beta, n_matsubara)
    # energy scale for bath-fit starts and mu brackets: the
    # correlated-orbital dispersion plus the HYBRIDIZATION-WEIGHTED
    # spread of the other bands (a detached spectator band far away
    # must not inflate the fit ladder -- measured: an inert band at
    # +30 blew the Bethe-grade fit up to |dSigma| ~ 1e-2)
    half_bw = 0.5 * (float(np.max(epso)) - float(np.min(epso)))
    wtot = float(np.sum(amps))
    if wtot > 1e-12:
        m1 = float(np.sum(amps * lams)) / wtot
        m2 = float(np.sum(amps * lams ** 2)) / wtot
        half_bw = max(half_bw,
                      abs(m1) + np.sqrt(max(m2 - m1 ** 2, 0.0)))
    half_bw = max(half_bw, 0.5)
    if mu is None:
        mu = eps_d + 0.5 * U
    # particle-hole symmetrization of the bath fit is only valid AT
    # the ph point mu = eps_d + U/2: an explicit doped mu with
    # filling=None used to force it anyway, silently biasing Sigma
    # (advisor finding, round 4).  ph_symmetric=None = auto-detect.
    if ph_symmetric is None:
        scale = max(1.0, abs(float(U)), abs(float(eps_d)))
        ph = (abs(filling - 1.0) < 1e-12 if filling is not None
              else abs(float(mu) - (eps_d + 0.5 * U)) < 1e-9 * scale)
    else:
        ph = bool(ph_symmetric)

    def gloc_fn(m, s):
        return _gloc_lattice(epso, amps, lams, wn, m, s)

    res = _dmft_cycle(gloc_fn, U, beta, wn, n_bath, mu, filling, mix,
                      max_iter, tol, half_bw, sigma0, seed, ph)
    res._real_axis = ("pole", (epso, amps, lams))
    res._model = model
    res._orb = int(orb)
    return res


def bethe(U, D=2.0, beta=20.0, n_matsubara=256, n_bath=4, mu=None,
          filling=None, mix=0.7, max_iter=40, tol=1e-5, sigma0=None,
          seed=0, n_quad=512, ph_symmetric=None):
    """DMFT of the half-bandwidth-``D`` Bethe lattice (semicircular
    DOS) -- the canonical benchmark geometry where DMFT is exact in
    infinite dimensions.  Same knobs and result type as :func:`solve`;
    the DOS integral uses ``n_quad``-node Gauss-Chebyshev quadrature
    (exact for the semicircle weight)."""
    # semicircle rho(e) = (2/(pi D^2)) sqrt(D^2 - e^2):
    # Gauss-Chebyshev U-nodes e_j = D cos(j pi/(n+1)) with weights
    # sin^2 -- integrates rho * f exactly for polynomial f
    j = np.arange(1, n_quad + 1, dtype=np.float64)
    th = j * np.pi / (n_quad + 1)
    nodes = D * np.cos(th)
    weights = (2.0 / (n_quad + 1)) * np.sin(th) ** 2
    weights /= np.sum(weights)
    wn = matsubara(beta, n_matsubara)
    if mu is None:
        mu = 0.5 * U
    # same doped-mu rule as solve(): symmetrize only AT the ph point
    if ph_symmetric is None:
        ph = (abs(filling - 1.0) < 1e-12 if filling is not None
              else abs(float(mu) - 0.5 * U) < 1e-9 * max(1.0, abs(float(U))))
    else:
        ph = bool(ph_symmetric)
    ftype = config.float_dtype()
    nodes_d = jnp.asarray(nodes, ftype)
    weights_d = jnp.asarray(weights, ftype)
    wn_d = jnp.asarray(wn, ftype)

    def gloc_fn(m, s):
        out = _gloc_bethe_jit(nodes_d, weights_d, wn_d,
                              jnp.asarray(float(m), ftype),
                              host_pack(np.asarray(s)))
        return host_unpack(np.asarray(jax.device_get(out)))

    res = _dmft_cycle(gloc_fn, U, beta, wn, n_bath, mu, filling, mix,
                      max_iter, tol, 0.5 * D, sigma0, seed, ph)
    res._real_axis = ("bethe", (nodes, weights))
    res._model = None
    res._orb = None
    return res


# ---------------------------------------------------------------------------
# momentum-resolved real-frequency spectra (ARPES-style maps)


def band_spectral(result, kpts, omegas, eta=0.05, eta_sigma=None,
                  resolved=False, device=False):
    """Momentum-resolved interacting spectral function ``A(k, w)``
    along an explicit k-list -- the ARPES observable of the converged
    DMFT solution:

        A_oo(k, w) = -(1/pi) Im [ w + i eta + mu - eps_o(k)
                                  - F(k, w + i eta) - Sigma(w) ]^-1

    with the EXACT real-axis ``Sigma(w + i eta_sigma)`` of the ED
    impurity solver (see :meth:`DMFTResult.sigma_real` -- rational in
    z, no analytic continuation) and ``F`` the Schur hybridization of
    the non-correlated orbitals.  The (N_k x n_w) evaluation is one
    device program, mesh-shardable over k.

    :param result: a :class:`DMFTResult` from :func:`solve` (the
      Bethe-lattice solver has no k-space; use
      :meth:`DMFTResult.local_spectral` there)
    :param kpts: (nkp, dim_k) reduced k-points (e.g. from
      ``model.k_path``)
    :param omegas: (nw,) real frequencies measured from mu
    :param eta: spectral broadening of the lattice resolvent
    :param eta_sigma: broadening at which Sigma is evaluated
      (default: ``eta``)
    :param resolved: when True also return the spectator-orbital
      weights -- shape (nkp, nw, norb), orbital order of the model,
      via the Schur identity G_vv = R + R H_vo G_oo H_ov R evaluated
      in the H_vv eigenbasis (no complex LU on device)
    :param device: return the raw device array(s) instead of host
      numpy -- for chaining into further on-device reductions without
      paying the host transfer (through the tunneled axon runtime a
      full-resolution resolved map is d2h-BOUND: a 1001 x 2001 x 8
      f32 map is 64 MB at ~25 MB/s, dwarfing the ~ms device compute).
      With ``resolved`` this is the ``(A_oo, A_vv)`` kernel pair
      (spectator block NOT yet reordered into model orbital order)
    :returns: (nkp, nw) array ``A_oo``, or (nkp, nw, norb) when
      ``resolved``

    Reference: PythTB 1.8.0 is single-particle and has no interacting
    spectra; this composes the package's DMFT state with the
    reference-parity H(k) assembly (pythtb.py:874-925).
    """
    from .parallel import mesh as pmesh

    if getattr(result, "_model", None) is None:
        raise PythtbError(
            "dmft.band_spectral needs a lattice DMFTResult (from "
            "dmft.solve); Bethe results have no k-space -- use "
            "result.local_spectral")
    model, o = result._model, result._orb
    omegas = np.asarray(omegas, dtype=float)
    if eta_sigma is None:
        eta_sigma = eta
    sigma = result._sigma_at(omegas + 1j * float(eta_sigma))
    kpts = np.asarray(kpts, dtype=float)
    if kpts.ndim == 1:
        kpts = kpts[:, None] if model._dim_k == 1 else kpts[None, :]
    static, data = model._get_finalized()
    ftype = config.float_dtype()
    hk = np.asarray(host_unpack(np.asarray(jax.device_get(
        _assemble_ri_jit(static, data, jnp.asarray(kpts, ftype))))),
        dtype=complex)  # (nkp, norb, norb)
    norb = hk.shape[-1]
    keep = [i for i in range(norb) if i != o]
    epso = np.real(hk[:, o, o]).astype(np.float64)
    if keep:
        hvv = hk[np.ix_(range(len(hk)), keep, keep)]
        hvo = hk[:, keep, o]  # (nkp, nv) column H_vo
        lam, W = np.linalg.eigh(hvv)  # host f64, once per call
        b = np.einsum("kvm,kv->km", W.conj(), hvo)
    else:
        lam = np.zeros((len(hk), 1))
        W = np.ones((len(hk), 1, 1), dtype=complex)
        b = np.zeros((len(hk), 1), dtype=complex)
    mesh = pmesh.current_mesh()
    args = (jnp.asarray(omegas, ftype), jnp.asarray(float(eta), ftype),
            jnp.asarray(float(result.mu), ftype), host_pack(sigma))
    if not resolved:
        out = _aspec_pole_jit(
            jnp.asarray(epso, ftype),
            jnp.asarray(np.abs(b) ** 2, ftype),
            jnp.asarray(lam, ftype), *args, mesh)
        if device:
            return out
        return np.asarray(jax.device_get(out), dtype=np.float64)
    pair = _aspec_full_jit(
        jnp.asarray(epso, ftype), jnp.asarray(lam, ftype),
        host_pack(W), host_pack(b), *args, mesh)
    if device:
        return pair
    aoo, avv = jax.device_get(pair)
    A = np.zeros((len(hk), len(omegas), norb))
    A[:, :, o] = np.asarray(aoo, dtype=np.float64)
    if keep:
        A[:, :, keep] = np.asarray(avv, dtype=np.float64)
    return A
