"""Projection-based Wannier interpolation, self-contained.

The reference can only *import* Wannier90 output (pythtb.py:3208-3759);
producing a Wannier-interpolated band structure requires running
Wannier90 itself.  This module implements the one-shot projection
method natively: solve the model on a coarse uniform BZ grid, project a
chosen band group onto trial vectors (Lowdin / polar orthonormalization
-- the "one-shot" limit of Marzari-Vanderbilt), Fourier-transform the
projected Hamiltonian to real space, and interpolate to arbitrary k.
For an isolated band group the projected gauge is smooth, so the
effective hoppings H(R) decay exponentially and a modest coarse grid
interpolates the group's bands to high accuracy anywhere in the BZ --
the standard Wannier-interpolation workflow, with zero external tools.

Formulation.  Work in the lattice-periodic convention: Convention-I
eigenvector coefficients c_alpha(k) are rephased to
``c'_alpha = exp(2j*pi*k.t_alpha) * c_alpha`` so every k-dependent
object below is exactly periodic under k -> k+G (the Convention-II
Hamiltonian H'(k) = sum_R t exp(2j*pi*k.R) is G-periodic, so its
spectral functions are too).  With trial vectors g (nw x nsta) the
projection ``A(k) = <u'_n(k)|g_m>`` is polar-decomposed, V =
unitarize(A); the projected Hamiltonian ``B(k) = V^H diag(E_occ) V`` is
smooth and periodic, its Fourier coefficients

    H(R) = (1/Nk) sum_k exp(-2j*pi*k.R) B(k)

decay exponentially (isolated group, nonsingular projection), and

    E_int(k') = eigvalsh(sum_R exp(2j*pi*k'.R) H(R))

reproduces the group's bands: exactly at coarse-grid points (B is
similar to diag(E) there), and to exponential accuracy in between.
Everything -- coarse solve, rephasing, projection, polar, Fourier
transforms, interpolation eigh -- is two compiled device programs (one
at construction, one per k-batch).

When the chosen group is NOT Wannierizable with the given trials
(e.g. a nonzero-Chern band, where no smooth periodic gauge exists), the
projection necessarily becomes (near-)singular somewhere on the grid;
the smallest projection singular value is reported and warned about.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .model import PythtbError
from .utils.xfer import host_pack, pack_cplx, unpack_cplx

__all__ = ["WannierInterpolator", "interpolator", "disentangled_interpolator"]


def _r_grid(nk, like_np=False):
    """Centered integer R-lattice for the nk coarse grid: (NR, dim),
    components in [-n//2, n - n//2).  The SINGLE home of the R ordering
    -- _build_jit's DFT, _bands_jit's inverse transform, and the public
    r_vectors() must all index H(R) identically."""
    xp = np if like_np else jnp
    grids = xp.meshgrid(*[xp.arange(n) - (n // 2) for n in nk], indexing="ij")
    return xp.stack([g.ravel() for g in grids], axis=-1)



# -- finite-difference b-shells (Mostofi et al., CPC 178, 685 (2008)) --


def _bshells(lat, per, nk, search=3, tol=1e-6):
    """Nearest-neighbor shells of the coarse k-grid with completeness
    weights: returns ``(b_int, b_cart, w_b)`` where ``b_int`` (nb,
    dim_k) are integer grid offsets, ``b_cart`` (nb, dim_r) are the
    Cartesian b-vectors, and ``w_b`` satisfies the B1 condition
    ``sum_b w_b b_i b_j = delta_ij`` restricted to the periodic span.

    The gradient discretization behind every MV/SMV quantity (spreads,
    centers, gauge gradients) needs finite-difference vectors whose
    weighted outer products resolve the identity; shells of equal-length
    b's are added in increasing length until a least-squares solve for
    the shell weights closes the condition (the standard Wannier90
    construction, re-derived for arbitrary dim_k and row-vector
    lattices)."""
    lat = np.asarray(lat, dtype=np.float64)
    per = list(per)
    A = lat[per, :]  # (dim_k, dim_r) periodic lattice rows
    dim_k, dim_r = A.shape
    # reciprocal rows within the span: G @ A.T = 2 pi I
    G = 2.0 * np.pi * np.linalg.solve(A @ A.T, A)
    # orthonormal basis of the span (for the B1 condition)
    Q = np.linalg.svd(G, full_matrices=False)[2]  # (dim_k, dim_r)

    rng = [np.arange(-search, search + 1)] * dim_k
    ms = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, dim_k)
    ms = ms[np.any(ms != 0, axis=1)]
    bc = (ms / np.asarray(nk, dtype=np.float64)) @ G  # (M, dim_r)
    ln = np.linalg.norm(bc, axis=1)
    order = np.argsort(ln, kind="stable")
    ms, bc, ln = ms[order], bc[order], ln[order]

    # group into shells by length
    shells = []
    i = 0
    while i < len(ln):
        j = i
        while j < len(ln) and ln[j] <= ln[i] * (1.0 + tol):
            j += 1
        shells.append((ms[i:j], bc[i:j]))
        i = j

    # B1 condition in span coordinates: for each shell s,
    # sum_{b in s} (b.q_i)(b.q_j) summed with weight w_s == delta_ij
    npair = dim_k * (dim_k + 1) // 2
    iu = np.triu_indices(dim_k)
    target = np.eye(dim_k)[iu]

    rows = []  # (npair,) per accepted shell
    acc = []
    for s_ms, s_bc in shells:
        bq = s_bc @ Q.T  # (ns, dim_k)
        outer = np.einsum("ni,nj->ij", bq, bq)[iu]
        # skip shells linearly dependent on the accepted ones
        trial_rows = rows + [outer]
        Mt = np.stack(trial_rows, axis=1)  # (npair, ns+1)
        if np.linalg.matrix_rank(np.stack(trial_rows, axis=0), tol=1e-10) == len(rows):
            continue
        rows = trial_rows
        acc.append((s_ms, s_bc))
        w, res, _, _ = np.linalg.lstsq(Mt, target, rcond=None)
        if np.linalg.norm(Mt @ w - target) < 1e-8 and np.all(
            np.asarray(w) > 1e-12
        ):
            b_int = np.concatenate([a[0] for a in acc], axis=0)
            b_cart = np.concatenate([a[1] for a in acc], axis=0)
            w_b = np.concatenate(
                [np.full(len(a[0]), float(wi)) for a, wi in zip(acc, w)]
            )
            return b_int.astype(np.int64), b_cart, w_b
    raise PythtbError(
        "could not find finite-difference shells satisfying the B1 "
        "completeness condition for this lattice/grid (raise `search`)"
    )


def _neighbor_index(nk, b_int):
    """(Nk, nb) flat row-major index of grid point k + b (periodic)."""
    nk = np.asarray(nk, dtype=np.int64)
    grids = np.meshgrid(*[np.arange(n) for n in nk], indexing="ij")
    idx = np.stack([g.ravel() for g in grids], axis=-1)  # (Nk, dim)
    nb = (idx[:, None, :] + b_int[None, :, :]) % nk[None, None, :]
    strides = np.concatenate([np.cumprod(nk[::-1])[::-1][1:], [1]])
    return (nb * strides[None, None, :]).sum(-1)


# -- MV maximal localization + SMV disentanglement device kernels -----


def _expm_antiherm(G):
    """exp(G) for anti-Hermitian (..., n, n) G via eigh of iG."""
    lam, W = jnp.linalg.eigh(1.0j * G)
    Wh = jnp.conj(jnp.swapaxes(W, -1, -2))
    return jnp.einsum(
        "...ij,...j,...jk->...ik", W, jnp.exp(-1.0j * lam), Wh,
        precision=jax.lax.Precision.HIGHEST,
    )


def _spread_terms(M, w_b, b_cart):
    """Centers and spread pieces from current overlaps M (B, nb, n, n).

    Returns (rbar (dc, n), omega_i, omega_tilde): the MV decomposition
    Omega = Omega_I (gauge invariant) + Omega_tilde (gauge dependent),
    with centers rbar_n = -(1/N) sum_kb w_b b Im ln M_nn."""
    N = M.shape[0]
    n = M.shape[-1]
    Mnn = jnp.diagonal(M, axis1=-2, axis2=-1)  # (B, nb, n)
    ang = jnp.angle(Mnn)
    rbar = -(jnp.einsum("b,bd,kbn->dn", w_b, b_cart, ang) / N)
    q = ang + jnp.einsum("bd,dn->bn", b_cart, rbar)[None]  # (B, nb, n)
    absM2 = jnp.abs(M) ** 2
    sum_all = jnp.sum(absM2, axis=(-1, -2))  # (B, nb)
    sum_diag = jnp.sum(jnp.abs(Mnn) ** 2, axis=-1)
    omega_i = jnp.sum(w_b[None, :] * (n - sum_all)) / N
    omega_od = jnp.sum(w_b[None, :] * (sum_all - sum_diag)) / N
    omega_d = jnp.sum(w_b[None, :, None] * q**2) / N
    return rbar, omega_i, omega_od + omega_d


def _mv_gradient(M, w_b, b_cart, rbar):
    """MV steepest-descent direction dOmega/dW (anti-Hermitian, per k)."""
    Mnn = jnp.diagonal(M, axis1=-2, axis2=-1)  # (B, nb, n)
    q = jnp.angle(Mnn) + jnp.einsum("bd,dn->bn", b_cart, rbar)[None]
    R = M * jnp.conj(Mnn)[:, :, None, :]  # M_mn conj(M_nn)
    T = M / jnp.where(jnp.abs(Mnn) < 1e-12, 1.0, Mnn)[:, :, None, :] * (
        q[:, :, None, :]
    )
    A_ = (R - jnp.conj(jnp.swapaxes(R, -1, -2))) / 2.0
    S_ = (T + jnp.conj(jnp.swapaxes(T, -1, -2))) / 2.0j
    return 4.0 * jnp.einsum("b,kbmn->kmn", w_b, A_ - S_)


def _gauge_overlaps(M0, U, nbr):
    """Rotate raw overlaps into the current gauge:
    M(k,b) = U(k)^H M0(k,b) U(k+b)."""
    hp = jax.lax.Precision.HIGHEST
    Ukb = U[nbr]  # (B, nb, n, n)
    return jnp.einsum(
        "kmi,kbmn,kbnj->kbij", jnp.conj(U), M0, Ukb, precision=hp
    )


def _mv_localize(M0, nbr, w_b, b_cart, steps, alpha):
    """Marzari-Vanderbilt spread minimization: fixed-length scan of
    heavy-ball gradient steps U(k) <- U(k) exp(dW), dW = mu dW_prev +
    eps G(k), with bold-driver step control (eps grows 1.1x while the
    spread falls, halves -- and the momentum resets -- on overshoot).
    Plain steepest descent stalls at large grids (the per-k gauge modes
    decouple and converge at the rate of the softest one); momentum
    recovers the missing factor.  Returns (U, omega_history (steps,),
    final (rbar, Oi, Ot))."""
    B, nb, n, _ = M0.shape
    eps0 = alpha / (4.0 * jnp.sum(w_b))
    mu = 0.9
    U0 = jnp.broadcast_to(jnp.eye(n, dtype=M0.dtype), (B, n, n))
    dW0 = jnp.zeros((B, n, n), M0.dtype)

    def step(carry, _):
        U, dW, eps, om_prev = carry
        M = _gauge_overlaps(M0, U, nbr)
        rbar, oi, ot = _spread_terms(M, w_b, b_cart)
        om = oi + ot
        up = om > om_prev
        eps = jnp.where(up, eps * 0.5, eps * 1.1)
        eps = jnp.minimum(eps, 20.0 * eps0)
        dW = jnp.where(up, 0.0, mu) * dW
        G = _mv_gradient(M, w_b, b_cart, rbar)
        # sign convention: with A/S as defined here, Omega decreases
        # along +G (checked against finite differences in the tests)
        dW = dW + eps * G
        U = jnp.einsum(
            "kij,kjl->kil", U, _expm_antiherm(dW),
            precision=jax.lax.Precision.HIGHEST,
        )
        return (U, dW, eps, om), om

    (U, _, _, _), hist = jax.lax.scan(
        step, (U0, dW0, eps0, jnp.asarray(jnp.inf, jnp.float64 if
              M0.dtype == jnp.complex128 else jnp.float32)), None,
        length=steps,
    )
    M = _gauge_overlaps(M0, U, nbr)
    rbar, oi, ot = _spread_terms(M, w_b, b_cart)
    return U, hist, (rbar, oi, ot)


def _smv_disentangle(S_full, nbr, w_b, win_mask, froz_mask, nw, steps,
                     mixing, F0):
    """Souza-Marzari-Vanderbilt subspace selection: at every grid point
    choose the nw-dimensional subspace of the window bands that
    maximizes sum_b w_b Tr[P(k) P(k+b)] (minimal Omega_I), keeping the
    frozen bands exactly.  Seeded from ``F0`` (projected trials).

    Works on the (nsta-dim) band basis with masks instead of ragged
    windows: the self-consistency matrix is deflated so frozen bands
    are EXACT eigenvectors with a large eigenvalue and out-of-window
    bands exact eigenvectors with a large negative one -- top-nw eigh
    then returns frozen + optimal-complement, whatever the per-k frozen
    count is, in one fixed-shape batched program.

    Returns F (B, nsta, nw) isometries (columns = subspace states in
    the band basis; support exactly inside the window)."""
    hp = jax.lax.Precision.HIGHEST
    B, nb, ns, _ = S_full.shape
    # the deflation boost must dominate the window block: ||Z|| <=
    # sum_b w_b (projector norms <= 1), and w_b grows like the squared
    # lattice constant times nk^2 -- a fixed constant silently violates
    # the frozen window for large cells / fine grids
    BIG = 10.0 * (jnp.sum(w_b).real + 1.0)

    def top_nw(Z):
        _, V = jnp.linalg.eigh(Z)
        return V[..., -nw:]  # (B, ns, nw) ascending eigh -> last nw

    win = win_mask.astype(S_full.dtype)  # (B, ns)
    froz = froz_mask.astype(S_full.dtype)
    F = F0

    def step(carry, _):
        F, Zold = carry
        P = jnp.einsum("ksm,ktm->kst", F, jnp.conj(F), precision=hp)
        Pkb = P[nbr]  # (B, nb, ns, ns)
        Znew = jnp.einsum(
            "b,kbst,kbtu,kbvu->ksv", w_b, S_full, Pkb, jnp.conj(S_full),
            precision=hp,
        )
        Z = mixing * Znew + (1.0 - mixing) * Zold
        Z = (Z + jnp.conj(jnp.swapaxes(Z, -1, -2))) / 2.0
        # deflate: window-restrict, freeze exactly, expel out-of-window
        Qc = win[:, :, None] * win[:, None, :] * (
            (1.0 - froz)[:, :, None] * (1.0 - froz)[:, None, :]
        )
        Zd = Z * Qc
        Zd = Zd + BIG * jnp.einsum(
            "ks,st->kst", froz, jnp.eye(ns, dtype=S_full.dtype)
        )
        Zd = Zd - BIG * jnp.einsum(
            "ks,st->kst", (1.0 - win), jnp.eye(ns, dtype=S_full.dtype)
        )
        F = top_nw(Zd)
        return (F, Z), jnp.einsum("ksm,ksm->", F, jnp.conj(F)).real

    Z0 = jnp.zeros((B, ns, ns), S_full.dtype)
    (F, _), _ = jax.lax.scan(step, (F, Z0), None, length=steps)
    return F


@partial(jax.jit, static_argnums=(0, 2, 5, 6))
def _build_jit(static, data, nk, t_orb, trial_ri, occ, auto_trial):
    """Coarse solve -> rephase -> project -> polar -> B(k) -> H(R).

    Returns (hr_packed (NR, nw, nw, 2) with NR = prod(nk), min proj
    singular value, evals at grid (B, nocc))."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    dim = len(nk)
    kpts = device_uniform_grid(tuple(nk), jnp.zeros((dim,)))  # (B, dim), k=j/n
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # vecs rows = states, (B, nsta, nsta)
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)
    e = evals[:, occ_idx]  # (B, nocc)
    u = vecs[:, occ_idx, :]  # (B, nocc, nsta)

    # Convention-II rephasing: c'_alpha = exp(2j*pi*k.t_alpha) c_alpha
    # (t_orb: (dim, nsta) orbital positions along the periodic axes)
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum("bd,ds->bs", kpts, t_orb,
                                            precision=jax.lax.Precision.HIGHEST))
    u = u * ph[:, None, :]

    hp = jax.lax.Precision.HIGHEST
    if auto_trial:
        # natural trial orbitals: top eigenvectors of the grid-averaged
        # band projector (the fixed vectors with maximal mean overlap
        # with the group -- a one-shot SCDM-like choice)
        Q = jnp.einsum("bns,bnt->st", u, jnp.conj(u), precision=hp) / u.shape[0]
        _, qv = jnp.linalg.eigh((Q + jnp.conj(Q.T)) / 2)
        g = qv[:, -len(occ):].T  # (nw, nsta)
    else:
        g = unpack_cplx(trial_ri)  # (nw, nsta)
    A = jnp.einsum("bns,ms->bnm", jnp.conj(u), g, precision=hp)  # (B, nocc, nw)
    U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    V = jnp.matmul(U, Vh, precision=hp)  # (B, nocc, nw) isometry (nocc == nw)
    B = jnp.einsum(
        "bnm,bn,bnl->bml", jnp.conj(V), e, V, precision=hp
    )  # (B, nw, nw) projected Hamiltonian, Hermitian

    # H(R) over the centered R grid via an explicit small DFT
    Rs = _r_grid(nk).astype(kpts.dtype)  # (NR, dim)
    w = jnp.exp(-2.0j * jnp.pi * jnp.einsum("rd,bd->rb", Rs, kpts, precision=hp))
    hr = jnp.einsum("rb,bml->rml", w, B, precision=hp) / B.shape[0]
    return pack_cplx(hr), jnp.min(s), e


@partial(jax.jit, static_argnums=(0, 2, 4))
def _grid_states_jit(static, data, nk, t_orb, occ):
    """Convention-II occupied states on the coarse grid, ri-packed --
    the probe for host-side greedy anchor selection."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    kpts = device_uniform_grid(tuple(nk), jnp.zeros((len(nk),)))
    H = assemble(static, data, kpts)
    _, vecs = eigh_batched(H)
    u = vecs[:, jnp.asarray(occ, dtype=jnp.int32), :]
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum(
        "bd,ds->bs", kpts, t_orb, precision=jax.lax.Precision.HIGHEST))
    return pack_cplx(u * ph[:, None, :])


def _greedy_anchor_trials(u, nw):
    """Orbital anchors chosen greedily to maximize the WORST-k smallest
    singular value of the projection (host-side; u is (B, no, nsta)
    complex).  The automatic fallback when the mean-projector trials
    degenerate: e.g. for silicon valence the grid-averaged projector is
    ~I/2 (the two sublattices carry equal weight), so its eigenvectors
    are arbitrary and project near-singularly, while greedily-chosen
    one-hot orbital anchors give sv ~ 0.4."""
    import itertools
    from math import comb

    B, no, nsta = u.shape
    cols = np.conj(u)  # candidate column s of A(k) = conj(u[:, :, s])

    def score(sel):
        A = cols[:, :, list(sel)]
        return float(np.linalg.svd(A, compute_uv=False).min())

    if comb(nsta, nw) <= 512:
        # exhaustive over orbital subsets (greedy is myopic: its first
        # pick conditions the rest and can land far from the optimum)
        best = max(itertools.combinations(range(nsta), nw), key=score)
    else:
        sel = []
        for _ in range(nw):
            cand = [s for s in range(nsta) if s not in sel]
            sel.append(max(cand, key=lambda s: score(sel + [s])))
        best = tuple(sel)
    g = np.zeros((nw, nsta), dtype=complex)
    for m, s in enumerate(best):
        g[m, s] = 1.0
    return g, score(best)


def _hr_from_B(Bk, nk, kpts):
    """Fourier coefficients H(R) of the (B, nw, nw) projected
    Hamiltonian over the centered R grid (shared with _build_jit)."""
    hp = jax.lax.Precision.HIGHEST
    Rs = _r_grid(nk).astype(kpts.dtype)
    w = jnp.exp(-2.0j * jnp.pi * jnp.einsum("rd,bd->rb", Rs, kpts, precision=hp))
    return jnp.einsum("rb,bml->rml", w, Bk, precision=hp) / Bk.shape[0]


def _project_gauge(u, trial_ri, auto_trial):
    """Lowdin-projected initial gauge: trials -> A -> polar V0.

    ``u`` (B, n_src, nsta) are source states (bands of an isolated
    group, or disentangled subspace states).  Returns (V0, min_sv, g)."""
    hp = jax.lax.Precision.HIGHEST
    nw = u.shape[1]
    if auto_trial:
        Q = jnp.einsum("bns,bnt->st", u, jnp.conj(u), precision=hp) / u.shape[0]
        _, qv = jnp.linalg.eigh((Q + jnp.conj(Q.T)) / 2)
        g = qv[:, -nw:].T
    else:
        g = unpack_cplx(trial_ri)
    A = jnp.einsum("bns,ms->bnm", jnp.conj(u), g, precision=hp)
    U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    V0 = jnp.matmul(U, Vh, precision=hp)
    return V0, jnp.min(s), g


def _finish_gauge(u, V, e_or_h, nk, kpts, diag_energies):
    """B(k) in the final gauge -> H(R); plus the re-projection quality:
    min singular value of <u|g_wf> with g_wf the localized Wannier
    vectors themselves (a smooth gauge scores ~1)."""
    hp = jax.lax.Precision.HIGHEST
    if diag_energies:
        Bk = jnp.einsum("bnm,bn,bnl->bml", jnp.conj(V), e_or_h, V, precision=hp)
    else:
        Bk = jnp.einsum("bnm,bnl,blp->bmp", jnp.conj(V), e_or_h, V, precision=hp)
    hr = _hr_from_B(Bk, nk, kpts)
    g_wf = jnp.einsum("knm,kns->ms", V, u) / u.shape[0]
    # orthonormalize the WF vectors before scoring (their norms dip
    # below 1 exactly when the gauge is non-smooth)
    A2 = jnp.einsum("bns,ms->bnm", jnp.conj(u), g_wf, precision=hp)
    s2 = jnp.linalg.svd(A2, compute_uv=False)
    return hr, jnp.min(s2)


@partial(jax.jit, static_argnums=(0, 2, 5, 6, 10))
def _build_loc_jit(static, data, nk, t_orb, trial_ri, occ, auto_trial,
                   nbr, w_b, b_cart, mv_steps, alpha):
    """Isolated-group build with MV maximal localization: coarse solve
    -> rephase -> project -> MV scan -> H(R).  Returns (hr_packed,
    min proj sv, e grid, spread history, centers, Omega_I, Omega_tilde,
    final re-projection sv)."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    dim = len(nk)
    kpts = device_uniform_grid(tuple(nk), jnp.zeros((dim,)))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)
    e = evals[:, occ_idx]
    u = vecs[:, occ_idx, :]
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum("bd,ds->bs", kpts, t_orb,
                                            precision=hp))
    u = u * ph[:, None, :]

    V0, min_s, _ = _project_gauge(u, trial_ri, auto_trial)
    # raw neighbor overlaps of the band group, then into the projected
    # gauge for the MV scan
    S = jnp.einsum("kms,kbns->kbmn", jnp.conj(u), u[nbr], precision=hp)
    M0 = jnp.einsum("kmi,kbmn,kbnj->kbij", jnp.conj(V0), S, V0[nbr],
                    precision=hp)
    U, hist, (rbar, oi, ot) = _mv_localize(M0, nbr, w_b, b_cart,
                                           mv_steps, alpha)
    V = jnp.matmul(V0, U, precision=hp)
    hr, final_sv = _finish_gauge(u, V, e, nk, kpts, True)
    # real-space Wannier vectors over the centered R grid -- the trials
    # for a finer-grid refinement pass (multigrid).  NOTE the sign:
    # w_m(R) = (1/N) sum_k e^{+2 pi i k.R} (V^T u)_m, while the trial
    # projection below uses e^{-2 pi i k.R} (their product is the
    # Fourier inversion delta, so A(k) == V(k) exactly on this grid).
    Rs = _r_grid(nk).astype(kpts.dtype)
    wph = jnp.exp(2.0j * jnp.pi * jnp.einsum("rd,bd->rb", Rs, kpts,
                                             precision=hp))
    wR = jnp.einsum("rb,bnm,bns->rms", wph, V, u, precision=hp) / V.shape[0]
    return pack_cplx(hr), min_s, e, hist, rbar, oi, ot, final_sv, pack_cplx(wR)


@partial(jax.jit, static_argnums=(0, 2, 5, 6, 10))
def _build_fine_jit(static, data, nk, t_orb, wR_ri, occ, nk_coarse,
                    nbr, w_b, b_cart, mv_steps, alpha):
    """Multigrid refinement: re-solve on the fine ``nk`` grid and
    project onto the COARSE run's real-space Wannier vectors ``wR``
    (support on the coarse centered R grid -- k-dependent trials
    G(k) = sum_R wR e^{-2 pi i k.R}), then polish with a short MV scan.
    The coarse gauge's basin is inherited, so the fine optimization
    starts smooth and converges in tens of steps."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    dim = len(nk)
    kpts = device_uniform_grid(tuple(nk), jnp.zeros((dim,)))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)
    occ_idx = jnp.asarray(occ, dtype=jnp.int32)
    e = evals[:, occ_idx]
    u = vecs[:, occ_idx, :]
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum("bd,ds->bs", kpts, t_orb,
                                            precision=hp))
    u = u * ph[:, None, :]

    wR = unpack_cplx(wR_ri)  # (NRc, nw, nsta)
    Rs = _r_grid(nk_coarse).astype(kpts.dtype)
    tph = jnp.exp(-2.0j * jnp.pi * jnp.einsum("bd,rd->br", kpts, Rs,
                                              precision=hp))
    G = jnp.einsum("br,rms->bms", tph, wR, precision=hp)  # (B, nw, nsta)
    A = jnp.einsum("bns,bms->bnm", jnp.conj(u), G, precision=hp)
    Uu, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    V0 = jnp.matmul(Uu, Vh, precision=hp)
    min_s = jnp.min(s)

    S = jnp.einsum("kms,kbns->kbmn", jnp.conj(u), u[nbr], precision=hp)
    M0 = jnp.einsum("kmi,kbmn,kbnj->kbij", jnp.conj(V0), S, V0[nbr],
                    precision=hp)
    U, hist, (rbar, oi, ot) = _mv_localize(M0, nbr, w_b, b_cart,
                                           mv_steps, alpha)
    V = jnp.matmul(V0, U, precision=hp)
    hr, final_sv = _finish_gauge(u, V, e, nk, kpts, True)
    return pack_cplx(hr), min_s, e, hist, rbar, oi, ot, final_sv


@partial(jax.jit, static_argnums=(0, 2, 5, 6, 11, 13, 15))
def _build_disent_jit(static, data, nk, t_orb, trial_ri, nw, auto_trial,
                      nbr, w_b, b_cart, windows, dis_steps, mixing,
                      mv_steps, alpha, has_frozen):
    """Entangled build: coarse solve -> rephase -> SMV disentangle an
    nw-dim subspace inside the energy window (frozen window kept
    exactly) -> project -> optional MV scan -> H(R).

    ``windows`` = (emin, emax, fmin, fmax) float array; frozen window
    used only when ``has_frozen``."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    dim = len(nk)
    kpts = device_uniform_grid(tuple(nk), jnp.zeros((dim,)))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # (B, nsta), (B, nsta, nsta)
    ph = jnp.exp(2.0j * jnp.pi * jnp.einsum("bd,ds->bs", kpts, t_orb,
                                            precision=hp))
    uall = vecs * ph[:, None, :]

    emin, emax, fmin, fmax = windows[0], windows[1], windows[2], windows[3]
    win = (evals >= emin) & (evals <= emax)
    if has_frozen:
        froz = win & (evals >= fmin) & (evals <= fmax)
    else:
        froz = jnp.zeros_like(win)

    S_full = jnp.einsum("kms,kbns->kbmn", jnp.conj(uall), uall[nbr],
                        precision=hp)
    # seed the subspace iteration from the trials, projected into the
    # window bands and polar-orthonormalized (the iteration refines the
    # subspace; without a trial seed it would start energy-ordered and
    # can converge to a kinked union of lowest bands)
    winf = win.astype(uall.dtype)
    if auto_trial:
        Qw = jnp.einsum("kns,kn,knt->st", uall, winf, jnp.conj(uall),
                        precision=hp) / uall.shape[0]
        _, qv = jnp.linalg.eigh((Qw + jnp.conj(Qw.T)) / 2)
        g_seed = qv[:, -nw:].T
    else:
        g_seed = unpack_cplx(trial_ri)
    A0 = jnp.einsum("kns,ms->knm", jnp.conj(uall), g_seed, precision=hp)
    A0 = A0 * winf[:, :, None]
    U0_, _, Vh0 = jnp.linalg.svd(A0, full_matrices=False)
    F0 = jnp.matmul(U0_, Vh0, precision=hp)  # (B, nsta, nw) isometry
    F = _smv_disentangle(S_full, nbr, w_b, win, froz, nw,
                         dis_steps, mixing, F0)  # (B, nsta, nw)
    # subspace states in the orbital basis + subspace Hamiltonian
    usub = jnp.einsum("knm,kns->kms", F, uall, precision=hp)
    Hsub = jnp.einsum("knm,kn,knl->kml", jnp.conj(F), evals, F,
                      precision=hp)

    V0, min_s, _ = _project_gauge(usub, trial_ri, auto_trial)
    Msub = jnp.einsum("kms,kbns->kbmn", jnp.conj(usub), usub[nbr],
                      precision=hp)
    M0 = jnp.einsum("kmi,kbmn,kbnj->kbij", jnp.conj(V0), Msub, V0[nbr],
                    precision=hp)
    U, hist, (rbar, oi, ot) = _mv_localize(M0, nbr, w_b, b_cart,
                                           mv_steps, alpha)
    V = jnp.matmul(V0, U, precision=hp)
    hr, final_sv = _finish_gauge(usub, V, Hsub, nk, kpts, False)
    # grid "energies" of the subspace = eigenvalues of Hsub
    esub = jnp.linalg.eigvalsh(Hsub)
    # window feasibility counts, validated on the host AFTER the build
    # (avoids a duplicate full host-side grid solve)
    nwin_min = jnp.min(jnp.sum(win.astype(jnp.int32), axis=1))
    nfroz_max = jnp.max(jnp.sum(froz.astype(jnp.int32), axis=1))
    return (pack_cplx(hr), min_s, esub, hist, rbar, oi, ot, final_sv,
            nwin_min, nfroz_max)


@partial(jax.jit, static_argnums=(2,))
def _bands_jit(hr_packed, k_list, nk):
    from .ops.eigh import eigvalsh_batched

    hr = unpack_cplx(hr_packed)  # (NR, nw, nw)
    Rs = _r_grid(nk).astype(k_list.dtype)
    w = jnp.exp(2.0j * jnp.pi * jnp.einsum(
        "bd,rd->br", k_list, Rs, precision=jax.lax.Precision.HIGHEST))  # (B, NR)
    Hk = jnp.einsum("br,rml->bml", w, hr, precision=jax.lax.Precision.HIGHEST)
    Hk = (Hk + jnp.conj(jnp.swapaxes(Hk, -1, -2))) / 2
    return eigvalsh_batched(Hk)


class WannierInterpolator(object):
    """Interpolate an isolated band group from a coarse BZ grid; see the
    module docstring.  Build with :func:`interpolator`."""

    def __init__(self, model, occ, nk, trial=None, localize=0,
                 localize_step=0.5, coarse_nk=None, polish=None):
        static, data = model._get_finalized()
        if static.dim_k < 1:
            raise PythtbError("Wannier interpolation requires a periodic model.")
        occ = [int(o) for o in occ]
        if len(occ) == 0:
            raise PythtbError("Need at least one band to interpolate.")
        if min(occ) < 0 or max(occ) >= static.nsta:
            raise IndexError(
                "occ indices %s out of range for %d states" % (occ, static.nsta)
            )
        nk = (nk,) * static.dim_k if np.isscalar(nk) else tuple(int(n) for n in nk)
        if len(nk) != static.dim_k:
            raise PythtbError("nk must give one grid size per periodic direction.")
        self._nk = nk
        self._dim_k = static.dim_k
        self._lat = np.array(model._lat, dtype=np.float64)
        self._per = list(model._per)
        nocc = len(occ)
        t = self._t_orb(model)
        g = self._trial_array(trial, nocc, static.nsta)

        if localize is True:
            localize = 200
        run_nk = nk
        if localize and coarse_nk is not None:
            run_nk = ((coarse_nk,) * static.dim_k
                      if np.isscalar(coarse_nk)
                      else tuple(int(n) for n in coarse_nk))
        auto = trial is None

        def build(g, auto):
            if not localize:
                hr_packed, min_s, e_grid = _build_jit(
                    static, data, nk, jnp.asarray(t),
                    jnp.asarray(host_pack(g)), tuple(occ), auto,
                )
                return hr_packed, min_s, e_grid, (None,) * 5, min_s
            b_int, b_cart, w_b = _bshells(model._lat, model._per, run_nk)
            nbr = _neighbor_index(run_nk, b_int)
            out = _build_loc_jit(
                static, data, run_nk, jnp.asarray(t),
                jnp.asarray(host_pack(g)), tuple(occ), auto,
                jnp.asarray(nbr), jnp.asarray(w_b), jnp.asarray(b_cart),
                int(localize), float(localize_step),
            )
            hr_packed, min_s, e_grid, hist, rbar, oi, ot, fsv, wR = out
            gate_sv = min_s  # the COARSE projection sv decides trial health
            if run_nk != nk:
                # multigrid: the coarse run's real-space Wannier vectors
                # become (k-dependent) trials on the fine grid -- the
                # fine gauge starts in the coarse basin and a short MV
                # polish converges where a cold start stalls
                b_int, b_cart, w_b = _bshells(model._lat, model._per, nk)
                nbr = _neighbor_index(nk, b_int)
                pol = polish
                if pol is None:
                    pol = max(100, int(localize) // 4)
                out = _build_fine_jit(
                    static, data, nk, jnp.asarray(t), wR, tuple(occ),
                    run_nk, jnp.asarray(nbr), jnp.asarray(w_b),
                    jnp.asarray(b_cart), pol, float(localize_step),
                )
                hr_packed, min_s, e_grid, hist, rbar, oi, ot, fsv = out
            return (hr_packed, min_s, e_grid, (hist, rbar, oi, ot, fsv),
                    gate_sv)

        hr_packed, min_s, e_grid, diag, gate_sv = build(g, auto)
        if auto and float(jax.device_get(gate_sv)) < 1e-2:
            # automatic fallback: the mean-projector trials degenerate
            # when the averaged projector is (near-)proportional to the
            # identity (e.g. equal sublattice weight); greedily-chosen
            # one-hot orbital anchors maximize the worst-k conditioning
            from .utils.xfer import host_unpack

            u = host_unpack(np.asarray(jax.device_get(_grid_states_jit(
                static, data, run_nk, jnp.asarray(t), tuple(occ)))))
            g2, sv2 = _greedy_anchor_trials(u, nocc)
            if sv2 > 2.0 * float(jax.device_get(gate_sv)):
                hr_packed, min_s, e_grid, diag, _ = build(g2, False)
        self._set_diagnostics(min_s, *diag)
        self._hr = hr_packed
        self._e_grid = e_grid  # (Nk, nw) device; see grid_energies
        self._warn_singular()

    # -- construction helpers -------------------------------------------

    @staticmethod
    def _t_orb(model):
        """Orbital positions along periodic directions, per state."""
        t = np.asarray(model._orb)[:, model._per].T  # (dim_k, norb)
        if model._nspin == 2:
            t = np.repeat(t, 2, axis=1)
        return t

    @staticmethod
    def _trial_array(trial, nw, nsta):
        if trial is None:
            # default trials are computed in-program: the top
            # eigenvectors of the grid-averaged source-state projector
            return np.zeros((nw, nsta), dtype=complex)  # placeholder
        return np.asarray(trial, dtype=complex).reshape(nw, nsta)

    def _set_diagnostics(self, min_s, hist=None, rbar=None, oi=None,
                         ot=None, fsv=None):
        got = jax.device_get((min_s, hist, rbar, oi, ot, fsv))
        self.min_projection_sv = float(got[0])
        self.spread_history = (
            None if got[1] is None else np.asarray(got[1], dtype=np.float64)
        )
        self.centers = (
            None if got[2] is None else np.asarray(got[2], dtype=np.float64).T
        )
        self.omega_i = None if got[3] is None else float(got[3])
        self.omega_tilde = None if got[4] is None else float(got[4])
        self.final_projection_sv = None if got[5] is None else float(got[5])

    def _warn_singular(self):
        if self.min_projection_sv < 1e-3:
            import warnings

            warnings.warn(
                "Wannier projection is near-singular (min singular value "
                "%.2e): the chosen band group is not smoothly Wannierizable "
                "with these trial vectors (topological obstruction, or a "
                "band touching) -- interpolated bands are unreliable."
                % self.min_projection_sv,
                UserWarning,
                stacklevel=4,
            )

    @property
    def grid_energies(self):
        """Exact band energies of the group at the coarse-grid k-points
        (flat (prod(nk), nocc) float array, row-major over the grid) --
        the interpolation's anchor data, free as a by-product."""
        return np.asarray(jax.device_get(self._e_grid), dtype=np.float64)

    @property
    def hoppings(self):
        """Effective hoppings H(R) of the projected group: complex
        (NR, nw, nw) over the centered R grid (see :meth:`r_vectors`);
        exponential decay with |R| is the Wannierizability check."""
        from .utils.xfer import host_unpack

        return host_unpack(np.asarray(jax.device_get(self._hr)))

    def r_vectors(self):
        """(NR, dim_k) integer lattice vectors matching :attr:`hoppings`."""
        return _r_grid(self._nk, like_np=True)

    def model(self, min_hopping_norm=1e-8, zero_energy=0.0):
        """Downfold to an effective :class:`~pythtb_tpu.tb_model` whose
        orbitals are the Wannier functions and whose hoppings are the
        interpolated H(R) -- the native analog of importing a Wannier90
        ``_hr.dat`` (w90.model, reference pythtb.py:3448-3586), with no
        external tools.  The result is an ordinary model: cut it, apply
        Peierls fields, feed it to the surface/response machinery.

        Orbital positions are the Wannier centers (reduced coordinates)
        when the gauge was localized, else the cell origin; the model is
        flagged non-position-diagonal (like w90 imports) so
        position-operator methods warn unless overridden.

        :param min_hopping_norm: drop |H_R[i,j]| below this (the H(R)
          tail is truncation noise at the working grid)
        :param zero_energy: energy shift subtracted from the on-site
          terms
        :returns: a NEW tb_model with ``nw`` orbitals
        """
        from .model import tb_model

        hr = self.hoppings  # (NR, nw, nw) complex
        Rall = np.asarray(self.r_vectors())  # (NR, dim_k)
        nw = hr.shape[-1]
        lat = np.asarray(self._lat)
        dim_r = lat.shape[0]
        # embed the dim_k R-components into dim_r integer vectors
        Remb = np.zeros((Rall.shape[0], dim_r), dtype=int)
        Remb[:, list(self._per)] = Rall
        if self.centers is not None:
            orb_red = np.asarray(self.centers) @ np.linalg.inv(lat)
            orb_red = orb_red - np.floor(orb_red)  # home cell
        else:
            orb_red = np.zeros((nw, dim_r))
        m = tb_model(self._dim_k, dim_r, lat.tolist(), orb_red.tolist(),
                     per=list(self._per))
        iR0 = int(np.flatnonzero((Rall == 0).all(axis=1))[0])
        m.set_onsite(np.real(np.diagonal(hr[iR0])) - zero_energy)
        # Hermiticity pairs H(-R) = H(R)^dagger: keep one representative
        # per pair (first nonzero R-component positive; at R = 0 the
        # strict upper triangle), the w90 half-space convention.  The
        # centered R grid of an EVEN n spans [-n/2, n/2): its boundary
        # rows have NO -R partner and must be kept (either sign) at
        # HALF amplitude -- tb_model re-adds the h.c., reproducing
        # exactly the Hermitization `bands()` applies to H(k).
        iu, ju = np.triu_indices(nw, k=1)
        ia, ja = [x.reshape(-1) for x in np.meshgrid(
            np.arange(nw), np.arange(nw), indexing="ij")]
        rset = {tuple(R) for R in Rall}
        for r_idx in range(Rall.shape[0]):
            R = Rall[r_idx]
            nz = np.flatnonzero(R)
            paired = tuple(-R) in rset
            if len(nz) and paired and R[nz[0]] < 0:
                continue  # the -R partner carries this block
            scale = 1.0 if (len(nz) == 0 or paired) else 0.5
            ii, jj = (iu, ju) if len(nz) == 0 else (ia, ja)
            amp = hr[r_idx, ii, jj] * scale
            keep = np.abs(amp) >= min_hopping_norm
            if not keep.any():
                continue
            Rs = np.broadcast_to(Remb[r_idx], (int(keep.sum()), dim_r))
            m._append_scalar_hops(amp[keep], ii[keep], jj[keep], Rs)
        m._assume_position_operator_diagonal = False
        return m

    def bands(self, k_list):
        """Interpolated band energies of the group at arbitrary reduced
        k-points: (nw, nkp) in solve_all layout."""
        kpts = np.asarray(k_list, dtype=np.float64)
        if kpts.ndim == 1:
            kpts = kpts[:, None] if self._dim_k == 1 else kpts[None, :]
        if kpts.shape[1] != self._dim_k:
            raise PythtbError("k-vectors have wrong dimension.")
        out = _bands_jit(self._hr, jnp.asarray(kpts), self._nk)
        return np.asarray(jax.device_get(out), dtype=np.float64).T


def interpolator(model, occ, nk=8, trial=None, localize=0,
                 localize_step=0.5, coarse_nk=None,
                 polish=None) -> WannierInterpolator:
    """Build a :class:`WannierInterpolator` for the band group ``occ``
    of ``model`` from an ``nk``-per-direction coarse grid.

    :param occ: band indices of an ISOLATED group (gapped from the rest
      everywhere; for spinful models include both Kramers partners)
    :param nk: coarse grid size per periodic direction (scalar or tuple)
    :param trial: optional (nocc, nsta) complex trial vectors; default =
      the top eigenvectors of the grid-averaged band projector (an
      automatic SCDM-like choice, computed in-program)
    :param localize: Marzari-Vanderbilt maximal-localization steps run
      after the one-shot projection (``True`` = 200).  The MV descent
      smooths kinks the one-shot gauge leaves when the trials have the
      wrong character somewhere in the BZ (the classic valence-only
      silicon failure), restoring exponential H(R) decay; inspect
      ``.spread_history`` / ``.omega_tilde`` / ``.final_projection_sv``.
    :param localize_step: initial MV step-size factor (halved
      automatically whenever the spread rises)
    :param coarse_nk: multigrid refinement: run the full localization on
      this (cheap) grid first, then re-solve on ``nk`` and project onto
      the coarse run's real-space Wannier vectors -- by Fourier
      inversion that projection is near-unitary, so the fine gauge
      starts smooth and only a short ``polish`` MV pass (or none) is
      needed.  This is how large ``nk`` stays affordable: e.g. silicon
      valence at nk=28 via coarse_nk=8 reaches sub-meV interpolation.
    :param polish: fine-grid MV steps after multigrid projection
      (default ``max(100, localize // 4)``; ``0`` = pure projection)
    :returns: interpolator with ``.bands(k_list)``, ``.hoppings``,
      ``.r_vectors()``, ``.min_projection_sv`` (+ with ``localize``:
      ``.spread_history``, ``.centers``, ``.omega_i``, ``.omega_tilde``,
      ``.final_projection_sv``)

    Example::

        itp = wannier.interpolator(models.bn(), [0], nk=10)
        ek = itp.bands(kpts)        # lower band anywhere, no re-solve
    """
    return WannierInterpolator(model, occ, nk, trial=trial,
                               localize=localize,
                               localize_step=localize_step,
                               coarse_nk=coarse_nk, polish=polish)


def disentangled_interpolator(model, nw, nk, window, frozen=None,
                              trial=None, dis_steps=80, mixing=0.7,
                              localize=200,
                              localize_step=0.5) -> WannierInterpolator:
    """Wannier interpolation of an ENTANGLED band group: select an
    optimally-smooth ``nw``-dimensional subspace inside the energy
    ``window`` by Souza-Marzari-Vanderbilt disentanglement (PRB 65,
    035109 (2001)), then project + maximally localize inside it.

    The subspace at each coarse-grid k maximizes the inter-k overlap
    functional (minimal gauge-invariant spread Omega_I), iterated to
    self-consistency as a fixed-length device scan; bands inside the
    ``frozen`` window are kept EXACTLY (they are reproduced by the
    interpolation wherever they fall inside it).  Replaces the
    reference's external-Wannier90 pipeline (pythtb.py:3448-3586) for
    metals and crossing band groups.

    :param nw: number of Wannier functions (subspace dimension); must
      not exceed the number of window bands at any grid point and must
      be >= the number of frozen bands everywhere
    :param window: (emin, emax) outer energy window
    :param frozen: optional (fmin, fmax) inner window kept exactly
    :param dis_steps: disentanglement self-consistency iterations
    :param mixing: Z-matrix mixing factor (0 < mixing <= 1)
    :param localize: MV maximal-localization steps after projection
    :returns: :class:`WannierInterpolator` (``.bands`` etc.); grid
      energies are the subspace eigenvalues
    """
    static, data = model._get_finalized()
    if static.dim_k < 1:
        raise PythtbError("Wannier interpolation requires a periodic model.")
    nw = int(nw)
    if nw < 1 or nw > static.nsta:
        raise PythtbError("nw must be in 1..%d" % static.nsta)
    nk = (nk,) * static.dim_k if np.isscalar(nk) else tuple(int(n) for n in nk)
    if len(nk) != static.dim_k:
        raise PythtbError("nk must give one grid size per periodic direction.")
    emin, emax = (float(window[0]), float(window[1]))
    if frozen is None:
        fmin, fmax = 0.0, -1.0
    else:
        fmin, fmax = float(frozen[0]), float(frozen[1])
        if fmin < emin or fmax > emax:
            raise PythtbError("frozen window must lie inside the outer window")

    if localize is True:
        localize = 200
    self = WannierInterpolator.__new__(WannierInterpolator)
    self._nk = nk
    self._dim_k = static.dim_k
    self._lat = np.array(model._lat, dtype=np.float64)
    self._per = list(model._per)
    t = WannierInterpolator._t_orb(model)
    g = WannierInterpolator._trial_array(trial, nw, static.nsta)
    b_int, b_cart, w_b = _bshells(model._lat, model._per, nk)
    nbr = _neighbor_index(nk, b_int)
    windows = jnp.asarray([emin, emax, fmin, fmax])
    (hr_packed, min_s, e_grid, hist, rbar, oi, ot, fsv, nwin_min,
     nfroz_max) = _build_disent_jit(
        static, data, nk, jnp.asarray(t), jnp.asarray(host_pack(g)), nw,
        trial is None, jnp.asarray(nbr), jnp.asarray(w_b),
        jnp.asarray(b_cart), windows, int(dis_steps), float(mixing),
        int(localize), float(localize_step), frozen is not None,
    )
    # window feasibility (counts computed in-program -- no duplicate
    # host-side grid solve)
    if int(jax.device_get(nwin_min)) < nw:
        raise PythtbError(
            "outer window holds only %d bands at some grid point; nw=%d "
            "needs at least nw window bands everywhere"
            % (int(jax.device_get(nwin_min)), nw)
        )
    if frozen is not None and int(jax.device_get(nfroz_max)) > nw:
        raise PythtbError(
            "frozen window holds %d bands at some grid point; must "
            "not exceed nw=%d" % (int(jax.device_get(nfroz_max)), nw)
        )
    self._hr = hr_packed
    self._e_grid = e_grid
    self._set_diagnostics(min_s, hist, rbar, oi, ot, fsv)
    self._warn_singular()
    return self
