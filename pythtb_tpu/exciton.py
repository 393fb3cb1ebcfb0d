"""Excitons from the Bethe-Salpeter equation on tight-binding models.

The reference framework (PythTB 1.8.0, /root/reference/pythtb.py) is
strictly single-particle -- it computes Bloch bands and Berry phases
but no two-particle physics at all.  This module adds the standard
workhorse of semiconductor optics: the Tamm-Dancoff Bethe-Salpeter
equation (BSE) for electron-hole pairs with a static, user-specified
density-density interaction, built TPU-first on the package's
Bloch machinery (ops/hamiltonian.assemble, the parity layer for
reference pythtb.py:874-925).

Formalism (reduced coordinates; hbar = 1)
-----------------------------------------

A real density-density interaction ``H_int = (1/2) sum V_ab(R'-R)
n_{aR} n_{bR'}`` becomes ``(1/2N) sum_q W_ab(q) n_a(-q) n_b(q)`` with
the STRICTLY PERIODIC kernel

    ``W_ab(q) = sum_d V_ab(d) e^{2 pi i q.d}``

when densities are expanded in Convention-II Bloch operators
(``c_{ak} = N^{-1/2} sum_R e^{-2 pi i k.R} c_{aR}``).  The package's
eigenvectors are Convention I (phases carry R + t_b - t_a), so inside
the program every eigenvector component is rephased,
``u^{II}_{nk,a} = e^{2 pi i k.t_a} u^{I}_{nk,a}`` -- scalars like the
kernel matrix elements and velocity dipoles are representation
independent, but only the II/periodic-W pairing lets W(k - k') be
gathered from one precomputed table on the k-difference grid (W in
Convention I picks up non-periodic e^{2 pi i G.(t_b - t_a)} factors
under folding -- a wrong-by-phases trap).

On pair states ``|t> = b+_{c,k+Q} b_{v,k} |FS>`` the exact matrix
elements of ``H0 + H_int`` (Wick's theorem; spinless) are

    ``H[t',t] = (eps^QP_c(k+Q) - eps^QP_v(k)) delta_{t't} - D + s_x X``

    ``D[t',t] = (1/N) sum_ab W_ab(k'-k) u*_{c'k'+Q,a} u_{ck+Q,a}
                u*_{vk,b} u_{v'k',b}``                    (direct)
    ``X[t',t] = (1/N) sum_ab W_ab(Q)  u*_{c'k'+Q,a} u_{v'k',a}
                u*_{vk,b} u_{ck+Q,b}``                    (exchange)

with the exchange factor ``s_x`` = 1 (spinless fermions), 0 (triplet
channel of a spin-degenerate model) or 2 (singlet channel).  The
quasiparticle energies are the bare bands (``qp='none'``), optionally
shifted by the one-shot (diagonal) Hartree-Fock self-energy of the
filled sea (``qp='hf'``):

    ``Sigma^H_n(k) = sum_ab |u_nk,a|^2 W_ab(0) rho_b``,
    ``rho_b = (1/N) sum_{k,v in occ} |u_vk,b|^2``
    ``Sigma^x_n(k) = -(1/N) sum_{k',v in occ,ab} W_ab(k-k')
                     u*_{nk,a} u_{vk',a} u*_{vk',b} u_{nk,b}``

With ``qp='hf'`` and a frozen (dispersionless, unhybridized) valence
band the Tamm-Dancoff restriction is EXACT: the one-pair sector closes
under the full many-body Hamiltonian, and the oracle tier checks the
whole machine -- kernel phases, direct term, Hartree AND Fock shifts,
finite-Q bookkeeping -- against exact diagonalization (ed.solve on the
matching glued torus) at 1e-10, union over every exciton momentum Q.
With band hybridization the leading BSE error is the neglected
pair-number-changing coupling, O(V^2/gap); the exchange tier pins that
scaling (and the exchange sign) on a flat-band model with
k-independent orbital mixing.

TPU-first layout
----------------

One jitted program per (model, grid) signature: the k-grid is a device
iota, both k and k+Q sheets are solved by one batched eigh each,
``W_ab(q)`` is evaluated on the q = k-k' difference grid as a single
(B, nterms) x (nterms, norb^2) phase matmul (MXU work; phase arguments
at ``Precision.HIGHEST`` -- the TPU bf16 matmul default corrupts
them), the kernel contractions are batched einsums, and the
(nc*nv*N_k)^2 BSE matrix is diagonalized by the same batched eigh the
band solver uses.  Only ri-packed floats cross the host<->device
boundary (the axon runtime cannot transfer complex buffers).

Units: :func:`absorption` returns the optical-conductivity tensor in
the exact conventions of optical.optical_conductivity (e^2/h for 2-D,
mirrored Hall block); at V = None the two agree to machine precision
(committed differential test).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_unpack, pack_cplx, unpack_cplx

__all__ = ["bse", "absorption", "dispersion", "radial_interaction",
           "ExcitonResult"]

_SPIN_FACTORS = {"spinless": 1.0, "triplet": 0.0, "singlet": 2.0}


# ---------------------------------------------------------------------------
# interaction specification
# ---------------------------------------------------------------------------


def radial_interaction(model, func, rcut):
    """Build a density-density coupling list from a radial potential.

    Enumerates every orbital pair ``(a, 0) -- (b, R)`` with Cartesian
    distance ``0 < dist <= rcut`` (cells ``R`` along the periodic
    directions) and assigns ``V = func(dist)``.  Each unordered
    physical pair appears exactly once: same-cell pairs with ``a < b``,
    inter-cell pairs only for ``R`` whose first nonzero component is
    positive (the mirrored ``(b, a, -R)`` view is implied --
    :func:`bse` Hermitizes).  Returns a list of ``(V, a, b, R)``
    tuples for the ``V=`` argument of :func:`bse` / :func:`absorption`.

    :param model: tb_model supplying the geometry
    :param func: callable ``V(dist)`` on Cartesian distance (model
      length units)
    :param rcut: cutoff distance (> 0)
    """
    if rcut <= 0:
        raise PythtbError("radial_interaction: rcut must be positive")
    lat = np.asarray(model._lat, dtype=np.float64)
    orb_cart = np.asarray(model._orb, dtype=np.float64) @ lat
    per = list(model._per)
    dim_k = model._dim_k
    norb = model._norb
    if dim_k > 0:
        per_lat = lat[per]
        nmax = []
        for d in range(dim_k):
            others = [per_lat[x] for x in range(dim_k) if x != d]
            v = per_lat[d]
            if others:
                A = np.array(others).T
                proj = A @ np.linalg.lstsq(A, v, rcond=None)[0]
                h = np.linalg.norm(v - proj)  # height orthogonal to rest
            else:
                h = np.linalg.norm(v)
            nmax.append(int(np.ceil(rcut / max(h, 1e-12))) + 1)
        grids = np.meshgrid(*[np.arange(-n, n + 1) for n in nmax],
                            indexing="ij")
        cells = np.stack([g.reshape(-1) for g in grids], axis=-1)
    else:
        cells = np.zeros((1, 0), dtype=int)
    out = []
    for R in cells:
        nz = np.nonzero(R)[0]
        is_home = nz.size == 0
        if not is_home and R[nz[0]] < 0:
            continue  # the mirrored cell covers this pair
        Rcart = R.astype(np.float64) @ lat[per] if dim_k > 0 else 0.0
        for a in range(norb):
            for b in range(norb):
                if is_home and b <= a:
                    continue
                dist = float(np.linalg.norm(orb_cart[b] + Rcart
                                            - orb_cart[a]))
                if dist <= 1e-12 or dist > rcut:
                    continue
                out.append((float(func(dist)), a, b,
                            tuple(int(x) for x in R)))
    return out


def _prep_interaction(model, V):
    """Validate + symmetrize the coupling list into flat arrays.

    Each listed term ``(V, a, b, R)`` means ``V n_{a,0} n_{b,R}`` (one
    physical term -- do NOT list the reversed orientation too).  The
    symmetrized table V_ab(d) gets both (a,b,R) and (b,a,-R) entries so
    ``W_ba(-q) == W_ab(q)`` holds exactly.

    Returns (vals (2T,), rvecs (2T, dim_k) integer lattice
    displacements, pattern (2T, norb^2) one-hot at a*norb+b).
    """
    dim_k = model._dim_k
    norb = model._norb
    vals, rvecs, pat_idx = [], [], []
    for term in V:
        if len(term) != 4:
            raise PythtbError("interaction terms must be (V, a, b, R)")
        v, a, b, R = float(term[0]), int(term[1]), int(term[2]), term[3]
        R = np.asarray(R, dtype=int).reshape(-1)
        if R.shape[0] != dim_k:
            raise PythtbError(
                "interaction R must have one integer per periodic "
                "direction (dim_k = %d)" % dim_k)
        if not (0 <= a < norb and 0 <= b < norb):
            raise PythtbError("interaction orbital index out of range")
        if a == b and np.all(R == 0):
            raise PythtbError(
                "same-orbital same-cell density-density terms are "
                "one-body (n^2 = n); fold them into set_onsite")
        for (aa, bb, RR) in ((a, b, R), (b, a, -R)):
            vals.append(v)
            rvecs.append(RR.astype(np.float64))
            pat_idx.append(aa * norb + bb)
    T = len(vals)
    if T == 0:
        return (np.zeros((0,)), np.zeros((0, dim_k)),
                np.zeros((0, norb * norb)))
    pattern = np.zeros((T, norb * norb), dtype=np.float64)
    pattern[np.arange(T), pat_idx] = 1.0
    return (np.asarray(vals, dtype=np.float64),
            np.asarray(rvecs, dtype=np.float64), pattern)


def _w_table(qpts, vals, rvecs, pattern, norb):
    """``W[q, a, b] = sum_terms V e^{2 pi i q.R}`` as one phase matmul
    (B, T) x (T, norb^2); periodic in q by construction (R integer).
    HIGHEST precision -- the phase argument feeds exp(i .)."""
    hp = jax.lax.Precision.HIGHEST
    ctype = config.complex_dtype()
    if vals.shape[0] == 0:
        return jnp.zeros((qpts.shape[0], norb, norb), dtype=ctype)
    arg = 2.0 * np.pi * jnp.einsum("qd,td->qt", qpts, rvecs, precision=hp)
    ph = jax.lax.complex(jnp.cos(arg), jnp.sin(arg)) \
        * vals[None, :].astype(config.float_dtype())
    W = jnp.einsum("qt,tp->qp", ph, pattern.astype(ctype), precision=hp)
    return W.reshape(qpts.shape[0], norb, norb)


# ---------------------------------------------------------------------------
# the BSE program
# ---------------------------------------------------------------------------


def _diff_index(nk):
    """Flat index table idx[x, y] = flat((g_x - g_y) mod nk) on the
    uniform grid, built from iota (no host k-data crosses)."""
    dim = len(nk)
    strides = []
    s = 1
    for d in range(dim - 1, -1, -1):
        strides.insert(0, s)
        s *= nk[d]
    coords = [jax.lax.broadcasted_iota(jnp.int32, tuple(nk), d).reshape(-1)
              for d in range(dim)]
    idx = jnp.zeros((int(np.prod(nk)), int(np.prod(nk))), dtype=jnp.int32)
    for d in range(dim):
        diff = (coords[d][:, None] - coords[d][None, :]) % nk[d]
        idx = idx + diff * strides[d]
    return idx


def _conv2_phase(kpts, torb):
    """Convention I -> II rephasing factors e^{2 pi i k.t_a}, (B, S)."""
    hp = jax.lax.Precision.HIGHEST
    arg = 2.0 * np.pi * jnp.einsum("kd,ad->ka", kpts, torb, precision=hp)
    return jax.lax.complex(jnp.cos(arg), jnp.sin(arg))


def _hf_shifts(W0, idx, Wtab, u, occ_u):
    """Diagonal one-shot HF self-energy for the states whose
    (Convention-II) eigenvector rows are ``u``: (B, nb, S), given the
    occupied manifold ``occ_u`` (B, no, S) on the k-grid.

    ``Wtab[idx]`` supplies W(k_n - k'); ``W0`` is W(0).  Returns
    (B, nb) real shifts.
    """
    hp = jax.lax.Precision.HIGHEST
    N = float(u.shape[0])
    rho = jnp.einsum("kvb,kvb->b", jnp.conj(occ_u), occ_u,
                     precision=hp).real / N  # (S,)
    vh = jnp.einsum("ab,b->a", W0.real, rho, precision=hp)  # (S,)
    sig_h = jnp.einsum("kna,a->kn", (jnp.conj(u) * u).real, vh,
                       precision=hp)
    Wg = Wtab[idx]  # (B, B, S, S): W(k_x - k_y) (periodic -> exact)
    t1 = jnp.einsum("xyab,xna,yva->xynvb", Wg, jnp.conj(u), occ_u,
                    precision=hp)
    sig_x = -jnp.einsum("xynvb,yvb,xnb->xn", t1, jnp.conj(occ_u), u,
                        precision=hp).real / N
    return sig_h + sig_x


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7, 15))
def _bse_jit(static, data, nk, vb, cb, occ, qp, sx,
             Q, vals, rvecs, pattern, scissor, torb, lat, mesh=None):
    """One device program: solve both k-sheets, build W tables, the
    direct/exchange kernels, HF shifts, diagonalize, and compute pair
    dipoles (velocity gauge).  Returns ri-packed host payload.

    With a ``mesh``, the hole-sheet k axis (the ROW axis x of the
    pair-grid kernel -- the O(B^2 S^2 nc nv) direct-kernel build is
    the heavy step) is GSPMD-sharded; the replicated W table and the
    column axis stay local, so the kernel rows build independently
    per device and the final M x M eigh gathers once."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_dk
    from .ops.solver import device_uniform_grid, shard_grid_axis0

    hp = jax.lax.Precision.HIGHEST
    ftype = config.float_dtype()
    dim = static.dim_k
    norb = static.norb
    B = int(np.prod(nk))
    N = float(B)
    kpts = device_uniform_grid(nk, jnp.zeros((dim,), ftype))
    if mesh is not None:
        kpts = shard_grid_axis0(kpts, mesh)
    kQ = kpts + Q[None, :]
    ev, vec = eigh_batched(assemble(static, data, kpts))
    evQ, vecQ = eigh_batched(assemble(static, data, kQ))

    # Convention II rephasing (see module docstring: the periodic-W /
    # II-vector pairing is what makes table gathers on the difference
    # grid exact)
    vec2 = vec * _conv2_phase(kpts, torb)[:, None, :]
    vec2Q = vecQ * _conv2_phase(kQ, torb)[:, None, :]

    vbi = jnp.asarray(vb, jnp.int32)
    cbi = jnp.asarray(cb, jnp.int32)
    u_h = vec2[:, vbi, :]        # (B, nv, S) hole (valence) states at k
    u_e = vec2Q[:, cbi, :]       # (B, nc, S) electron states at k + Q
    e_h = ev[:, vbi]             # (B, nv)
    e_e = evQ[:, cbi]            # (B, nc)

    Wtab = _w_table(kpts, vals, rvecs, pattern, norb)     # (B, S, S)
    W0 = Wtab[0]
    WQ = _w_table(Q[None, :], vals, rvecs, pattern, norb)[0]
    idx = _diff_index(nk)                                 # (B, B)

    if qp == "hf":
        occ_u = vec2[:, jnp.asarray(occ, jnp.int32), :]
        e_h = e_h + _hf_shifts(W0, idx, Wtab, u_h, occ_u)
        # electron sheet sits at k + Q: W((k+Q) - k') = W(q_grid + Q),
        # gathered from the table evaluated at grid + Q (W periodic)
        WtabQ = _w_table(kQ, vals, rvecs, pattern, norb)
        e_e = e_e + _hf_shifts(W0, idx, WtabQ, u_e, occ_u)

    nc, nv = len(cb), len(vb)
    de = (e_e[:, :, None] - e_h[:, None, :] + scissor)    # (B, nc, nv)
    M = B * nc * nv

    Wg = Wtab[idx]  # (B, B, S, S): W(k_x - k_y) at [x, y]
    # direct: T1[x,y,b,c',c] = sum_a W[x,y,a,b] u*_e[x,c',a] u_e[y,c,a]
    T1 = jnp.einsum("xyab,xca,yda->xybcd", Wg, jnp.conj(u_e), u_e,
                    precision=hp)
    D = jnp.einsum("xybcd,yvb,xwb->xcwydv", T1, jnp.conj(u_h), u_h,
                   precision=hp) / N  # rows (x, c', v'), cols (y, c, v)
    H = -D
    if sx != 0.0:
        P = jnp.einsum("xca,xwa->xcwa", jnp.conj(u_e), u_h,
                       precision=hp)               # (x, c', v', a)
        Pc = jnp.einsum("yvb,ydb->ydvb", jnp.conj(u_h), u_e,
                        precision=hp)              # (y, c, v, b)
        PW = jnp.einsum("xcwa,ab->xcwb", P, WQ, precision=hp)
        X = jnp.einsum("xcwb,ydvb->xcwydv", PW, Pc, precision=hp) / N
        H = H + sx * X
    H = H.reshape(M, M)
    H = H + jnp.diag(de.reshape(-1).astype(H.dtype))
    omega, A = eigh_batched(H[None])
    omega, A = omega[0], A[0]  # rows are excitons

    # velocity-gauge pair dipoles d^a_t = v^a_cv(k) / de_bare.
    # Representation-independent scalars: Convention-I vectors pair
    # with the Convention-I assemble_dk (true velocity incl. orbital
    # embedding).  Meaningful for optics at Q = 0.
    dH = assemble_dk(static, data, kpts)            # (B, dim, S, S)
    latj = jnp.asarray(lat, ftype)
    dHc = jnp.einsum("ra,brij->baij", latj, dH, precision=hp) \
        / (2.0 * np.pi)                             # Cartesian
    ncart = dHc.shape[1]
    vcv = jnp.einsum("bcs,bast,bvt->bacv", jnp.conj(vecQ[:, cbi, :]),
                     dHc, vec[:, vbi, :], precision=hp)
    de_bare = evQ[:, cbi][:, :, None] - ev[:, vbi][:, None, :]
    tiny = 1e-9
    safe = jnp.where(jnp.abs(de_bare) < tiny, 1.0, de_bare)
    d_t = jnp.where(jnp.abs(de_bare)[:, None] < tiny, 0.0,
                    vcv / safe[:, None])            # (B, ncart, nc, nv)
    d_flat = d_t.transpose(1, 0, 2, 3).reshape(ncart, M)
    # D^a_S = sum_t conj(A[S,t]) d^a_t  (rows-are-states convention)
    Ds = jnp.einsum("st,at->sa", jnp.conj(A), d_flat, precision=hp)
    return omega, pack_cplx(A), pack_cplx(Ds), de.reshape(-1)


class ExcitonResult:
    """Output of :func:`bse`: exciton energies, amplitudes, dipoles.

    Attributes: ``energies`` (M,) ascending; ``amplitudes`` (M, M)
    complex, row S = A_S over pairs t = (k, c, v) flattened k-major;
    ``dipoles`` (M, ncart) velocity-gauge exciton dipole vectors
    D^a_S; ``pair_energies`` (M,) the diagonal quasiparticle pair
    energies; ``nk``, ``cbands``, ``vbands``, ``Q``.
    """

    def __init__(self, energies, amplitudes, dipoles, pair_energies,
                 nk, cbands, vbands, Q):
        self.energies = energies
        self.amplitudes = amplitudes
        self.dipoles = dipoles
        self.pair_energies = pair_energies
        self.nk = nk
        self.cbands = cbands
        self.vbands = vbands
        self.Q = Q

    def oscillator_strengths(self, direction=0):
        """``Omega_S |D^a_S|^2`` along a Cartesian direction -- the
        velocity-gauge dipole weights that enter :func:`absorption`."""
        return self.energies * np.abs(self.dipoles[:, direction]) ** 2

    def wavefunction(self, S):
        """Pair-space weight of exciton ``S``: ``|A_S(k; c, v)|^2``
        reshaped to (*nk, nc, nv), plus the normalized real-space
        electron-hole envelope |psi(R)|^2 over separation cells
        (band-summed k -> R Fourier transform).

        Returns ``(weight_k, weight_R)``.
        """
        nc, nv = len(self.cbands), len(self.vbands)
        A = self.amplitudes[S].reshape(*self.nk, nc, nv)
        wk = np.abs(A) ** 2
        ax = tuple(range(len(self.nk)))
        psiR = np.fft.ifftn(A, axes=ax)
        wR = np.sum(np.abs(psiR) ** 2, axis=(-2, -1))
        return wk, wR / max(float(np.sum(wR)), 1e-300)


def _prep_bse(model, V, occ, vbands, cbands, nk, spin, qp):
    if model._nspin != 1:
        raise PythtbError(
            "bse: explicit-spin (nspin=2) models are not supported; "
            "model the spin channels via spin='singlet'/'triplet' on a "
            "spin-degenerate nspin=1 model")
    if model._dim_k < 1:
        raise PythtbError("bse needs at least one periodic direction")
    if spin not in _SPIN_FACTORS:
        raise PythtbError("spin must be one of %s" % sorted(_SPIN_FACTORS))
    if qp not in ("none", "hf"):
        raise PythtbError("qp must be 'none' or 'hf'")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k or any(n < 1 for n in nk):
        raise PythtbError("nk must give one grid size per k-direction")
    nsta = model._norb
    occ_t = tuple(int(x) for x in np.atleast_1d(occ))
    if len(set(occ_t)) != len(occ_t) or any(
            not (0 <= o < nsta) for o in occ_t):
        raise PythtbError("occ must be distinct band indices")
    vb = occ_t if vbands is None else tuple(
        int(x) for x in np.atleast_1d(vbands))
    cb = tuple(sorted(set(range(nsta)) - set(occ_t))) if cbands is None \
        else tuple(int(x) for x in np.atleast_1d(cbands))
    if not vb or not cb:
        raise PythtbError(
            "need at least one valence and one conduction band")
    if not set(vb) <= set(occ_t):
        raise PythtbError("vbands must be occupied (subset of occ)")
    if set(cb) & set(occ_t):
        raise PythtbError("cbands must be empty (disjoint from occ)")
    vals, rvecs, pattern = _prep_interaction(
        model, V if V is not None else [])
    return nk, occ_t, vb, cb, vals, rvecs, pattern


def bse(model, V, occ, nk, vbands=None, cbands=None, Q=None,
        spin="spinless", qp="hf", scissor=0.0):
    """Solve the Tamm-Dancoff BSE on a uniform k-grid.

    :param model: spinless periodic model (nspin == 1)
    :param V: density-density coupling list ``[(V, a, b, R), ...]``
      (``V n_{a,0} n_{b,R}``; each unordered physical pair ONCE --
      Hermitization is automatic), e.g. from
      :func:`radial_interaction`; ``None`` / ``[]`` gives the
      independent-particle limit
    :param occ: occupied (ground-state) band indices
    :param nk: k-grid, one size per periodic direction
    :param vbands: hole bands (default: all of ``occ``)
    :param cbands: electron bands (default: all unoccupied)
    :param Q: exciton center-of-mass momentum, reduced coordinates
      (default zero -- the optical sector)
    :param spin: 'spinless' (exchange factor 1), 'triplet' (0) or
      'singlet' (2) for spin-degenerate models
    :param qp: 'hf' (default) adds the one-shot diagonal Hartree-Fock
      self-energy of the occupied sea to the band energies (makes the
      frozen-valence limit exact); 'none' uses bare bands
    :param scissor: rigid gap correction added to every pair energy
    :returns: :class:`ExcitonResult`

    Example::

        V = exciton.radial_interaction(bn, lambda r: 2.0 / (r + 0.5), 3.0)
        res = exciton.bse(bn, V, occ=[0], nk=(24, 24))
        binding = min_gap - res.energies[0]
    """
    nk, occ_t, vb, cb, vals, rvecs, pattern = _prep_bse(
        model, V, occ, vbands, cbands, nk, spin, qp)
    static, data = model._get_finalized()
    ftype = config.float_dtype()
    dim = model._dim_k
    Qv = np.zeros((dim,)) if Q is None else \
        np.asarray(Q, dtype=np.float64).reshape(-1)
    if Qv.shape[0] != dim:
        raise PythtbError("Q must have one component per k-direction")
    lat = np.asarray(model._lat, dtype=np.float64)
    per = list(model._per)
    torb = np.asarray(model._orb, dtype=np.float64)[:, per]
    from .parallel import mesh as pmesh

    out = _bse_jit(
        static, data, nk, vb, cb, occ_t, qp, _SPIN_FACTORS[spin],
        jnp.asarray(Qv, ftype), jnp.asarray(vals, ftype),
        jnp.asarray(rvecs, ftype), jnp.asarray(pattern, ftype),
        jnp.asarray(float(scissor), ftype), jnp.asarray(torb, ftype),
        jnp.asarray(lat[per], ftype),
        pmesh.current_mesh())  # resolved at CALL time (stale-mesh gotcha)
    omega, A_ri, Ds_ri, de = jax.device_get(out)
    return ExcitonResult(
        np.asarray(omega, dtype=np.float64),
        host_unpack(np.asarray(A_ri)),
        host_unpack(np.asarray(Ds_ri)),
        np.asarray(de, dtype=np.float64),
        nk, cb, vb, Qv)


def dispersion(model, V, occ, nk, Q_list, **kwargs):
    """Exciton band structure: :func:`bse` eigenvalues along a list of
    center-of-mass momenta ``Q_list`` (reduced coordinates).  One
    compiled program reused across the whole path (Q is a traced
    argument).  Returns (nQ, M) energies."""
    Qs = np.asarray(Q_list, dtype=np.float64)
    if Qs.ndim != 2:
        raise PythtbError("Q_list must be a 2-D array of momenta")
    return np.stack([
        bse(model, V, occ, nk, Q=q, **kwargs).energies for q in Qs])


@jax.jit
def _abs_jit(omega, Ds_ri, omegas, eta):
    """sigma_ab(w) from exciton eigenpairs (TDA resonant +
    antiresonant poles), Kubo frame; mirrored by the caller."""
    hp = jax.lax.Precision.HIGHEST
    Ds = unpack_cplx(Ds_ri)  # (M, ncart)
    w = omega
    ieta = jax.lax.complex(jnp.zeros_like(eta), eta)
    res = 1.0 / (omegas[None, :] - w[:, None] + ieta)    # (M, nw)
    ares = 1.0 / (omegas[None, :] + w[:, None] + ieta)
    WD = Ds * w[:, None].astype(Ds.dtype)                # Omega_S D_S
    s_res = jnp.einsum("sb,sa,sw->abw", jnp.conj(Ds), WD, res,
                       precision=hp)
    s_ares = jnp.einsum("sa,sb,sw->abw", jnp.conj(Ds), WD, ares,
                        precision=hp)
    return pack_cplx(1j * (s_res + s_ares))


def absorption(model, V, omegas, occ, nk, eta=0.05, **kwargs):
    """Optical conductivity with excitonic effects.

    Diagonalizes the Q = 0 BSE and evaluates the velocity-gauge Kubo
    conductivity from the exciton poles (resonant + antiresonant).
    Units and tensor conventions match
    :func:`optical.optical_conductivity` exactly -- with ``V=None``
    and ``qp='none'`` the two agree to machine precision (committed
    differential test).

    :returns: complex (dim, dim, nw) tensor, e^2/h units (2-D),
      e^2/(h length) in 3-D
    """
    if model._dim_k != model._dim_r or model._dim_k not in (2, 3):
        raise PythtbError(
            "absorption requires a fully periodic 2-D or 3-D model")
    if "Q" in kwargs:
        raise PythtbError("absorption is the Q = 0 optical sector")
    res = bse(model, V, occ, nk, **kwargs)
    ftype = config.float_dtype()
    N = float(np.prod(res.nk))
    vol = abs(np.linalg.det(np.asarray(model._lat, dtype=np.float64)))
    omegas = np.asarray(omegas, dtype=np.float64).reshape(-1)
    Ds_ri = np.stack([res.dipoles.real, res.dipoles.imag], axis=-1)
    out = _abs_jit(jnp.asarray(res.energies, ftype),
                   jnp.asarray(Ds_ri, ftype),
                   jnp.asarray(omegas, ftype),
                   jnp.asarray(float(eta), ftype))
    sig = host_unpack(np.asarray(jax.device_get(out)))
    # package orientation: mirror the Kubo tensor (optical.py:150-160)
    return np.swapaxes(sig, 0, 1) * (2.0 * np.pi) / (N * vol)
