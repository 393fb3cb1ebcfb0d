"""Optical response of periodic models: Kubo interband conductivity
and joint density of states.

The reference framework computes eigenvalues and Berry phases but no
dynamical response at all -- sigma(omega) is the observable an optics /
transport user immediately wants from a tight-binding model.  Built
TPU-first on the same machinery as flows.py:

* the k-grid is generated on device from iota
  (ops/solver.device_uniform_grid), solved by one batched eigh;
* velocity matrices come from the analytic k-gradient
  (ops/hamiltonian.assemble_dk, Convention I, so intracell orbital
  positions are included) rotated to Cartesian axes;
* the frequency contraction ``sigma_ab(w) = sum_t W_ab[t] / (w - de[t]
  + i eta)`` is a chunked (dim^2, T) x (T, nw) complex matmul under
  ``lax.scan`` -- MXU work with bounded memory, any grid x frequency
  size in ONE device program.

Physics: the standard interband Kubo formula (hbar = 1, clean-limit
band basis),

``sigma_ab(w) = (i / (N_k V_c)) sum_{k, n != m} (f_n - f_m) /
(e_m - e_n) * v^b_nm v^a_mn / (w - (e_m - e_n) + i eta)``

returned in units of e^2/h for 2-D models (e^2/(h * length) in 3-D,
lattice length units).  Re sigma_xx >= 0 (positive absorption; tests
pin spinless graphene at its universal pi/4 e^2/h plateau -- half the
measured pi/2 value, which includes the spin-degeneracy factor of 2).

Hall sign convention: the whole package inherits the REFERENCE's
Berry-flux plaquette orientation (pythtb.py:3068-3119), under which
e.g. the standard Haldane wiring has C = -1; that orientation is the
mirror image of the right-handed frame most Kubo references use, so
the conductivity tensor here is the transpose of the right-handed
Kubo tensor (note the a/b index order above -- sigma_xx is unchanged,
the Hall block changes sign).  The payoff is package-wide coherence:
``sigma_xy(w -> 0, eta -> 0) == chern_number(...) * e^2/h`` exactly,
matching flows.anomalous_hall, realspace.kpm_conductivity, and
realspace.bott_index.  (The Berry curvature emerges from the double
energy denominator at w = 0, which pins sign and normalization.)

Intraband (Drude) response needs a Fermi-surface derivative: with
``fermi=`` given and ``temperature > 0`` the analytic ``-df/de`` term
``sigma^D_ab(w) = (i / (N_k V_c)) sum_{k,n} (-df/de)|_{e_n} v^a_nn
v^b_nn / (w + i eta)`` is included; at T = 0 it is identically zero on
a discrete grid (measure-zero Fermi surface) and is omitted.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_unpack, pack_cplx

__all__ = ["optical_conductivity", "joint_dos", "shift_current",
           "injection_current", "harmonic_spectrum"]

_CHUNK = 4096


def _band_velocity_weights(static, data, nk, occ, mu_t, lat):
    """Solve the grid and return (de, W) flattened over (k, n, m):
    transition energies e_m - e_n and pair weights
    W[a, b, t] = (f_n - f_m)/(e_m - e_n) v^a_nm v^b_mn / (N_k V_c),
    plus the per-state Drude weights.  Degenerate/equal-occupation
    pairs carry exactly zero weight (guarded division)."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_dk
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    dim = static.dim_k
    kpts = device_uniform_grid(nk, jnp.zeros((dim,), config.float_dtype()))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # (B, S), (B, S, S) rows = states
    dH = assemble_dk(static, data, kpts)  # (B, dim, S, S), reduced
    # reduced -> Cartesian: v_cart_a = (1/2pi) sum_r lat[r, a] v_red_r
    latj = jnp.asarray(lat, config.float_dtype())
    dHc = jnp.einsum("ra,brij->baij", latj, dH, precision=hp) / (2.0 * np.pi)
    V = jnp.einsum(
        "bns,bast,bmt->banm", jnp.conj(vecs), dHc, vecs, precision=hp
    )  # (B, dim, S, S) band-basis Cartesian velocities

    if occ is not None:
        f = jnp.zeros((static.nsta,), config.float_dtype())
        f = f.at[jnp.asarray(occ, jnp.int32)].set(1.0)
        f = jnp.broadcast_to(f, evals.shape)
        dfde = jnp.zeros_like(evals)
    else:
        mu, kt = mu_t
        x = (evals - mu) / kt
        f = jnp.where(kt > 0, 1.0 / (jnp.exp(jnp.clip(x, -80.0, 80.0)) + 1.0),
                      (evals <= mu).astype(evals.dtype))
        dfde = jnp.where(
            kt > 0,
            0.25 / (kt * jnp.cosh(jnp.clip(x / 2.0, -40.0, 40.0)) ** 2),
            jnp.zeros_like(evals),
        )  # -df/de >= 0

    de = evals[:, None, :] - evals[:, :, None]  # de[n, m] = e_m - e_n
    df = f[:, :, None] - f[:, None, :]  # f_n - f_m
    tiny = 1e-9
    safe = jnp.where(jnp.abs(de) < tiny, 1.0, de)
    ratio = jnp.where(jnp.abs(de) < tiny, 0.0, df / safe)  # (B, S, S)
    W = (
        V[:, :, None] * jnp.swapaxes(V, -1, -2)[:, None, :]
    )  # W[b, a, b2, n, m] = v^a_nm v^b_mn
    W = W * ratio[:, None, None]
    norm = 1.0 / float(np.prod(nk))
    W = W * norm
    drude = jnp.einsum(
        "bann,bcnn,bn->ac", V, jnp.conj(V), dfde.astype(V.dtype), precision=hp
    ) * norm
    return de.reshape(-1), W.reshape(W.shape[0], dim, dim, -1), drude


@partial(jax.jit, static_argnums=(0, 2, 3))
def _optical_jit(static, data, nk, occ, mu_t, omegas, eta, lat):
    de, W, drude = _band_velocity_weights(static, data, nk, occ, mu_t, lat)
    dim = static.dim_k
    Wf = W.transpose(1, 2, 0, 3).reshape(dim * dim, -1)  # (dim^2, T)
    de = de.reshape(-1)  # (T,)
    T = de.shape[0]
    pad = (-T) % _CHUNK
    de_p = jnp.pad(de, (0, pad))
    W_p = jnp.pad(Wf, ((0, 0), (0, pad)))
    nch = de_p.shape[0] // _CHUNK
    de_c = de_p.reshape(nch, _CHUNK)
    W_c = W_p.reshape(dim * dim, nch, _CHUNK)
    hp = jax.lax.Precision.HIGHEST

    def body(acc, ch):
        de_i, W_i = ch  # (C,), (dim^2, C)
        denom = 1.0 / (
            (omegas[None, :] - de_i[:, None])
            + jax.lax.complex(jnp.zeros_like(eta), eta)
        )  # (C, nw)
        return acc + jnp.einsum("pc,cw->pw", W_i, denom, precision=hp), None

    nw = omegas.shape[0]
    acc0 = jnp.zeros((dim * dim, nw), dtype=W_c.dtype)
    acc, _ = jax.lax.scan(body, acc0, (de_c, jnp.moveaxis(W_c, 0, 1)))
    # Package orientation: the raw Lehmann sum ``-i acc`` is the Kubo
    # tensor in the right-handed frame, where this Haldane wiring has
    # sigma_xy = +1 -- but the reference's Berry-flux plaquette
    # orientation (which chern_number, anomalous_hall, bott_index and
    # kpm_conductivity all inherit for parity) gives C = -1 for the
    # same model.  The two frames differ by a mirror, i.e. a transpose
    # of the conductivity tensor (sigma_xx unchanged, Hall block
    # flipped).  We report the MIRRORED tensor so that
    # sigma_xy(w -> 0) == chern_number(...) * e^2/h package-wide, with
    # absorption Re sigma_xx >= 0 intact.
    sigma = 1j * jnp.swapaxes(acc.reshape(dim, dim, nw), 0, 1)
    # intraband Drude (orientation-symmetric): + i * drude_ab / (w + i eta)
    dr = drude[:, :, None] / (
        omegas[None, None, :] + jax.lax.complex(jnp.zeros_like(eta), eta)
    )
    sigma = sigma + 1j * dr
    return pack_cplx(sigma * (2.0 * np.pi))  # e^2/hbar -> e^2/h units


def optical_conductivity(
    model,
    omegas,
    occ=None,
    fermi=None,
    nk=(101, 101),
    eta=0.05,
    temperature=0.0,
):
    """Kubo optical conductivity tensor ``sigma_ab(omega)``.

    One device program solves the whole k-grid, builds Cartesian
    band-basis velocities from the analytic k-gradient, and contracts
    every (k, n, m) transition against the full frequency batch (see
    module docstring for formula, units, and the Drude term).

    :param model: fully periodic model (``dim_k == dim_r`` in {2, 3})
    :param omegas: frequency grid (model energy units; 0 allowed --
      ``eta`` keeps the response finite, and sigma_xy(0) -> the
      anomalous Hall value as eta -> 0)
    :param occ: occupied band indices (clean insulator filling), or
    :param fermi: chemical potential (Fermi-Dirac occupations; enables
      the intraband Drude term when ``temperature > 0``)
    :param nk: k-grid
    :param eta: Lorentzian broadening (energy units)
    :param temperature: k_B T for ``fermi`` occupations
    :returns: complex ``(dim, dim, nw)`` array, units e^2/h (2-D) or
      e^2/(h * length) (3-D, lattice length units), divided by the cell
      volume |det lat|

    Example::

        w = np.linspace(0.0, 4.0, 201)
        sig = optical_conductivity(graphene, w, occ=[0], nk=(201, 201))
        absorption = sig[0, 0].real       # ~ pi/2 e^2/h plateau
    """
    if model._dim_k != model._dim_r or model._dim_k not in (2, 3):
        raise PythtbError(
            "optical_conductivity requires a fully periodic 2-D or 3-D "
            "model (dim_k == dim_r)"
        )
    if (occ is None) == (fermi is None):
        raise PythtbError("give exactly one of occ / fermi")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k:
        raise PythtbError("nk must give one grid size per k-direction")
    static, data = model._get_finalized()
    occ_t = None
    if occ is not None:
        occ_t = tuple(int(x) for x in np.atleast_1d(occ))
        if len(set(occ_t)) != len(occ_t) or any(
            not (0 <= o < static.nsta) for o in occ_t
        ):
            raise PythtbError("occ must be distinct state indices")
        mu_t = jnp.zeros((2,), config.float_dtype())
    else:
        mu_t = jnp.asarray(
            [float(fermi), float(temperature)], config.float_dtype()
        )
    lat = np.asarray(model._lat, dtype=np.float64)
    vol = abs(np.linalg.det(lat))
    omegas = np.asarray(omegas, dtype=np.float64).reshape(-1)
    ftype = config.float_dtype()
    out = _optical_jit(
        static,
        data,
        nk,
        occ_t,
        mu_t,
        jnp.asarray(omegas, ftype),
        jnp.asarray(float(eta), ftype),
        jnp.asarray(lat, ftype),
    )
    return host_unpack(np.asarray(jax.device_get(out))) / vol


# ---------------------------------------------------------------------------
# Shift current (second-order DC response / bulk photovoltaic effect)
# ---------------------------------------------------------------------------


def _band_tensors(static, data, nk, lat, need_d2=True):
    """Grid solve: returns (evals, vecs, V, W2) -- eigenvectors (rows
    are states), band-basis Cartesian velocity V (B, d, S, S), and
    (when ``need_d2``) second-derivative W2 (B, d, d, S, S) matrix
    elements.  Callers needing more band-basis operators (e.g. the
    spin current) MUST build them from the returned ``vecs`` -- a
    separate eigh would only coincide by unguaranteed CSE."""
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_d2k, assemble_dk
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    dim = static.dim_k
    kpts = device_uniform_grid(nk, jnp.zeros((dim,), config.float_dtype()))
    H = assemble(static, data, kpts)
    evals, vecs = eigh_batched(H)  # rows are states
    # complex-typed lattice: a mixed real x complex dot with tiny
    # (1, 1) shapes SIGABRTs the remote TPU compiler's complex-rewrite
    # pass (jellyfish X64Rewriter HandleDot, measured on axon)
    latj = jnp.asarray(lat, config.float_dtype()).astype(
        config.complex_dtype()
    )
    dH = assemble_dk(static, data, kpts)
    dHc = jnp.einsum("ra,brij->baij", latj, dH, precision=hp) / (2.0 * np.pi)
    V = jnp.einsum("bns,bast,bmt->banm", jnp.conj(vecs), dHc, vecs,
                   precision=hp)
    if not need_d2:
        return evals, vecs, V, None
    d2H = assemble_d2k(static, data, kpts)
    d2c = jnp.einsum(
        "ra,sc,brsij->bacij", latj, latj, d2H, precision=hp
    ) / ((2.0 * np.pi) ** 2)
    W2 = jnp.einsum("bns,bacst,bmt->bacnm", jnp.conj(vecs), d2c, vecs,
                    precision=hp)
    return evals, vecs, V, W2


def _gen_derivative(evals, V, W2, tiny):
    """Sum-rule generalized derivative of the interband position matrix
    (Sipe-Shkrebtii PRB 61, 5337 (2000), Appendix; the form used by
    Wannier90's berry module):

    ``r^{c;a}_{nm} = (i/D_nm)[ (V^a_nm Dl^c_nm + V^c_nm Dl^a_nm)/D_nm
    - W2^{ac}_nm + S3^{ac}_nm ]``

    with ``D_nm = e_n - e_m``, ``Dl^a_nm = V^a_nn - V^a_mm`` and the
    three-band sum ``S3^{ac}_nm = sum_{p != n,m} (V^a_np V^c_pm / D_pm
    - V^c_np V^a_pm / D_np)``.  Exact linear algebra in H, dH, d2H --
    gauge invariance by construction (no Berry-connection derivative
    ever formed).  Pairs with |D| < tiny are masked to zero (exact
    degeneracies carry no spectral weight downstream).

    Returns (r (B, d, S, S), rgen (B, d, d, S, S)) where
    ``rgen[:, a, c]`` holds ``r^{c;a}``."""
    hp = jax.lax.Precision.HIGHEST
    D = evals[:, :, None] - evals[:, None, :]  # D[n, m] = e_n - e_m
    mask = jnp.abs(D) > tiny
    inv = jnp.where(mask, 1.0 / jnp.where(mask, D, 1.0), 0.0)
    invc = inv.astype(V.dtype)
    r = -1j * V * invc[:, None]  # r^a_nm = -i V^a_nm / D_nm (n != m)
    Vd = jnp.einsum("bann->ban", V)  # diagonal band velocities (real)
    Dl = Vd[:, :, :, None] - Vd[:, :, None, :]  # Dl[a, n, m]
    # full three-band sums including the p = n / p = m terms, which are
    # then subtracted explicitly (inv already kills p == m / p == n
    # degenerate-energy poles)
    full1 = jnp.einsum(
        "banp,bcpm->bacnm", V, V * invc[:, None], precision=hp
    )
    c1 = Vd[:, :, None, :, None] * V[:, None, :] * invc[:, None, None]
    # c1[a, c, n, m] = V^a_nn V^c_nm / D_nm
    full2 = jnp.einsum(
        "bcnp,bapm->bacnm", V * invc[:, None], V, precision=hp
    )
    c2 = V[:, None, :] * Vd[:, :, None, None, :] * invc[:, None, None]
    # c2[a, c, n, m] = V^c_nm V^a_mm / D_nm  (second sum's p = m term)
    S3 = (full1 - c1) - (full2 - c2)
    bracket = (
        (V[:, :, None] * Dl[:, None, :].astype(V.dtype)
         + V[:, None, :] * Dl[:, :, None].astype(V.dtype))
        * invc[:, None, None]
        - W2
        + S3
    )
    rgen = 1j * bracket * invc[:, None, None]
    zero = jnp.zeros((), V.dtype)
    rgen = jnp.where(mask[:, None, None], rgen, zero)
    r = jnp.where(mask[:, None], r, zero)
    return r, rgen


@partial(jax.jit, static_argnums=(0, 2, 3))
def _shift_jit(static, data, nk, occ, omegas, sigma, lat):
    evals, _vecs, V, W2 = _band_tensors(static, data, nk, lat)
    r, rgen = _gen_derivative(evals, V, W2, 1e-7)
    occ_idx = jnp.asarray(occ, jnp.int32)
    unocc_idx = jnp.asarray(
        [s for s in range(static.nsta) if s not in occ], jnp.int32
    )
    # r^b_{mn}: m unocc, n occ -> transpose to (B, d, no, nu)
    r_mn = jnp.swapaxes(
        r[:, :, unocc_idx][:, :, :, occ_idx], -1, -2
    )  # (B, d, no, nu)
    rg_nm = rgen[:, :, :, occ_idx][..., unocc_idx]  # (B, a, c, no, nu)
    # Im[r^b_mn r^{c;a}_nm + r^c_mn r^{b;a}_nm]
    t1 = jnp.einsum("bdnm,bacnm->badcnm", r_mn, rg_nm)  # b index at pos 2
    W = jnp.imag(t1 + jnp.swapaxes(t1, 2, 3))  # (B, a, b, c, no, nu)
    de = (
        evals[:, None, unocc_idx] - evals[:, occ_idx, None]
    )  # (B, no, nu): e_m - e_n
    dim = static.dim_k
    Wf = W.reshape(W.shape[0], dim**3, -1).transpose(1, 0, 2).reshape(
        dim**3, -1
    )
    def_ = de.reshape(-1)
    T = def_.shape[0]
    pad = (-T) % _CHUNK
    de_p = jnp.pad(def_, (0, pad), constant_values=1.0e30)
    W_p = jnp.pad(Wf, ((0, 0), (0, pad)))
    nch = de_p.shape[0] // _CHUNK
    de_c = de_p.reshape(nch, _CHUNK)
    W_c = jnp.moveaxis(W_p.reshape(dim**3, nch, _CHUNK), 0, 1)
    hp = jax.lax.Precision.HIGHEST
    gnorm = 1.0 / (sigma * np.sqrt(2.0 * np.pi))

    def body(acc, ch):
        de_i, W_i = ch
        x = (omegas[None, :] - de_i[:, None]) / sigma
        g = jnp.exp(-0.5 * x * x) * gnorm  # (C, nw)
        return acc + jnp.einsum("pc,cw->pw", W_i, g, precision=hp), None

    acc0 = jnp.zeros((dim**3, omegas.shape[0]), dtype=W_c.dtype)
    acc, _ = jax.lax.scan(body, acc0, (de_c, W_c))
    norm = -np.pi / (2.0 * float(np.prod(nk)))
    return acc.reshape(dim, dim, dim, -1) * norm


def shift_current(model, omegas, occ, nk=(101, 101), sigma=0.05):
    """Shift-current conductivity tensor ``sigma^{abc}(omega)`` -- the
    DC photocurrent response of a clean insulator to linearly polarized
    light (bulk photovoltaic effect),

    ``J_a(0) = 2 sigma^{abc}(0; omega, -omega) E_b(omega) E_c(-omega)``

    evaluated in the standard Sipe-Shkrebtii form

    ``sigma^{abc}(w) = -(pi/2) (1/(N_k V_c)) sum_{k, n occ, m unocc}
    Im[r^b_mn r^{c;a}_nm + r^c_mn r^{b;a}_nm] delta_sigma(e_m - e_n - w)``

    with the generalized derivative ``r^{c;a}`` computed by the exact
    sum rule over H, dH/dk, d2H/dk2 band matrix elements (no
    Berry-connection derivative is ever formed -- gauge invariant by
    construction, verified against a finite-difference covariant
    derivative oracle in the tests).  Requires only the nonzero second
    derivative of H: second-order response exists for any model whose
    hops span more than a point.  Vanishes identically for
    centrosymmetric models (tested); for polar models (Rice-Mele, BN)
    the sign follows the polarization direction.

    One device program: grid solve + velocity/curvature tensors +
    chunked Gaussian frequency contraction.

    :param model: fully periodic model (``dim_k == dim_r``)
    :param omegas: photon energies (> 0 for absorption)
    :param occ: occupied band indices
    :param nk: k-grid
    :param sigma: Gaussian delta broadening (energy units)
    :returns: real ``(dim, dim, dim, nw)`` array (units e^3/hbar in
      lattice length units, divided by the cell volume): indices
      ``[a, b, c]`` = current direction, field, field

    Caveat: the sum rule assumes non-degenerate intermediate states;
    exactly degenerate pairs are masked out (zero weight), which is
    correct for isolated degeneracies of measure zero on the grid.
    """
    if model._dim_k != model._dim_r or model._dim_k < 1:
        raise PythtbError(
            "shift_current requires a fully periodic model (dim_k == dim_r)"
        )
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k:
        raise PythtbError("nk must give one grid size per k-direction")
    static, data = model._get_finalized()
    occ_t = tuple(int(x) for x in np.atleast_1d(occ))
    if len(set(occ_t)) != len(occ_t) or any(
        not (0 <= o < static.nsta) for o in occ_t
    ):
        raise PythtbError("occ must be distinct state indices")
    if len(occ_t) == static.nsta:
        raise PythtbError("occ fills every state; no interband transitions")
    lat = np.asarray(model._lat, dtype=np.float64)
    vol = abs(np.linalg.det(lat))
    omegas = np.asarray(omegas, dtype=np.float64).reshape(-1)
    ftype = config.float_dtype()
    out = _shift_jit(
        static, data, nk, occ_t, jnp.asarray(omegas, ftype),
        jnp.asarray(float(sigma), ftype), jnp.asarray(lat, ftype),
    )
    return np.asarray(jax.device_get(out), dtype=np.float64) / vol


@partial(jax.jit, static_argnums=(0, 2, 3))
def _injection_jit(static, data, nk, occ, omegas, sigma, lat):
    evals, _vecs, V, _W2 = _band_tensors(static, data, nk, lat, need_d2=False)
    D = evals[:, :, None] - evals[:, None, :]
    mask = jnp.abs(D) > 1e-7
    inv = jnp.where(mask, 1.0 / jnp.where(mask, D, 1.0), 0.0)
    r = -1j * V * inv.astype(V.dtype)[:, None]
    r = jnp.where(mask[:, None], r, jnp.zeros((), V.dtype))
    Vd = jnp.real(jnp.einsum("bann->ban", V))  # (B, d, S)
    occ_idx = jnp.asarray(occ, jnp.int32)
    unocc_idx = jnp.asarray(
        [s for s in range(static.nsta) if s not in occ], jnp.int32
    )
    r_nm = r[:, :, occ_idx][..., unocc_idx]  # (B, b, no, nu)
    # Delta^a_{mn} = v^a_mm - v^a_nn  (m unocc, n occ) -> (B, a, no, nu)
    dV = Vd[:, :, unocc_idx][:, :, None, :] - Vd[:, :, occ_idx][:, :, :, None]
    # Im[r^b_nm r^c_mn] with r^c_mn = conj(r^c_nm) (r is Hermitian)
    rr = jnp.einsum("bdnm,bcnm->bdcnm", r_nm, jnp.conj(r_nm))
    W = dV[:, :, None, None] * jnp.imag(rr)[:, None]  # (B, a, b, c, no, nu)
    de = (evals[:, None, unocc_idx] - evals[:, occ_idx, None])
    dim = static.dim_k
    Wf = W.reshape(W.shape[0], dim**3, -1).transpose(1, 0, 2).reshape(
        dim**3, -1
    )
    def_ = de.reshape(-1)
    T = def_.shape[0]
    pad = (-T) % _CHUNK
    de_p = jnp.pad(def_, (0, pad), constant_values=1.0e30)
    W_p = jnp.pad(Wf, ((0, 0), (0, pad)))
    nch = de_p.shape[0] // _CHUNK
    de_c = de_p.reshape(nch, _CHUNK)
    W_c = jnp.moveaxis(W_p.reshape(dim**3, nch, _CHUNK), 0, 1)
    hp = jax.lax.Precision.HIGHEST
    gnorm = 1.0 / (sigma * np.sqrt(2.0 * np.pi))

    def body(acc, ch):
        de_i, W_i = ch
        x = (omegas[None, :] - de_i[:, None]) / sigma
        g = jnp.exp(-0.5 * x * x) * gnorm
        return acc + jnp.einsum("pc,cw->pw", W_i, g, precision=hp), None

    acc0 = jnp.zeros((dim**3, omegas.shape[0]), dtype=W_c.dtype)
    acc, _ = jax.lax.scan(body, acc0, (de_c, W_c))
    norm = 2.0 * np.pi / float(np.prod(nk))
    return acc.reshape(dim, dim, dim, -1) * norm


def injection_current(model, omegas, occ, nk=(101, 101), sigma=0.05):
    """Injection-current (circular photogalvanic) tensor
    ``eta^{abc}(omega)`` -- the RATE of DC current injection under
    illumination, ``dJ_a/dt = 2 eta^{abc}(0; omega, -omega) E_b(omega)
    E_c(-omega)``, in the clean-insulator Sipe-Shkrebtii form

    ``eta^{abc}(w) = (2 pi / (N_k V_c)) sum_{k, n occ, m unocc}
    Delta^a_{mn} Im[r^b_{nm} r^c_{mn}] delta_sigma(e_mn - w)``

    with ``Delta^a_{mn} = v^a_{mm} - v^a_{nn}`` the group-velocity
    difference.  Only the (b, c)-antisymmetric part survives (circular
    polarization); time-reversal symmetry forces the whole tensor to
    zero (both tested), so a nonzero eta requires broken TRS (e.g.
    Haldane) or, in 3-D, gyrotropy (Weyl CPGE).  The two-band identity
    ``sum_m 2 Im[r^x_{nm} r^y_{mn}] = -Omega_n`` ties the integrand to
    the Berry curvature (differential oracle in the tests).

    Same conventions/units machinery as :func:`shift_current` (units
    e^3/hbar^2 x energy, lattice units, divided by cell volume;
    multiply by a relaxation time for a steady-state current).
    """
    if model._dim_k != model._dim_r or model._dim_k < 1:
        raise PythtbError(
            "injection_current requires a fully periodic model "
            "(dim_k == dim_r)"
        )
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k:
        raise PythtbError("nk must give one grid size per k-direction")
    static, data = model._get_finalized()
    occ_t = tuple(int(x) for x in np.atleast_1d(occ))
    if len(set(occ_t)) != len(occ_t) or any(
        not (0 <= o < static.nsta) for o in occ_t
    ):
        raise PythtbError("occ must be distinct state indices")
    if len(occ_t) == static.nsta:
        raise PythtbError("occ fills every state; no interband transitions")
    lat = np.asarray(model._lat, dtype=np.float64)
    vol = abs(np.linalg.det(lat))
    omegas = np.asarray(omegas, dtype=np.float64).reshape(-1)
    ftype = config.float_dtype()
    out = _injection_jit(
        static, data, nk, occ_t, jnp.asarray(omegas, ftype),
        jnp.asarray(float(sigma), ftype), jnp.asarray(lat, ftype),
    )
    return np.asarray(jax.device_get(out), dtype=np.float64) / vol


@partial(jax.jit, static_argnums=(0, 2, 3))
def _jdos_jit(static, data, nk, occ, omegas, sigma):
    from .ops.eigh import eigvalsh_batched
    from .ops.hamiltonian import assemble
    from .ops.solver import device_uniform_grid

    dim = static.dim_k
    kpts = device_uniform_grid(nk, jnp.zeros((dim,), config.float_dtype()))
    evals = eigvalsh_batched(assemble(static, data, kpts))  # (B, S)
    occ_idx = jnp.asarray(occ, jnp.int32)
    unocc_idx = jnp.asarray(
        [s for s in range(static.nsta) if s not in occ], jnp.int32
    )
    de = (
        evals[:, None, unocc_idx] - evals[:, occ_idx, None]
    ).reshape(-1)  # e_unocc - e_occ > 0 for gapped fillings
    norm = 1.0 / (float(np.prod(nk)) * sigma * np.sqrt(2.0 * np.pi))
    x = (omegas[None, :] - de[:, None]) / sigma
    return jnp.sum(jnp.exp(-0.5 * x * x), axis=0) * norm


def joint_dos(model, omegas, occ, nk=(101, 101), sigma=0.05):
    """Joint density of states ``J(w) = (1/N_k) sum_{k, n occ, m unocc}
    delta_sigma(w - (e_m - e_n))`` with Gaussian broadening -- the
    phase-space factor of interband absorption; its onset marks the
    direct gap.  Integrates to ``n_occ * n_unocc``.

    Works for any ``dim_k >= 1``.  One device program.
    """
    if model._dim_k < 1:
        raise PythtbError("joint_dos requires a periodic model")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k:
        raise PythtbError("nk must give one grid size per k-direction")
    static, data = model._get_finalized()
    occ_t = tuple(int(x) for x in np.atleast_1d(occ))
    if len(set(occ_t)) != len(occ_t) or any(
        not (0 <= o < static.nsta) for o in occ_t
    ):
        raise PythtbError("occ must be distinct state indices")
    if len(occ_t) == static.nsta:
        raise PythtbError("occ fills every state; no interband transitions")
    omegas = np.asarray(omegas, dtype=np.float64).reshape(-1)
    ftype = config.float_dtype()
    out = _jdos_jit(
        static, data, nk, occ_t, jnp.asarray(omegas, ftype),
        jnp.asarray(float(sigma), ftype),
    )
    return np.asarray(jax.device_get(out), dtype=np.float64)


# ---------------------------------------------------------------------------
# time-domain nonlinear response (exact Peierls gauge)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 2, 3, 8))
def _td_current_jit(static, data, nk, occ, dks_mid, dks_out, dt, lat,
                    mesh=None):
    """Exact time evolution of the filled bands under a uniform vector
    potential and the resulting macroscopic current.

    The Peierls substitution for a spatially uniform A(t) is EXACT for
    tight binding: H(t) = H(k + A_red(t)).  Each step applies the
    midpoint propagator exp(-i H(k + A(t_mid)) dt) to the occupied
    block (one batched eigh per step, matmul rotation -- the same
    pattern as floquet._propagation_scan) and reads out the
    minimal-coupling current j^a = (1/N_k) sum_{k, occ}
    <psi| dH/dk_cart_a (k + A) |psi> at the step end.

    dks_mid / dks_out: (nt, d) REDUCED A at step midpoints / ends.
    Returns (nt, d_cart) real currents per unit cell.
    """
    from .ops.eigh import eigh_batched
    from .ops.hamiltonian import assemble, assemble_dk
    from .ops.solver import device_uniform_grid

    hp = jax.lax.Precision.HIGHEST
    d = static.dim_k
    kg = device_uniform_grid(nk, jnp.zeros((d,), config.float_dtype()))
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        kg = shard_grid_axis0(kg, mesh)
    occ_idx = jnp.asarray(occ, jnp.int32)
    _, v0 = eigh_batched(assemble(static, data, kg))
    psi = v0[:, occ_idx, :]  # (B, nocc, S) rows are states
    latj = jnp.asarray(lat).astype(config.complex_dtype())

    def step(psi, dk):
        dk_mid, dk_out = dk
        w, V = eigh_batched(assemble(static, data, kg + dk_mid[None, :]))
        phase = jnp.exp(jax.lax.complex(jnp.zeros_like(w), -w * dt))
        U = jnp.einsum("bns,bn,bnt->bst", V, phase, jnp.conj(V),
                       precision=hp)
        psi = jnp.einsum("bst,bmt->bms", U, psi, precision=hp)
        dH = assemble_dk(static, data, kg + dk_out[None, :])
        dHc = jnp.einsum("ra,brij->baij", latj, dH,
                         precision=hp) / (2.0 * np.pi)
        j = jnp.real(jnp.einsum("bms,bast,bmt->a", jnp.conj(psi), dHc,
                                psi, precision=hp)) / kg.shape[0]
        return psi, j

    _, js = jax.lax.scan(step, psi, (dks_mid, dks_out))
    return js


@partial(jax.jit, static_argnums=(0, 2, 3, 8))
def _td_current_batch_jit(static, data, nk, occ, dks_mid, dks_out, dts,
                          lat, mesh=None):
    """vmap of :func:`_td_current_jit` over a frequency batch: inputs
    carry a leading (nw,) axis ((nw, nt, d), (nw,)); one compiled
    program runs every drive frequency's full evolution (with a mesh
    the k-grid of each shards over the devices)."""
    return jax.vmap(
        lambda m, o, t: _td_current_jit(static, data, nk, occ, m, o, t,
                                        lat, mesh)
    )(dks_mid, dks_out, dts)


def harmonic_spectrum(model, omega, efield, occ, nk=(48, 48), cycles=24,
                      ramp_cycles=8, steps_per_cycle=96, n_harmonics=5,
                      pol=None):
    """Nonlinear optical response by EXACT time evolution: drive the
    filled bands with ``E(t) = E0 cos(omega t)`` (sin^2-ramped over
    ``ramp_cycles``), evolve with the exact Peierls-gauge Hamiltonian
    H(k + A(t)), and Fourier-analyze the current over the final
    integer periods.

    Nonperturbative and gauge-exact -- the workhorse for solid-state
    high-harmonic generation and the oracle for every frequency-domain
    response in this module: the n = 1 channel reproduces the Kubo
    :func:`optical_conductivity` (committed test), the n = 2 channel
    at small fields is the SHG conductivity, inversion symmetry kills
    all even harmonics (tested), and perturbative field scaling j_n ~
    E0^n holds until genuine non-perturbative physics takes over.

    :param omega: drive frequency, scalar or (nw,) array -- a batch
      runs every frequency's full evolution in ONE vmapped device
      program (choose 2*omega below the gap for a transparent-regime
      SHG measurement)
    :param efield: field amplitude E0 (energy / length units); scalar
    :param occ: filled bands (clean insulator)
    :param pol: Cartesian polarization vector (default x̂)
    :param cycles / ramp_cycles: total and ramp length in periods
      (the analysis window is the final ``cycles - ramp_cycles - 2``
      periods, minimum 1)
    :param steps_per_cycle: midpoint-propagator resolution
    :param n_harmonics: highest harmonic returned
    :returns: dict with ``harmonics`` ((n_harmonics + 1, d_cart)
      complex amplitudes C_n: j^a(t) ~ sum_n Re[C_n^a e^{-i n omega
      t}]), ``sigma1`` (the linear conductivity in the
      optical_conductivity units), and ``sigma2`` (the SHG
      conductivity); an omega batch prepends an (nw,) axis to each
    """
    static, data = model._get_finalized()
    if static.dim_k != model._dim_r:
        raise PythtbError("harmonic_spectrum requires a fully periodic "
                          "model")
    d = static.dim_k
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != d:
        raise PythtbError("nk must give %d sizes" % d)
    occ_t = tuple(int(o) for o in np.atleast_1d(occ))
    if (len(occ_t) == 0 or len(set(occ_t)) != len(occ_t)
            or min(occ_t) < 0 or max(occ_t) >= static.nsta):
        raise PythtbError("occ must be distinct bands in range")
    omegas_in = np.atleast_1d(np.asarray(omega, dtype=np.float64))
    scalar_w = np.ndim(omega) == 0
    E0 = float(efield)
    pol_v = np.zeros(d)
    pol_v[0] = 1.0
    if pol is not None:
        pol_v = np.asarray(pol, dtype=np.float64)
        if pol_v.shape != (d,):
            raise PythtbError("pol must have %d components" % d)
        pol_v = pol_v / np.linalg.norm(pol_v)
    cycles = int(cycles)
    ramp_cycles = int(ramp_cycles)
    spc = int(steps_per_cycle)
    if cycles - ramp_cycles < 3:
        raise PythtbError("need at least 3 cycles after the ramp")
    nt = cycles * spc
    lat = np.asarray(model._lat, dtype=np.float64)
    nw = len(omegas_in)
    dks_mid = np.zeros((nw, nt, d))
    dks_out = np.zeros((nw, nt, d))
    dts = np.zeros(nw)
    for iw, om in enumerate(omegas_in):
        T = 2.0 * np.pi / om
        dt = T / spc
        dts[iw] = dt
        # E(t) = E0 r(t) cos(w t); A = -int E dt (fine host trapezoid)
        tfine = np.arange(2 * nt + 1) * (dt / 2.0)
        tr = ramp_cycles * T
        env = np.where(tfine < tr,
                       np.sin(0.5 * np.pi * tfine / max(tr, 1e-300)) ** 2,
                       1.0)
        Efine = E0 * env * np.cos(om * tfine)
        Afine = -np.concatenate([[0.0], np.cumsum(
            0.5 * (Efine[1:] + Efine[:-1]) * (dt / 2.0))])
        A_mid = Afine[1::2][:nt]   # midpoints t_s + dt/2
        A_out = Afine[2::2][:nt]   # step ends
        # reduced shift: dk_red = lat @ A_cart / (2 pi)
        dks_mid[iw] = (A_mid[:, None] * pol_v[None, :]) @ lat.T / (2.0 * np.pi)
        dks_out[iw] = (A_out[:, None] * pol_v[None, :]) @ lat.T / (2.0 * np.pi)
    ftype = config.float_dtype()
    from .parallel import mesh as pmesh

    js = np.asarray(jax.device_get(_td_current_batch_jit(
        static, data, nk, occ_t, jnp.asarray(dks_mid, ftype),
        jnp.asarray(dks_out, ftype), jnp.asarray(dts, ftype),
        jnp.asarray(lat, ftype), pmesh.current_mesh(),
    )), dtype=np.float64)  # (nw, nt, d)
    # analysis window: final integer periods, skipping 2 settle cycles
    nwin = max(1, cycles - ramp_cycles - 2)
    sl = slice(nt - nwin * spc, nt)
    nH = int(n_harmonics)
    vol = abs(np.linalg.det(lat))
    C = np.zeros((nw, nH + 1, d), dtype=complex)
    for iw, om in enumerate(omegas_in):
        twin = (np.arange(nt) * dts[iw] + dts[iw])[sl]
        jwin = js[iw, sl]
        for n in range(nH + 1):
            w_ = np.exp(1.0j * n * om * twin)
            C[iw, n] = (2.0 if n else 1.0) * (w_[:, None] * jwin).mean(axis=0)
    # -2 pi: converts the raw e = hbar = 1 current amplitudes to the
    # e^2/h units and phase convention of optical_conductivity (locked
    # by the committed linear-channel oracle below AND above the gap)
    out = {
        "harmonics": C / vol,
        "sigma1": -2.0 * np.pi * C[:, 1] / E0 / vol,
        "sigma2": -2.0 * np.pi * C[:, 2] / E0**2 / vol,
        "current": js / vol,  # same density normalization as harmonics
        "dt": dts,
    }
    if scalar_w:
        out = {k: (v[0] if k != "dt" else float(v[0]))
               for k, v in out.items()}
    return out
