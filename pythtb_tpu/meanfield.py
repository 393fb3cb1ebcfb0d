"""Self-consistent mean-field theory: Hubbard Hartree-Fock and BCS/BdG.

The reference is strictly single-particle (pythtb.py has no interaction
machinery at all); this module adds the two canonical mean-field
decouplings on top of the package's assemble -> batched-eigh engines,
with the WHOLE self-consistency loop compiled as one device program
(``lax.while_loop`` around assemble + eigh + Fermi occupation +
density/gap update + linear mixing) -- zero host round trips until the
converged scalars come back.

* :func:`hartree_fock` -- collinear Hubbard-U decoupling
  ``U n_up n_dn -> U (<n_up> n_dn + n_up <n_dn> - <n_up><n_dn>)`` on a
  spinless (spin-degenerate) model treated as two spin species sharing
  one chemical potential.  Captures Stoner ferromagnetism,
  antiferromagnetism on bipartite lattices (the honeycomb Hubbard AFM
  transition), flat-band magnetism (Lieb), and interaction-induced gap
  opening; the converged fields come back as per-spin effective
  ``tb_model`` objects so every downstream observable in the package
  (Chern numbers, Wilson loops, surfaces, transport) composes with the
  interacting state.
* :func:`bcs_gap` -- s-wave singlet pairing ``Delta_i = g <c_idn
  c_iup>`` solved in the Bogoliubov-de Gennes form; the Nambu
  convention matches :func:`pythtb_tpu.geometry.superfluid_weight`
  (hole block ``-conj(H(-k)) + mu``), so the converged ``Delta`` feeds
  the superfluid-weight machinery directly.

Oracles (committed tests): an INDEPENDENT dense NumPy Hartree-Fock
loop (separate code path, no JAX) at 1e-8; the analytic 1-orbital
Stoner/AFM gap equations solved by scalar root finding; the BCS gap
equation ``1/g = (1/N) sum_k tanh(E_k / 2T) / (2 E_k)`` on the square
lattice; exact 2-site Hubbard ED bounds (HF energy is variational).
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .ops.eigh import eigh_batched
from .ops.hamiltonian import assemble

__all__ = ["hartree_fock", "bcs_gap"]


def _fermi(x):
    """Fermi function 1/(e^x + 1), overflow-stable."""
    return 0.5 * (1.0 - jnp.tanh(0.5 * jnp.clip(x, -80.0, 80.0)))


def _bisect_mu(w, kt, n_target, norm, iters=80):
    """Chemical potential with sum_all f((e - mu)/kt) / norm ==
    n_target.  Fixed-length bisection: jit-friendly."""
    lo = jnp.min(w) - 30.0 * kt
    hi = jnp.max(w) + 30.0 * kt

    def count(mu):
        return jnp.sum(_fermi((w - mu) / kt)) / norm

    def step(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        too_few = count(mid) < n_target
        return (jnp.where(too_few, mid, lo), jnp.where(too_few, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    return 0.5 * (lo + hi)


@partial(jax.jit, static_argnums=(0, 6, 10))
def _hf_scf_jit(static, data, kpts, Uvec, n_init, kt, max_iters, mix, tol,
                n_elec, mesh=None):
    """One-program Hubbard-HF fixed point.  Returns per-spin densities
    (2, norb), mu, free-band total energy pieces, gap, iteration count
    and final density change -- all real (nothing complex crosses the
    boundary)."""
    H0 = assemble(static, data, kpts)  # (B, n, n) complex, n == norb
    if mesh is not None:
        # k-grid data parallelism: every SCF iteration's eigh/density
        # einsum shards over the batch; XLA inserts the psum for the
        # k-averaged densities and the mu bisection count
        from .ops.solver import shard_grid_axis0

        H0 = shard_grid_axis0(H0, mesh)
    B = H0.shape[0]
    n = H0.shape[-1]
    eye = jnp.eye(n, dtype=H0.dtype)

    def spectra(n_ud):
        # spin-up sees U n_dn, spin-dn sees U n_up
        pot = jnp.stack([Uvec * n_ud[1], Uvec * n_ud[0]])  # (2, n)
        H = H0[None] + pot[:, None, :, None] * eye  # (2, B, n, n)
        return eigh_batched(H)  # (2, B, n), (2, B, n, n)

    hp = jax.lax.Precision.HIGHEST

    def dens_of(w, v, mu):
        f = _fermi((w - mu) / kt)  # (2, B, n)
        return jnp.einsum("sbn,sbni->si", f, jnp.abs(v) ** 2,
                          precision=hp) / B

    def body(carry):
        n_ud, _, i = carry
        w, v = spectra(n_ud)
        mu = _bisect_mu(w, kt, n_elec, B)  # n_elec per cell, both spins
        new = dens_of(w, v, mu)
        mixed = (1.0 - mix) * n_ud + mix * new
        dn = jnp.max(jnp.abs(mixed - n_ud))
        return mixed, dn, i + 1

    def cond(carry):
        _, dn, i = carry
        return jnp.logical_and(i < max_iters, dn > tol)

    n_ud, dn, iters = jax.lax.while_loop(
        cond, body,
        (n_init, jnp.asarray(jnp.inf, n_init.dtype), jnp.int32(0)),
    )

    # converged observables, one more diagonalization
    w, v = spectra(n_ud)
    mu = _bisect_mu(w, kt, n_elec, B)
    f = _fermi((w - mu) / kt)
    e_band = jnp.sum(f * w) / B
    e_dc = jnp.sum(Uvec * n_ud[0] * n_ud[1])  # double-counting correction
    energy = e_band - e_dc
    below = jnp.where(w < mu, w, -jnp.inf)
    above = jnp.where(w > mu, w, jnp.inf)
    gap = jnp.min(above) - jnp.max(below)
    return n_ud, mu, energy, gap, iters, dn


@partial(jax.jit, static_argnums=(0, 6, 10))
def _hf2_scf_jit(static, data, kpts, Uvec, rho_init_ri, kt, max_iters, mix,
                 tol, n_elec, mesh=None):
    """One-program FULL-MATRIX (noncollinear) Hubbard-HF fixed point
    for explicit-spin models: the order parameter is the on-site 2x2
    spin density matrix rho_i = <c_{i alpha}^dag c_{i beta}>, and the
    mean field is ``V_i = U_i (Tr(rho_i) I - rho_i^T)`` (Hartree +
    spin-flip Fock in one expression; the collinear limit reduces to
    the two-species form).  Double counting: ``E_dc = U det(rho_i)``
    (= <n_up><n_dn> - |<c_up^dag c_dn>|^2).  rho crosses the host
    boundary ri-packed."""
    from .utils.xfer import pack_cplx, unpack_cplx

    H0 = assemble(static, data, kpts)  # (B, nsta, nsta), nsta = 2 norb
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        H0 = shard_grid_axis0(H0, mesh)
    B = H0.shape[0]
    nsta = H0.shape[-1]
    norb = nsta // 2
    eye_orb = jnp.eye(norb, dtype=H0.dtype)
    hp = jax.lax.Precision.HIGHEST

    def spectra(rho):
        V = Uvec[:, None, None] * (
            jnp.trace(rho, axis1=-2, axis2=-1)[:, None, None]
            * jnp.eye(2, dtype=H0.dtype)
            - jnp.swapaxes(rho, -1, -2)
        )  # (norb, 2, 2) Hermitian
        D = jnp.einsum("ij,iab->iajb", eye_orb, V).reshape(nsta, nsta)
        return eigh_batched(H0 + D[None])

    def rho_of(w, v, mu):
        f = _fermi((w - mu) / kt)  # (B, nsta)
        vb = v.reshape(B, nsta, norb, 2)  # state components per (orb, spin)
        return jnp.einsum("kn,knia,knib->iab", f.astype(H0.dtype),
                          jnp.conj(vb), vb, precision=hp) / B

    def body(carry):
        rho, _, i = carry
        w, v = spectra(rho)
        mu = _bisect_mu(w, kt, n_elec, B)
        new = rho_of(w, v, mu)
        mixed = (1.0 - mix) * rho + mix * new
        # keep the iterate exactly Hermitian (mix of Hermitians is, up
        # to roundoff; drift compounds over hundreds of iterations)
        mixed = (mixed + jnp.conj(jnp.swapaxes(mixed, -1, -2))) / 2.0
        dr = jnp.max(jnp.abs(mixed - rho))
        return mixed, dr, i + 1

    def cond(carry):
        _, dr, i = carry
        return jnp.logical_and(i < max_iters, dr > tol)

    rho0 = unpack_cplx(rho_init_ri)
    rho, dr, iters = jax.lax.while_loop(
        cond, body,
        (rho0, jnp.asarray(jnp.inf, jnp.real(rho0).dtype), jnp.int32(0)),
    )

    w, v = spectra(rho)
    mu = _bisect_mu(w, kt, n_elec, B)
    f = _fermi((w - mu) / kt)
    e_band = jnp.sum(f * w) / B
    dets = (rho[:, 0, 0] * rho[:, 1, 1] - rho[:, 0, 1] * rho[:, 1, 0])
    energy = e_band - jnp.sum(Uvec * jnp.real(dets))
    below = jnp.where(w < mu, w, -jnp.inf)
    above = jnp.where(w > mu, w, jnp.inf)
    gap = jnp.min(above) - jnp.max(below)
    return pack_cplx(rho), mu, energy, gap, iters, dr


def _kgrid(model, nk):
    """Uniform closed k-grid (B, dim_k) for the mean-field BZ sums (or
    the single empty point for finite models)."""
    if model._dim_k == 0:
        return np.zeros((1, 0), dtype=np.float64)
    if nk is None:
        raise PythtbError("nk is required for a periodic model")
    nk = tuple(int(x) for x in np.atleast_1d(nk))
    if len(nk) != model._dim_k or min(nk) < 2:
        raise PythtbError("nk must give %d sizes >= 2" % model._dim_k)
    axes = [np.arange(m) / float(m) for m in nk]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grid], axis=-1)


def hartree_fock(model, U, n_elec, nk=None, temperature=None, init=None,
                 stagger=0.1, mix=0.5, tol=None, max_iters=500, seed=0):
    """Self-consistent Hubbard Hartree-Fock.

    A spinless model (``nspin == 1``) is treated as two degenerate spin
    species coupled only through the collinear mean field ``H_sigma =
    H_0 + U diag(<n_{-sigma}>)`` at a shared chemical potential.  An
    explicit-spin model (``nspin == 2``) dispatches to the FULL-MATRIX
    (noncollinear) decoupling on the on-site 2x2 spin density matrix
    ``rho_i``, mean field ``U_i (Tr(rho_i) I - rho_i^T)`` -- see the
    return-dict differences below.  Either way the whole fixed-point
    loop (assemble + batched eigh + Fermi filling + linear mixing)
    runs as ONE compiled device program.

    :param U: Hubbard repulsion, scalar or per-orbital (norb,)
    :param n_elec: total electrons per cell, both spins
      (0 < n_elec < 2 norb); half filling = norb
    :param nk: BZ grid sizes (periodic models; finite models omit it)
    :param temperature: Fermi smearing k_B T (default: 1e-3 of the
      spectral span -- effectively T = 0 for gapped solutions)
    :param init: optional (2, norb) starting densities; default is the
      uniform paramagnet plus a symmetry-breaking perturbation
    :param stagger: amplitude of the default perturbation (a seeded
      random +-stagger between the spin species; set 0 to lock the
      paramagnetic sector)
    :param mix: linear mixing weight of the new densities
    :param tol: fixed-point tolerance on max |density change| (default
      ``eps(device dtype)^(2/3)``: ~1e-10 on CPU x64, ~2e-5 on the f32
      TPU backend -- a fixed f64 tolerance would never converge there)
    :param max_iters: iteration cap (a ``UserWarning`` reports
      non-convergence)
    :returns: dict with ``n_up``/``n_dn`` (norb,), ``magnetization``
      (n_up - n_dn), ``mu``, ``energy`` (HF total energy per cell,
      double counting removed), ``gap`` (single-particle gap at mu),
      ``iters``, ``converged``, and ``model_up``/``model_dn`` --
      effective single-particle ``tb_model`` copies with the converged
      mean field added to the onsite energies (every downstream
      observable composes with them).  For ``nspin == 2`` the dict
      instead carries ``rho`` (norb, 2, 2), ``magnetization``
      (norb, 3) Pauli vectors, ``density`` (norb,), and a single
      spinful ``model_mf``.
    """
    if model._nspin == 2:
        return _hartree_fock_matrix(
            model, U, n_elec, nk=nk, temperature=temperature, init=init,
            stagger=stagger, mix=mix, tol=tol, max_iters=max_iters,
            seed=seed)
    norb = int(model._norb)
    Uvec = np.broadcast_to(np.asarray(U, dtype=np.float64).ravel(), (norb,))
    n_elec = float(n_elec)
    if not 0.0 < n_elec < 2.0 * norb:
        raise PythtbError("n_elec must be in (0, %d)" % (2 * norb))
    kpts = _kgrid(model, nk)
    static, data = model._get_finalized()

    span = float(np.abs(np.asarray(model._site_energies)).max() + 2.0 * sum(
        np.abs(np.asarray(h[0])).max() for h in model._hoppings
    ) + np.abs(Uvec).max() + 1e-9)
    kt = float(temperature) if temperature is not None else 1e-3 * span
    if kt <= 0.0:
        raise PythtbError("temperature must be > 0")

    if init is not None:
        n0 = np.asarray(init, dtype=np.float64)
        if n0.shape != (2, norb):
            raise PythtbError("init must be (2, norb) densities")
    else:
        base = n_elec / (2.0 * norb)
        rng = np.random.default_rng(seed)
        pert = float(stagger) * (rng.random(norb) - 0.5)
        n0 = np.stack([base + pert, base - pert])
        n0 = np.clip(n0, 0.0, 1.0)

    rdtype = np.dtype(jnp.zeros(0).dtype)
    if tol is None:
        tol = float(np.finfo(rdtype).eps) ** (2.0 / 3.0)
    from .parallel import mesh as pmesh

    out = _hf_scf_jit(
        static, data, jnp.asarray(kpts, rdtype), jnp.asarray(Uvec, rdtype),
        jnp.asarray(n0, rdtype), jnp.asarray(kt, rdtype), int(max_iters),
        jnp.asarray(float(mix), rdtype), jnp.asarray(float(tol), rdtype),
        jnp.asarray(n_elec, rdtype), pmesh.current_mesh(),
    )
    n_ud, mu, energy, gap, iters, dn = jax.device_get(out)  # ONE round trip
    n_ud = np.asarray(n_ud, dtype=np.float64)
    converged = bool(dn <= tol)
    if not converged:
        warnings.warn(
            "hartree_fock: not converged after %d iterations (last "
            "density change %.2e > tol %.1e) -- reduce mix or raise "
            "max_iters" % (int(iters), float(dn), tol),
            UserWarning, stacklevel=2,
        )

    import copy

    def _effective(n_other):
        eff = copy.deepcopy(model)
        eff.set_onsite((Uvec * n_other).tolist(), mode="add")
        return eff

    return {
        "n_up": n_ud[0],
        "n_dn": n_ud[1],
        "magnetization": n_ud[0] - n_ud[1],
        "mu": float(mu),
        "energy": float(energy),
        "gap": float(gap),
        "iters": int(iters),
        "converged": converged,
        "model_up": _effective(n_ud[1]),
        "model_dn": _effective(n_ud[0]),
    }


def _hartree_fock_matrix(model, U, n_elec, nk=None, temperature=None,
                         init=None, stagger=0.1, mix=0.5, tol=None,
                         max_iters=500, seed=0):
    """Full-matrix (noncollinear) Hubbard HF for explicit-spin models;
    dispatched automatically by :func:`hartree_fock` when
    ``nspin == 2``.  The order parameter is the on-site 2x2 spin
    density matrix, so spin-orbit-coupled interacting states with
    ARBITRARY magnetization directions are representable -- e.g. the
    Kane-Mele-Hubbard easy-plane antiferromagnet (committed test: at
    large U the Neel vector lies in the xy-plane, m_z = 0, because the
    SOC term penalizes out-of-plane order).

    Returns a dict with ``rho`` (norb, 2, 2), ``magnetization``
    (norb, 3) Pauli vectors Tr(rho sigma), ``density`` (norb,), ``mu``,
    ``energy``, ``gap``, ``iters``, ``converged``, and ``model_mf`` --
    ONE effective spinful ``tb_model`` with the converged 2x2 mean
    field added on-site.
    """
    from .utils.xfer import host_pack, host_unpack

    norb = int(model._norb)
    Uvec = np.broadcast_to(np.asarray(U, dtype=np.float64).ravel(), (norb,))
    n_elec = float(n_elec)
    if not 0.0 < n_elec < 2.0 * norb:
        raise PythtbError("n_elec must be in (0, %d)" % (2 * norb))
    kpts = _kgrid(model, nk)
    static, data = model._get_finalized()

    span = float(np.abs(np.asarray(model._site_energies)).max() + 2.0 * sum(
        np.abs(np.asarray(h[0])).max() for h in model._hoppings
    ) + np.abs(Uvec).max() + 1e-9)
    kt = float(temperature) if temperature is not None else 1e-3 * span
    if kt <= 0.0:
        raise PythtbError("temperature must be > 0")

    if init is not None:
        rho0 = np.asarray(init, dtype=np.complex128)
        if rho0.shape != (norb, 2, 2):
            raise PythtbError("init must be (norb, 2, 2) density matrices")
        if np.abs(rho0 - np.conj(np.swapaxes(rho0, -1, -2))).max() > 1e-10:
            raise PythtbError("init density matrices must be Hermitian")
    else:
        base = n_elec / (2.0 * norb)
        rng = np.random.default_rng(seed)
        rho0 = np.broadcast_to(
            base * np.eye(2), (norb, 2, 2)).astype(complex).copy()
        # random Hermitian perturbation: seeds collinear AND
        # noncollinear order on an equal footing
        pz = float(stagger) * (rng.random(norb) - 0.5)
        pxy = float(stagger) * (rng.random(norb) - 0.5) + 1j * float(
            stagger) * (rng.random(norb) - 0.5)
        rho0[:, 0, 0] += pz
        rho0[:, 1, 1] -= pz
        rho0[:, 0, 1] += pxy
        rho0[:, 1, 0] += np.conj(pxy)

    rdtype = np.dtype(jnp.zeros(0).dtype)
    if tol is None:
        tol = float(np.finfo(rdtype).eps) ** (2.0 / 3.0)
    from .parallel import mesh as pmesh

    out = _hf2_scf_jit(
        static, data, jnp.asarray(kpts, rdtype), jnp.asarray(Uvec, rdtype),
        jnp.asarray(host_pack(rho0), rdtype), jnp.asarray(kt, rdtype),
        int(max_iters), jnp.asarray(float(mix), rdtype),
        jnp.asarray(float(tol), rdtype), jnp.asarray(n_elec, rdtype),
        pmesh.current_mesh(),
    )
    rho_ri, mu, energy, gap, iters, dr = jax.device_get(out)
    rho = host_unpack(np.asarray(rho_ri)).astype(np.complex128)
    converged = bool(dr <= tol)
    if not converged:
        import warnings

        warnings.warn(
            "hartree_fock: not converged after %d iterations (last "
            "density change %.2e > tol %.1e) -- reduce mix or raise "
            "max_iters" % (int(iters), float(dr), tol),
            UserWarning, stacklevel=3,
        )

    sig = np.array([[[0, 1], [1, 0]], [[0, -1j], [1j, 0]],
                    [[1, 0], [0, -1]]])
    mag = np.real(np.einsum("iab,sba->is", rho, sig))

    import copy

    eff = copy.deepcopy(model)
    V = Uvec[:, None, None] * (
        np.trace(rho, axis1=-2, axis2=-1)[:, None, None] * np.eye(2)
        - np.swapaxes(rho, -1, -2))
    eff.set_onsite([V[i] for i in range(norb)], mode="add")

    return {
        "rho": rho,
        "magnetization": mag,
        "density": np.real(np.trace(rho, axis1=-2, axis2=-1)),
        "mu": float(mu),
        "energy": float(energy),
        "gap": float(gap),
        "iters": int(iters),
        "converged": converged,
        "model_mf": eff,
    }


@partial(jax.jit, static_argnums=(0, 6, 10))
def _bcs_scf_jit(static, data, kpts, gcpl, d_init, kt, max_iters, mix, tol,
                 mu, mesh=None):
    """One-program BCS gap fixed point.  Nambu basis (c_{k up},
    c_{-k dn}^dag): particle block H(k) - mu, hole block
    -conj(H(-k)) + mu (the convention validated against the dense
    twisted-torus oracle in geometry.superfluid_weight), pairing block
    diag(Delta_i).  Delta stays real in the loop (s-wave singlet with a
    real starting gauge; the k sum pairs +-k so the anomalous average
    is real for any Hermitian hopping table)."""
    Hp = assemble(static, data, kpts)  # (B, n, n) at +k
    Hm = assemble(static, data, -kpts)  # (B, n, n) at -k
    if mesh is not None:
        from .ops.solver import shard_grid_axis0

        Hp = shard_grid_axis0(Hp, mesh)
        Hm = shard_grid_axis0(Hm, mesh)
    B = Hp.shape[0]
    n = Hp.shape[-1]
    eye = jnp.eye(n, dtype=Hp.dtype)
    top = Hp - mu * eye
    bot = -jnp.conj(Hm) + mu * eye

    def spectra(delta):
        D = jnp.broadcast_to(
            delta.astype(Hp.dtype)[None, :, None] * eye, (B, n, n))
        H = jnp.concatenate(
            [jnp.concatenate([top, D], axis=-1),
             jnp.concatenate([jnp.conj(jnp.swapaxes(D, -1, -2)), bot],
                             axis=-1)],
            axis=-2,
        )  # (B, 2n, 2n)
        return eigh_batched(H)

    def gap_of(w, v):
        # <Psi Psi^dag> = sum_a (1 - f(E_a)) w_a w_a^dag; the (up,
        # dn-dag) off-diagonal block gives <c_{i up} c_{i dn}> = -F_i
        f = _fermi(w / kt)  # (B, 2n)
        u = v[..., :n]  # (B, 2n states, n) particle components
        h = v[..., n:]  # (B, 2n states, n) hole components
        G12 = jnp.einsum("bai,ba,bai->i", u, (1.0 - f), jnp.conj(h),
                         precision=jax.lax.Precision.HIGHEST) / B
        return gcpl * jnp.real(G12)

    def body(carry):
        delta, _, i = carry
        w, v = spectra(delta)
        new = gap_of(w, v)
        mixed = (1.0 - mix) * delta + mix * new
        dd = jnp.max(jnp.abs(mixed - delta))
        return mixed, dd, i + 1

    def cond(carry):
        _, dd, i = carry
        return jnp.logical_and(i < max_iters, dd > tol)

    delta, dd, iters = jax.lax.while_loop(
        cond, body,
        (d_init, jnp.asarray(jnp.inf, d_init.dtype), jnp.int32(0)),
    )
    w, _ = spectra(delta)
    egap = jnp.min(jnp.abs(w))  # quasiparticle gap
    return delta, egap, iters, dd


def bcs_gap(model, g, mu, nk=None, temperature=None, init=None, mix=0.5,
            tol=None, max_iters=500):
    """Self-consistent s-wave BCS/BdG pairing ``Delta_i = g <c_{i dn}
    c_{i up}>`` (per-orbital, attractive ``g > 0``) at fixed chemical
    potential, the whole gap-equation fixed point as ONE device
    program.

    The Nambu convention matches
    :func:`pythtb_tpu.geometry.superfluid_weight` (hole block
    ``-conj(H(-k)) + mu``), so a converged uniform ``Delta`` can be
    passed straight to the superfluid-weight stencil.  Multi-orbital
    cells return orbital-resolved gaps (e.g. the Lieb flat band
    concentrates ``Delta`` on the flat-band sublattices).

    Committed oracle: on the square lattice the converged gap solves
    the classic equation ``1/g = (1/N) sum_k tanh(E_k / 2T) / (2
    E_k)``, ``E_k = sqrt((eps_k - mu)^2 + Delta^2)``, root-found
    independently in NumPy.

    :param g: pairing attraction (energy units, > 0)
    :param mu: chemical potential
    :param nk: BZ grid sizes (periodic; finite models omit it)
    :param temperature: k_B T (default: spectral span * 1e-4)
    :param init: starting ``Delta`` (scalar or (norb,); default 10% of
      the span -- start LARGE: Delta = 0 is always a fixed point)
    :param mix: linear mixing weight
    :param tol: fixed-point tolerance on max |Delta change| (default
      ``eps(device dtype)^(2/3)``, dtype-aware like
      :func:`hartree_fock`)
    :param max_iters: iteration cap (``UserWarning`` on
      non-convergence)
    :returns: dict with ``delta`` (norb,), ``qp_gap`` (smallest
      quasiparticle energy), ``iters``, ``converged``
    """
    if model._nspin != 1:
        raise PythtbError(
            "bcs_gap supports spinless (spin-degenerate) models only")
    if float(g) <= 0.0:
        raise PythtbError("bcs_gap requires attraction g > 0")
    norb = int(model._norb)
    kpts = _kgrid(model, nk)
    static, data = model._get_finalized()
    span = float(np.abs(np.asarray(model._site_energies)).max() + 2.0 * sum(
        np.abs(np.asarray(h[0])).max() for h in model._hoppings) + 1e-9)
    kt = float(temperature) if temperature is not None else 1e-4 * span
    if kt <= 0.0:
        raise PythtbError("temperature must be > 0")
    if init is None:
        d0 = np.full(norb, 0.1 * span)
    else:
        d0 = np.broadcast_to(
            np.asarray(init, dtype=np.float64).ravel(), (norb,)).copy()

    rdtype = np.dtype(jnp.zeros(0).dtype)
    if tol is None:
        tol = float(np.finfo(rdtype).eps) ** (2.0 / 3.0)
    from .parallel import mesh as pmesh

    delta, egap, iters, dd = jax.device_get(_bcs_scf_jit(
        static, data, jnp.asarray(kpts, rdtype), jnp.asarray(float(g), rdtype),
        jnp.asarray(d0, rdtype), jnp.asarray(kt, rdtype), int(max_iters),
        jnp.asarray(float(mix), rdtype), jnp.asarray(float(tol), rdtype),
        jnp.asarray(float(mu), rdtype), pmesh.current_mesh(),
    ))
    converged = bool(dd <= tol)
    if not converged:
        warnings.warn(
            "bcs_gap: not converged after %d iterations (last Delta "
            "change %.2e > tol %.1e)" % (int(iters), float(dd), tol),
            UserWarning, stacklevel=2,
        )
    return {
        "delta": np.asarray(delta, dtype=np.float64),
        "qp_gap": float(egap),
        "iters": int(iters),
        "converged": converged,
    }
