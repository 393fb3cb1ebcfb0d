"""Structural parameter sweeps: pythtb_tpu.family.

The reference can only sweep a *structural* model parameter (ribbon
width, supercell matrix, hopping graph edits) by rebuilding the model
and re-running the full pipeline per point
(/root/reference/pythtb.py:1105 ``cut_piece`` / :1440 ``make_supercell``
called in user loops).  ``chern_fn``/``energy_fn`` (flows.py) lift
*amplitude* sweeps into one vmapped program, but members with different
hopping graphs have different array shapes, so they cannot share a
trace.

This module removes that limit with a **padded model family**: a list
of finalized models (same ``dim_k``/``dim_r``/``per``/``nspin``; orbital
counts and hopping graphs free to differ) is embedded into one common
shape --

* orbitals padded to the family maximum with decoupled sites pinned at
  ``pad_energy`` (a Gershgorin bound above every member's spectrum, so
  padded states sort strictly above all physical bands);
* hopping tables padded with zero-amplitude rows (exact no-ops);
* per-member boundary-gauge phases and an occupied-band mask carried as
  batch data.

Every member then runs through the SAME compiled program under
``jax.vmap``: one trace, one compile, the whole family solved (and its
topological invariants integrated) in a single device call.  Occupied
subspaces of different sizes are handled with *masked determinants*:
``det_occ(M) = det(m M m + (I - diag(m)))`` -- padding the overlap
matrix with an identity block, so one fixed-size det covers every
member.

Example::

    models = [haldane_supercell(n) for n in (1, 2, 3)]
    fam = family(models)
    cherns = fam.chern(nocc=[1, 4, 9], nk=(31, 31))   # ONE device program
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core import BlochData, ModelStatic
from .model import PythtbError
from .ops.eigh import eigh_batched, eigvalsh_batched
from .ops.hamiltonian import assemble
from .ops.solver import device_uniform_grid, extend_pbc_seq
from .utils.xfer import host_pack, unpack_cplx

__all__ = ["family", "ModelFamily"]


def _gershgorin_bound(static, data):
    """Upper bound on every |eigenvalue| of H(k) for all k: max row sum
    of |diag| plus, for each hopping, |amp| added to both incident rows
    (the Bloch phase has modulus 1)."""
    diag = np.abs(unpack_host(data.diag))  # (nsta, nsta)
    row = diag.sum(axis=1)
    amps = unpack_host(data.amps)
    for t in range(static.nhop):
        if static.nspin == 1:
            a = abs(amps[t])
            row[data.ii[t]] += a
            row[data.jj[t]] += a
        else:
            a = np.abs(amps[t]).sum(axis=1).max()  # block row sum
            row[2 * data.ii[t] : 2 * data.ii[t] + 2] += a
            row[2 * data.jj[t] : 2 * data.jj[t] + 2] += a
    return float(row.max()) if row.size else 1.0


def unpack_host(x):
    """Host-side ri-unpack (trailing [re, im] axis -> complex)."""
    x = np.asarray(x)
    return x[..., 0] + 1j * x[..., 1]


def _pad_member(model, nmax, hmax, pad_energy):
    """Embed one finalized model into the family shape; returns a
    BlochData with norb=nmax, nhop=hmax plus the member's gauge phases."""
    static, data = model._get_finalized()
    nspin = static.nspin
    nsta_max = nmax * nspin
    nsta = static.nsta

    diag = np.zeros((nsta_max, nsta_max), dtype=np.complex128)
    diag[:nsta, :nsta] = unpack_host(data.diag)
    for t in range(nsta, nsta_max):
        diag[t, t] = pad_energy

    pad_h = hmax - static.nhop
    if nspin == 1:
        amps = np.concatenate([unpack_host(data.amps), np.zeros(pad_h, complex)])
    else:
        amps = np.concatenate(
            [unpack_host(data.amps).reshape(static.nhop, 2, 2),
             np.zeros((pad_h, 2, 2), complex)]
        )
    rv = np.concatenate([data.rv, np.zeros((pad_h, static.dim_k))])
    ii = np.concatenate([data.ii, np.zeros(pad_h, np.int32)])
    jj = np.concatenate([data.jj, np.zeros(pad_h, np.int32)])
    pattern = np.zeros((hmax, nmax * nmax), dtype=np.float64)
    pattern[np.arange(hmax), ii.astype(np.int64) * nmax + jj.astype(np.int64)] = 1.0
    # padded rows are one-hot at (0, 0) but their amplitude is exactly 0

    # periodic-gauge boundary phases per periodic direction, padded
    # orbitals get phase 1 (their state amplitudes are 0 anyway)
    phases = np.ones((static.dim_k, nsta_max), dtype=np.complex128)
    for d in range(static.dim_k):
        ffac = np.exp(-2.0j * np.pi * model._orb[:, model._per[d]])
        if nspin == 2:
            ffac = np.repeat(ffac, 2)
        phases[d, :nsta] = ffac

    return (
        BlochData(
            diag=host_pack(diag),
            amps=host_pack(amps),
            rv=rv,
            ii=ii,
            jj=jj,
            pattern=pattern,
        ),
        host_pack(phases),
    )


def _masked_dets(M, m):
    """det over the masked subspace of (..., K, K) matrices:
    ``M~ = (m_i m_j) M_ij + delta_ij (1 - m_i)`` -- rows/cols with mask 0
    are replaced by identity rows, so det(M~) equals the determinant of
    the occupied submatrix, at a fixed vmappable shape."""
    mm = m[..., :, None] * m[..., None, :]
    diag_fix = jnp.eye(M.shape[-1], dtype=M.dtype) * (1.0 - m)[..., None, :]
    return jnp.linalg.det(M * mm + diag_fix)


class ModelFamily:
    """A stack of padded models sharing one compiled program.

    Build with :func:`family`.  Attributes: ``static`` (the common
    padded ModelStatic), ``data`` (BlochData with a leading member
    axis), ``nsta_arr`` (per-member true state counts), ``pad_energy``.
    """

    def __init__(self, models, pad_energy=None):
        if not models:
            raise PythtbError("family() needs at least one model")
        dims = {(m._dim_k, m._dim_r, tuple(m._per), m._nspin) for m in models}
        if len(dims) != 1:
            raise PythtbError(
                "family members must share dim_k, dim_r, per and nspin; got %s"
                % sorted(dims)
            )
        statics = [m._get_finalized()[0] for m in models]
        nmax = max(s.norb for s in statics)
        hmax = max(s.nhop for s in statics)
        if pad_energy is None:
            pad_energy = 1.0 + 2.0 * max(
                _gershgorin_bound(s, m._get_finalized()[1])
                for s, m in zip(statics, models)
            )
        self.pad_energy = float(pad_energy)
        self.P = len(models)
        members = [_pad_member(m, nmax, hmax, self.pad_energy) for m in models]
        self.data = BlochData(*[
            jnp.asarray(np.stack([getattr(d, f) for d, _ in members]))
            for f in BlochData._fields
        ])
        self._phases = jnp.asarray(np.stack([p for _, p in members]))
        s0 = statics[0]
        self.static = ModelStatic(
            dim_k=s0.dim_k, dim_r=s0.dim_r, norb=nmax, nspin=s0.nspin,
            per=s0.per, nhop=hmax, use_pattern=True,
        )
        self.nsta_arr = np.array([s.nsta for s in statics], dtype=np.int64)

    # -- energies ---------------------------------------------------------

    def energies(self, k_list):
        """Band energies of every member at the given reduced k-points in
        ONE device program.

        :param k_list: (B, dim_k) shared across members, or (P, B, dim_k)
          per member (each member's reduced coordinates refer to its own
          reciprocal cell).
        :returns: (P, B, nsta_max) float64, ascending per point.  Entries
          with band index >= member's ``nsta`` are padding, pinned near
          ``pad_energy`` (strictly above all physical bands).
        """
        kpts = np.asarray(k_list, dtype=np.float64)
        if kpts.ndim == 2:
            out = _family_evals_shared(self.static, self.data, jnp.asarray(kpts))
        elif kpts.ndim == 3 and kpts.shape[0] == self.P:
            out = _family_evals_per(self.static, self.data, jnp.asarray(kpts))
        else:
            raise PythtbError(
                "k_list must be (B, dim_k) or (P, B, dim_k); got %s" % (kpts.shape,)
            )
        return np.asarray(jax.device_get(out), dtype=np.float64)

    # -- Chern numbers -----------------------------------------------------

    def chern(self, nocc, nk=(31, 31), start_k=(-0.5, -0.5)):
        """Chern number of the lowest ``nocc[p]`` bands of every member,
        integrated over each member's full BZ on an ``nk`` grid -- ONE
        compiled device program for the whole family (the reference
        equivalent re-runs wf_array.solve_on_grid + berry_flux per
        member, pythtb.py:2421/3068).

        Different members may have different occupied-band counts: the
        plaquette overlap determinants are evaluated over a fixed-size
        top block with identity padding (masked determinants), which is
        exact.

        :param nocc: per-member occupied-band counts, length P
        :returns: (P,) float64 Chern numbers
        """
        if self.static.dim_k != 2:
            raise PythtbError("chern requires dim_k == 2 families")
        nocc = np.asarray(nocc, dtype=np.int64).reshape(self.P)
        if (nocc < 1).any() or (nocc > self.nsta_arr).any():
            raise PythtbError(
                "nocc must be in [1, member nsta]; got %s for nsta %s"
                % (nocc.tolist(), self.nsta_arr.tolist())
            )
        K = int(nocc.max())
        n0, n1 = int(nk[0]), int(nk[1])
        mask = (np.arange(K)[None, :] < nocc[:, None]).astype(np.float64)
        out = _family_chern(
            self.static, self.data, self._phases, jnp.asarray(mask), K, n0, n1,
            jnp.asarray(np.asarray(start_k, dtype=np.float64)),
        )
        return np.asarray(jax.device_get(out), dtype=np.float64)


def family(models, pad_energy=None) -> ModelFamily:
    """Stack models with possibly different orbital counts / hopping
    graphs into a single padded :class:`ModelFamily` (see module
    docstring)."""
    return ModelFamily(models, pad_energy)


# ---------------------------------------------------------------------------
# jitted kernels
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _family_evals_shared(static, fdata, kpts):
    return jax.vmap(lambda d: eigvalsh_batched(assemble(static, d, kpts)))(fdata)


@partial(jax.jit, static_argnums=(0,))
def _family_evals_per(static, fdata, kpts):
    return jax.vmap(lambda d, k: eigvalsh_batched(assemble(static, d, k)))(fdata, kpts)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _family_chern(static, fdata, phases_ri, mask, K, n0, n1, start):
    from .ops.berry import _overlap

    def one(data, phase_ri, m):
        kpts = device_uniform_grid((n0 - 1, n1 - 1), start)
        H = assemble(static, data, kpts)
        _, v = eigh_batched(H)  # (B, nsta, nsta) rows = states
        w = v[:, :K, :].reshape(n0 - 1, n1 - 1, K, static.nsta)
        ph = unpack_cplx(phase_ri)  # (2, nsta)
        w = extend_pbc_seq(w, [ph[0], ph[1]])  # (n0, n1, K, nsta)
        mc = m.astype(w.dtype)
        Dr = _masked_dets(_overlap(w[:-1, :, :, :], w[1:, :, :, :]), mc)
        Du = _masked_dets(_overlap(w[:, :-1, :, :], w[:, 1:, :, :]), mc)
        plaq = -jnp.angle(
            Dr[:, :-1] * Du[1:, :] * jnp.conj(Dr[:, 1:]) * jnp.conj(Du[:-1, :])
        )
        return jnp.sum(plaq) / (2.0 * np.pi)

    return jax.vmap(one)(fdata, phases_ri, mask)
