"""Matrix-free Hamiltonian application for large finite models.

The upstream wish list notes "Finite sized models are hard to solve.
Maybe use some algorithm for sparse matrices? Store hopping parameters
in dictionary." (/root/reference/notes/TODO:58-59).  The reference
stores hops in a list but always materializes the dense Hamiltonian and
calls a dense eigensolver (pythtb.py:874-953): O(norb^2) memory and
O(norb^3) time.  This module applies H directly from the hopping table
-- O(nhop) memory, O(nhop) per application -- which is what the
iterative solvers (:func:`pythtb_tpu.flows.solve_lowest`) and the
kernel-polynomial DOS (:func:`pythtb_tpu.flows.kpm_dos`) build on.
Million-orbital flakes (disorder realizations, magnetic supercells cut
open, Landau-level problems) become tractable this way.

TPU-first layout: the Hamiltonian is stored in ELL (padded-row) form --
``cols (norb, D)`` neighbor indices and ``vals (norb, D)`` amplitudes,
D = max row degree (tiny and bounded for tight-binding lattices).  The
matvec is then a *gather + dense contraction*, ``y[n] = sum_d
vals[n, d] * x[cols[n, d]]``, with zero scatter operations: TPU scatters
serialize on duplicate indices and measured ~20x slower than this form
for a 90k-site flake, while gathers and the (norb, D, B) multiply-reduce
vectorize cleanly.  Both hop directions and the on-site diagonal are
baked into the table at build time.

Everything here is for FINITE models (``dim_k == 0``): no Bloch phases,
H is a constant Hermitian operator.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.xfer import host_pack, unpack_cplx

__all__ = ["SparseH", "sparse_h", "sparse_h_k", "matvec", "gershgorin_window", "to_dense"]


@dataclasses.dataclass(frozen=True)
class SparseH:
    """ELL (padded-row) form of a finite Hamiltonian (a JAX pytree).

    ``cols``: (norb, D) int32 neighbor orbital indices (self-padded);
    ``vals``: ri-packed amplitudes, (norb, D, 2) for nspin=1 or
    (norb, D, 2, 2, 2) spin blocks, zero at padding; both hop
    directions and the on-site diagonal are included, so
    ``y[n] = sum_d vals[n,d] @ x[cols[n,d]]`` is the full H @ x.
    ``window``: host-side Gershgorin spectral bounds (lo, hi).
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    norb: int
    nspin: int
    window: tuple

    @property
    def nsta(self):
        return self.norb * self.nspin


jax.tree_util.register_pytree_node(
    SparseH,
    lambda s: ((s.cols, s.vals), (s.norb, s.nspin, s.window)),
    lambda aux, ch: SparseH(*ch, norb=aux[0], nspin=aux[1], window=aux[2]),
)


def _ell_tables(rows, cols, vals, norb):
    """Pack COO triplets into padded-row (ELL) tables on host."""
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=norb)
    D = max(int(counts.max()) if counts.size else 0, 1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(len(rows)) - offsets[rows]
    tcols = np.zeros((norb, D), dtype=np.int32)
    tvals = np.zeros((norb, D) + vals.shape[1:], dtype=np.complex128)
    tcols[rows, slot] = cols
    tvals[rows, slot] = vals
    return tcols, tvals


def _model_coo(model, phases=None):
    """COO triplets (rows, cols, vals) + onsite blocks from a builder
    model's hopping table, both hop directions included.  ``phases``
    (nhop,) complex multiplies the forward amplitudes (Bloch factors
    for :func:`sparse_h_k`); the reverse direction gets the conjugate,
    keeping H exactly Hermitian."""
    norb = int(model._norb)
    nspin = int(model._nspin)
    nhop = len(model._hoppings)
    ii = np.array([h[1] for h in model._hoppings], dtype=np.int64).reshape(nhop)
    jj = np.array([h[2] for h in model._hoppings], dtype=np.int64).reshape(nhop)
    diag_idx = np.arange(norb, dtype=np.int64)
    if nspin == 1:
        amps = np.array([h[0] for h in model._hoppings], dtype=np.complex128).reshape(nhop)
        if phases is not None:
            amps = amps * phases
        ons = np.asarray(model._site_energies, dtype=np.complex128)
        rows = np.concatenate([ii, jj, diag_idx])
        cols = np.concatenate([jj, ii, diag_idx])
        vals = np.concatenate([amps, np.conj(amps), ons])
    else:
        amps = np.array(
            [np.asarray(h[0], dtype=np.complex128) for h in model._hoppings]
        ).reshape(nhop, 2, 2)
        if phases is not None:
            amps = amps * phases[:, None, None]
        ons = np.asarray(model._site_energies, dtype=np.complex128)  # (norb,2,2)
        rows = np.concatenate([ii, jj, diag_idx])
        cols = np.concatenate([jj, ii, diag_idx])
        vals = np.concatenate(
            [amps, np.conj(np.swapaxes(amps, -1, -2)), ons], axis=0
        )
    return rows, cols, vals, ons, norb, nspin


def _finish_sparse(rows, cols, vals, ons, norb, nspin):
    """Pack COO to ELL, compute the Gershgorin window, wrap a SparseH."""
    diag_idx = np.arange(norb, dtype=np.int64)
    tcols, tvals = _ell_tables(rows, cols, vals, norb)

    # Gershgorin window on host, from the same tables
    if nspin == 1:
        isdiag = tcols == diag_idx[:, None].astype(np.int32)
        center = np.real(np.sum(np.where(isdiag, tvals, 0.0), axis=1))
        radius = np.sum(np.where(isdiag, 0.0, np.abs(tvals)), axis=1)
    else:
        # the row's TRUE diagonal block is the sum over ALL diagonal
        # ELL slots -- onsite PLUS any same-orbital (i == j, R != 0)
        # hop blocks (common in periodic cells: Kane-Mele SOC, Haldane
        # t2; using only `ons` under-covered the spectrum and made
        # solve_window reject or corrupt slices near the band edges)
        isdiag = tcols == diag_idx[:, None].astype(np.int32)
        Dsum = np.sum(np.where(isdiag[..., None, None], tvals, 0.0), axis=1)
        Dsum = (Dsum + np.conj(np.swapaxes(Dsum, -1, -2))) / 2.0
        ev = np.linalg.eigvalsh(Dsum)
        center = ev.mean(axis=-1)
        radius = (ev[:, 1] - ev[:, 0]) / 2.0
        bnorm = np.linalg.norm(tvals, ord=2, axis=(-2, -1))
        radius = radius + np.sum(np.where(isdiag, 0.0, bnorm), axis=1)
    window = (float((center - radius).min()), float((center + radius).max()))

    return SparseH(
        cols=jnp.asarray(tcols),
        vals=jnp.asarray(host_pack(tvals)),
        norb=norb,
        nspin=nspin,
        window=window,
    )


def sparse_h(model):
    """Build :class:`SparseH` from a finite (dim_k == 0) builder model
    without materializing anything dense."""
    from ..model import PythtbError

    if model._dim_k != 0:
        raise PythtbError(
            "sparse_h requires a finite model (dim_k == 0); cut_piece or "
            "reduce_dim the model first"
        )
    return _finish_sparse(*_model_coo(model))


def sparse_h_k(model, kpt):
    """ELL form of the Bloch Hamiltonian H(k) of a PERIODIC model at
    one reduced k-point, Convention I (phase ``exp(2j*pi*k.rv)`` with
    ``rv = -t_i + t_j + R`` restricted to the periodic directions --
    exactly :func:`pythtb_tpu.ops.hamiltonian._phases`, so
    eigenvectors match ``solve_all``'s gauge).  This is what makes
    iterative interior solvers (:func:`pythtb_tpu.flows.solve_window`)
    applicable to huge PERIODIC cells -- e.g. an 11k-orbital moire
    cell at the magic angle -- where a dense (nsta, nsta) eigh is the
    bottleneck; H(k) keeps the O(nhop) hopping-table sparsity at any
    fixed k."""
    from ..model import PythtbError

    if model._dim_k == 0:
        raise PythtbError("sparse_h_k needs a periodic model; use sparse_h")
    kpt = np.asarray(kpt, dtype=np.float64).reshape(-1)
    if kpt.shape[0] != model._dim_k:
        raise PythtbError(
            "kpt must have %d components" % model._dim_k)
    nhop = len(model._hoppings)
    per = list(model._per)
    rv = np.array(
        [(-model._orb[h[1], :] + model._orb[h[2], :]
          + np.asarray(h[3], dtype=np.float64))[per]
         for h in model._hoppings], dtype=np.float64,
    ).reshape(nhop, model._dim_k)
    phases = np.exp(2.0j * np.pi * (rv @ kpt))
    return _finish_sparse(*_model_coo(model, phases))


def matvec(h: SparseH, x):
    """Apply H to a block of vectors.

    :param x: complex (norb, B) for nspin=1 or (norb, 2, B) for
      nspin=2 (B = block size; use B=1 for a single vector)
    :returns: H @ x, same shape

    One gather plus one dense contraction over the padded row slots --
    no scatters (see module docstring).
    """
    vals = unpack_cplx(h.vals)
    hp = jax.lax.Precision.HIGHEST
    if h.nspin == 1:
        xg = x[h.cols]  # (norb, D, B)
        return jnp.einsum("nd,ndB->nB", vals, xg, precision=hp)
    xg = x[h.cols]  # (norb, D, 2, B)
    return jnp.einsum("ndab,ndbB->naB", vals, xg, precision=hp)


def gershgorin_window(h: SparseH):
    """Spectral window ``(lo, hi)`` containing all eigenvalues
    (Gershgorin discs, precomputed on host at build time)."""
    return h.window


def to_dense(h: SparseH) -> np.ndarray:
    """Host-side dense ``(nsta, nsta)`` complex128 matrix from the ELL
    tables.  Oracle/debug utility -- O(nsta^2) memory, use only for
    small systems (differential tests against the matrix-free paths).
    """
    from ..utils.xfer import host_unpack

    cols = np.asarray(h.cols)
    vals = host_unpack(np.asarray(h.vals))
    norb = h.norb
    rows = np.repeat(np.arange(norb), cols.shape[1])
    if h.nspin == 1:
        dense = np.zeros((norb, norb), dtype=np.complex128)
        np.add.at(dense, (rows, cols.ravel()), vals.reshape(-1))
        return dense
    dense = np.zeros((norb, norb, 2, 2), dtype=np.complex128)
    np.add.at(dense, (rows, cols.ravel()), vals.reshape(-1, 2, 2))
    return dense.transpose(0, 2, 1, 3).reshape(2 * norb, 2 * norb)
