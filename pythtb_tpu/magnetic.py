"""Uniform magnetic fields via exact Peierls substitution.

An upstream PythTB wish-list feature (/root/reference/notes/TODO:78:
"Add magnetic field via Peierls substitution by enlarging the cell so
the unit number of quanta pass through the cell") that the reference
never implemented.  This module provides it exactly, for models with
arbitrary (fractional) orbital positions, and adds a TPU-native
Hofstadter-butterfly flow: because the Peierls phase of every hopping
is *linear* in the flux index p (see below), the whole butterfly --
every rational flux p/q at fixed q, every k-point, every band -- is ONE
compiled XLA program (a phase broadcast + one batched eigh on the MXU),
instead of the per-flux model rebuild a host framework would need.

Formulation
-----------

Work in reduced coordinates ``(x1, x2)`` along the two chosen lattice
directions ``dirs = (d1, d2)``.  A uniform field with flux ``phi`` (in
units of the flux quantum) through the (d1, d2) unit-cell plaquette is
the 1-form ``A = 2*pi*phi * x1 dx2`` (its exterior derivative gives
flux 2*pi*phi per unit reduced plaquette, independent of the metric).
The Peierls phase of a hopping from a to b along the straight line is

    theta0 = 2*pi*phi * (a1 + b1)/2 * (b2 - a2).

For a model periodic along d1 this A is not lattice-periodic, so an
infinite-lattice Hamiltonian exists only at rational flux.  Enlarge the
cell q-fold along d1 (flux per supercell = p quanta, integer) and use
the magnetic translation group: translating a hopping by one supercell
vector shifts theta0 by ``2*pi*p * (t2_j - t2_i) mod 2*pi``, which is
absorbed by the cell-dependent orbital gauge ``chi_I(C) = -2*pi*p * C1
* t2_I``.  The resulting *exactly periodic* magnetic Bloch Hamiltonian
has supercell hopping phases

    theta = theta0(representative with start in home supercell)
            - 2*pi*p * R1_sc * t2_j,

where ``R1_sc`` is the hop's supercell lattice vector along d1 and
``t2_j`` the target orbital's reduced coordinate along d2.  Both terms
are linear in p -- hence the one-program butterfly.

For a model *finite* along d1 (ribbons, flakes) no supercell is needed
and ``phi`` may be any real number: ``A`` varies only along the finite
direction, so periodicity along the remaining directions is untouched
(Landau gauge; see :func:`peierls_model`).

Correctness is gauge-invariantly testable: open-cluster spectra depend
only on the flux through every closed loop of hoppings, so cutting a
finite flake from :func:`magnetic_supercell` output must reproduce the
brute-force Peierls flake built from the original model in a completely
different gauge (tests/test_magnetic.py does exactly this, including on
honeycomb models whose fractional orbital positions exercise the
magnetic-translation correction term).
"""

from __future__ import annotations

import warnings

import numpy as np

import jax
import jax.numpy as jnp

from .model import PythtbError
from .utils.xfer import pack_cplx, unpack_cplx

__all__ = [
    "magnetic_supercell",
    "peierls_model",
    "hofstadter_fn",
    "hofstadter_butterfly",
    "streda_labels",
]


def _check_dirs(model, dirs):
    d1, d2 = (int(d) for d in dirs)
    if d1 == d2:
        raise PythtbError("Magnetic field plane needs two distinct directions")
    for d in (d1, d2):
        if d < 0 or d >= model._dim_r:
            raise PythtbError(
                "Magnetic field direction %d out of range for dim_r=%d"
                % (d, model._dim_r)
            )
    return d1, d2


def _hop_arrays(model):
    """Hop table of a builder model as dense arrays (R zero-filled when
    the model is fully finite and stores no R column)."""
    nhop = len(model._hoppings)
    ii = np.array([h[1] for h in model._hoppings], dtype=np.int64).reshape(nhop)
    jj = np.array([h[2] for h in model._hoppings], dtype=np.int64).reshape(nhop)
    if model._dim_k == 0 or nhop == 0:
        R = np.zeros((nhop, model._dim_r), dtype=np.float64)
    else:
        R = np.array([h[3] for h in model._hoppings], dtype=np.float64).reshape(
            nhop, model._dim_r
        )
    return ii, jj, R


def _phase_multiply(model, theta):
    """Multiply each stored hopping amplitude by exp(1j*theta) in place
    (spin blocks get a common phase), then invalidate the device cache."""
    for n, h in enumerate(model._hoppings):
        h[0] = np.asarray(h[0], dtype=complex) * np.exp(1.0j * theta[n])
    model._invalidate()


def _sc_exponents(sc, q, d1, d2):
    """Per-hopping exponent slope for a q-fold magnetic supercell:
    hop phase at flux index p is exp(1j * p * slope).  Coordinates of
    the supercell model are converted back to original-cell units
    (x1_orig = q * x1_sc along d1; d2 is unchanged)."""
    ii, jj, R = _hop_arrays(sc)
    orb = sc._orb
    a1 = q * orb[ii, d1]
    a2 = orb[ii, d2]
    b1 = q * (orb[jj, d1] + R[:, d1])
    b2 = orb[jj, d2] + R[:, d2]
    base = 0.5 * (a1 + b1) * (b2 - a2)  # integral of x1 dx2, orig units
    # magnetic-translation gauge correction (module docstring)
    corr = R[:, d1] * orb[jj, d2]
    return 2.0 * np.pi * (base / q - corr)


def _magnetic_sc_base(model, q, dirs, to_home=True):
    """(supercell model at zero field, per-hop exponent slopes)."""
    d1, d2 = _check_dirs(model, dirs)
    if d1 not in model._per:
        raise PythtbError(
            "magnetic_supercell enlarges the cell along dirs[0], which must "
            "be a periodic direction; for a finite dirs[0] use peierls_model"
        )
    q = int(q)
    if q < 1:
        raise PythtbError("Magnetic supercell size q must be a positive integer")
    sc_red_lat = np.identity(model._dim_r, dtype=int)
    sc_red_lat[d1, d1] = q
    sc = model.make_supercell(
        sc_red_lat, to_home=to_home, to_home_suppress_warning=True
    )
    return sc, _sc_exponents(sc, q, d1, d2)


def magnetic_supercell(model, p, q, dirs=(0, 1), to_home=True):
    """Uniform magnetic field with rational flux ``p/q`` per unit-cell
    plaquette spanned by lattice directions ``dirs``, as a NEW model on
    a q-fold enlarged cell along ``dirs[0]``.

    The returned model is an ordinary :class:`tb_model`: solve it, cut
    it, compute Chern numbers of its magnetic subbands, etc.

    :param p, q: integers; flux per original (dirs) plaquette is p/q
      flux quanta (p need not be coprime with q, may be negative)
    :param dirs: the two lattice directions spanning the field plane;
      ``dirs[0]`` must be periodic (it is enlarged q-fold)
    :param to_home: passed through to :meth:`tb_model.make_supercell`
    :returns: a NEW tb_model with ``q * norb`` orbitals

    Example (TKNN: lowest Landau subband of the square lattice at
    flux 1/3 carries Chern number 1)::

        sq = tb_model(2, 2, lat=[[1,0],[0,1]], orb=[[0,0]])
        sq.set_hop(1.0, 0, 0, [1, 0])
        sq.set_hop(1.0, 0, 0, [0, 1])
        msc = magnetic.magnetic_supercell(sq, 1, 3)
        flows.chern_number(msc, occ=[0])   # -> 1.0
    """
    if not (float(p).is_integer() and float(q).is_integer()):
        raise PythtbError("Flux must be rational: p and q must be integers")
    sc, slope = _magnetic_sc_base(model, q, dirs, to_home=to_home)
    _phase_multiply(sc, int(p) * slope)
    return sc


def peierls_model(model, phi, dirs=(0, 1)):
    """Uniform magnetic field on a model that is FINITE along
    ``dirs[0]`` (a ribbon or flake): multiply every hopping by its
    exact Peierls phase in the Landau gauge ``A = 2*pi*phi*x1 dx2``.

    Because the gauge varies only along the non-periodic direction, no
    supercell is needed and ``phi`` -- the flux in quanta per (dirs)
    unit reduced plaquette -- may be any real number.  Models produced
    by ``cut_piece`` keep the original lattice vectors (orbital reduced
    coordinates span 0..num along the cut direction), so ``phi`` is
    still per *original-cell* plaquette there.

    :returns: a NEW tb_model with phased hoppings
    """
    import copy as _copy

    d1, d2 = _check_dirs(model, dirs)
    if d1 in model._per:
        raise PythtbError(
            "peierls_model requires dirs[0] to be non-periodic (finite); "
            "for a periodic dirs[0] use magnetic_supercell(p, q)"
        )
    out = _copy.deepcopy(model)
    ii, jj, R = _hop_arrays(out)
    if len(out._hoppings):
        orb = out._orb
        a1 = orb[ii, d1]  # R[:, d1] == 0 along a finite direction
        a2 = orb[ii, d2]
        b1 = orb[jj, d1]
        b2 = orb[jj, d2] + R[:, d2]
        theta = 2.0 * np.pi * float(phi) * 0.5 * (a1 + b1) * (b2 - a2)
        _phase_multiply(out, theta)
    return out


def hofstadter_fn(model, q, dirs=(0, 1)):
    """Build the one-program Hofstadter solver at denominator ``q``.

    Returns ``(fn, sc)`` where ``sc`` is the q-fold zero-field
    supercell and ``fn(p_values, k_list) -> evals`` is a jitted pure
    function mapping flux indices ``p_values`` (a float array of shape
    (P,); entries are typically the integers 0..q but any real flux
    p/q is accepted) and reduced k-points of the supercell BZ (shape
    (NK, dim_k)) to eigenvalues of shape ``(P, NK, nsta_sc)``.  All
    fluxes and k-points are solved in a single compiled program: the
    hop-phase table is linear in p, so the sweep is a broadcastised
    multiply feeding one batched eigh.

    Under an active device mesh (:func:`pythtb_tpu.parallel.use_mesh`)
    the flux axis is sharded over the mesh: ``fn`` pads P up to a
    multiple of the mesh size internally (repeating the last flux) and
    trims the padded rows from the result, so any P is accepted.
    """
    from .ops.eigh import eigvalsh_batched
    from .ops.hamiltonian import assemble

    sc, slope = _magnetic_sc_base(model, q, dirs)
    static, data0 = sc._get_finalized()
    slope_j = jnp.asarray(slope)
    amps0 = jnp.asarray(data0.amps)

    def _one_p(p, kpts):
        a = unpack_cplx(amps0)
        ph = jnp.exp(1.0j * p * slope_j)
        a = a * (ph.reshape(ph.shape + (1,) * (a.ndim - 1)))
        data = data0._replace(amps=pack_cplx(a))
        return eigvalsh_batched(assemble(static, data, kpts))

    def _impl(mesh, p_values, k_list):
        p_values = jnp.asarray(p_values, dtype=float)
        if mesh is not None:
            # flux values are independent: shard the p axis over the
            # mesh (fn pads P to a multiple of the mesh size)
            from jax.sharding import NamedSharding, PartitionSpec

            p_values = jax.lax.with_sharding_constraint(
                p_values, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            )
        return jax.vmap(_one_p, in_axes=(0, None))(p_values, jnp.asarray(k_list))

    # one compiled program per active mesh (the mesh is resolved at
    # call time, so entering parallel.use_mesh after a first unsharded
    # call cannot serve a stale executable)
    compiled = {}

    def fn(p_values, k_list):
        from functools import partial as _partial

        from .parallel import mesh as _pmesh

        mesh = _pmesh.current_mesh()
        p_values = np.asarray(p_values, dtype=np.float64)
        P = p_values.shape[0]
        if mesh is not None:
            # pad the flux axis to a mesh-divisible length (repeating
            # the last flux) so the sharded program always gets even
            # shards; padded rows are trimmed below
            Ppad = _pmesh.pad_to_multiple(P, mesh.devices.size)
            if Ppad != P:
                p_values = np.concatenate(
                    [p_values, np.full(Ppad - P, p_values[-1] if P else 0.0)]
                )
        if mesh not in compiled:
            compiled[mesh] = jax.jit(_partial(_impl, mesh))
        out = compiled[mesh](p_values, k_list)
        return out[:P] if out.shape[0] != P else out

    return fn, sc


def hofstadter_butterfly(model, q, dirs=(0, 1), nk=4, p_values=None):
    """The Hofstadter butterfly of ``model`` in one device program.

    Sweeps flux phi = p/q for p = 0..q (or the given ``p_values``) on a
    uniform ``nk x .. x nk`` mesh of the magnetic-supercell BZ and
    returns ``(phis, evals)`` with evals of shape (P, NK, q*nsta).
    Plot evals against phis for the classic butterfly.

    :param q: flux denominator = supercell size (bands per column of
      the butterfly = q * nsta of the input model)
    :param nk: k-mesh points per periodic direction of the supercell BZ
    :param p_values: optional explicit integer flux indices (default
      ``0..q`` inclusive, one full flux quantum)
    """
    fn, sc = hofstadter_fn(model, q, dirs)
    if p_values is None:
        p_values = np.arange(0, int(q) + 1)
    p_values = np.asarray(p_values, dtype=np.float64)
    shape = (int(nk),) * sc._dim_k
    if sc._dim_k == 0:
        kpts = np.zeros((1, 0))
    else:
        grids = np.meshgrid(*[np.arange(n) / n for n in shape], indexing="ij")
        kpts = np.stack([g.ravel() for g in grids], axis=-1)
    evals = np.asarray(jax.device_get(fn(p_values, kpts)), dtype=np.float64)
    return p_values / float(q), evals


def streda_labels(model, p, q, nk=31, dirs=(0, 1), gap_tol=None):
    """Chern labels of the Hofstadter gaps at flux ``p/q``: the Streda
    quantum numbers that color the butterfly (the slope of each gap's
    integrated density of states with flux, ``t_r = dN_r/dphi``).

    Builds the magnetic supercell (:func:`magnetic_supercell`), scans
    the ``q * nsta`` magnetic subbands on an ``nk x nk`` mesh, and for
    every OPEN spectral gap r computes the total Chern number of the
    bands below it with the package plaquette engine
    (:func:`pythtb_tpu.flows.chern_number` on the occupied set --
    intra-set subband touchings are harmless because only the gap
    above needs to be open).  For the square lattice the result obeys
    the TKNN Diophantine equation ``r = s q + t p`` with ``|t| <=
    q/2`` -- the committed oracle (``tests/test_streda.py``); here the
    labels are COMPUTED, so the function applies to any 2-D model
    (honeycomb, spinful, multi-orbital), where the naive Diophantine
    branch choice can fail.

    :param p, q: integer flux ``p/q`` per ``dirs`` plaquette
    :param nk: Chern / gap-scan mesh per direction (supercell BZ)
    :param dirs: the two periodic directions threaded by the flux
    :param gap_tol: minimum indirect gap treated as open (default
      ``1e-6 * bandwidth``)
    :returns: dict with ``gaps`` (list of (bottom, top) energies of
      each open gap), ``labels`` (int Chern label below each gap),
      ``filling`` (bands below each gap), ``phi`` = p/q
    """
    from . import flows

    sc = magnetic_supercell(model, p, q, dirs=dirs)
    kpts = np.stack(np.meshgrid(np.arange(nk) / nk, np.arange(nk) / nk,
                                indexing="ij"), axis=-1).reshape(-1, 2)
    ev = sc.solve_all(kpts)  # (nsta_sc, NK)
    bmax = ev.max(axis=1)
    bmin = ev.min(axis=1)
    if gap_tol is None:
        gap_tol = 1e-6 * float(ev.max() - ev.min())
    gaps, labels, filling = [], [], []
    for r in range(ev.shape[0] - 1):
        lo, hi = float(bmax[r]), float(bmin[r + 1])
        if hi - lo <= gap_tol:
            continue
        c = flows.chern_number(sc, occ=list(range(r + 1)), nk=(nk, nk))
        ci = int(round(c))
        if abs(c - ci) > 0.05:
            warnings.warn(
                "streda_labels: non-integer Chern %.3f below the gap "
                "at filling %d (raise nk)" % (c, r + 1), stacklevel=2)
        gaps.append((lo, hi))
        labels.append(ci)
        filling.append(r + 1)
    return {"phi": float(p) / float(q), "gaps": gaps,
            "labels": labels, "filling": filling}
