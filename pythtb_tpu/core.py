"""Core data model: the finalized, device-ready form of a tight-binding model.

The reference PythTB keeps the model as a ragged Python list of hoppings
``[amp, i, j, ind_R]`` (/root/reference/pythtb.py:475-478) and assembles
H(k) in a per-hopping Python loop (pythtb.py:874-925).  The TPU-native
design instead freezes the model into :class:`BlochData` -- a pytree of
dense arrays -- once, and assembles/solves *batches* of k-points in a
single compiled XLA program (see :mod:`pythtb_tpu.ops.hamiltonian`).

Everything in the pytree is real-typed (complex carried as a trailing
[re, im] axis) so it can cross the host<->device boundary on TPU
runtimes without complex-transfer support; see
:mod:`pythtb_tpu.utils.xfer`.

Physics convention (must match reference exactly): "Convention I" Bloch
basis, ``H_ij(k) = sum_R exp(2j*pi*k.(R + t_j - t_i)|_per) H_ij(R)``
with k in reduced coordinates (pythtb.py:912-916, formalism tex:264-375).
The per-hopping phase vector ``rv = (-t_i + t_j + R)[per]`` is
precomputed here.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np

from . import config
from .utils.xfer import host_pack


@dataclasses.dataclass(frozen=True)
class ModelStatic:
    """Hashable static configuration of a finalized model.

    Passed as a static argument to jitted kernels so that each distinct
    model *shape* gets its own specialization.
    """

    dim_k: int
    dim_r: int
    norb: int
    nspin: int
    per: tuple
    nhop: int
    use_pattern: bool

    @property
    def nsta(self) -> int:
        return self.norb * self.nspin


class BlochData(NamedTuple):
    """Device-ready arrays of a tight-binding model (a JAX pytree).

    All arrays are real-typed; complex data is ri-packed (trailing axis
    of length 2 holding [re, im]).
    """

    # ri-packed complex (nsta, nsta, 2): the k-independent diagonal
    # contribution (site energies, incl. 2x2 spin blocks) embedded as a
    # dense matrix.  Mirrors pythtb.py:894-898.
    diag: np.ndarray
    # ri-packed hopping amplitudes: (nhop, 2) for nspin=1 or
    # (nhop, 2, 2, 2) for nspin=2 (pythtb.py:900-905).
    amps: np.ndarray
    # (nhop, dim_k) float: rv = (-t_i + t_j + R) restricted to periodic
    # axes (pythtb.py:910-914).
    rv: np.ndarray
    # (nhop,) int32 orbital indices.
    ii: np.ndarray
    jj: np.ndarray
    # Dense one-hot pattern (nhop, norb*norb) float with a 1 at flat
    # index i*norb+j, or a zero-size placeholder when the scatter path
    # is selected.  Lets H(k) assembly run as a single MXU matmul
    # instead of a scatter (see ops/hamiltonian.py).
    pattern: np.ndarray


def finalize(
    dim_k: int,
    dim_r: int,
    per,
    nspin: int,
    norb: int,
    orb: np.ndarray,
    site_energies: np.ndarray,
    hop_amps,
    hop_i,
    hop_j,
    hop_R,
    use_pattern: Optional[bool] = None,
):
    """Freeze host builder state into ``(ModelStatic, BlochData)``.

    Parameters mirror the internal state of
    :class:`pythtb_tpu.tb_model`; see that class for semantics.
    """
    per = tuple(int(p) for p in per)
    nhop = len(hop_amps)
    orb = np.asarray(orb, dtype=np.float64)
    nsta = norb * nspin

    # -- diagonal (site-energy) matrix, dense (nsta, nsta) complex -----
    diag = np.zeros((nsta, nsta), dtype=np.complex128)
    if nspin == 1:
        np.fill_diagonal(diag, np.asarray(site_energies, dtype=np.float64))
    else:
        blk = np.asarray(site_energies, dtype=np.complex128)  # (norb,2,2)
        for i in range(norb):
            diag[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = blk[i]

    # -- hopping table as dense arrays ---------------------------------
    if nspin == 1:
        amps = np.asarray(hop_amps, dtype=np.complex128).reshape(nhop)
    else:
        amps = np.asarray(hop_amps, dtype=np.complex128).reshape(nhop, 2, 2)
    ii = np.asarray(hop_i, dtype=np.int32).reshape(nhop)
    jj = np.asarray(hop_j, dtype=np.int32).reshape(nhop)

    if dim_k > 0:
        Rm = np.asarray(hop_R, dtype=np.float64).reshape(nhop, dim_r)
        rv_full = -orb[ii, :] + orb[jj, :] + Rm  # (nhop, dim_r)
        rv = rv_full[:, list(per)]  # periodic components only
    else:
        rv = np.zeros((nhop, 0), dtype=np.float64)

    # -- dense one-hot assembly pattern --------------------------------
    if use_pattern is None:
        use_pattern = nhop * norb * norb <= config.PATTERN_MAX_ELEMS
    if use_pattern and nhop > 0:
        pattern = np.zeros((nhop, norb * norb), dtype=np.float64)
        pattern[np.arange(nhop), ii.astype(np.int64) * norb + jj.astype(np.int64)] = 1.0
    else:
        use_pattern = False
        pattern = np.zeros((nhop, 0), dtype=np.float64)

    static = ModelStatic(
        dim_k=int(dim_k),
        dim_r=int(dim_r),
        norb=int(norb),
        nspin=int(nspin),
        per=per,
        nhop=int(nhop),
        use_pattern=bool(use_pattern),
    )
    data = BlochData(
        diag=host_pack(diag),
        amps=host_pack(amps),
        rv=rv,
        ii=ii,
        jj=jj,
        pattern=pattern,
    )
    return static, data
