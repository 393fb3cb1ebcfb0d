"""Coherent quantum transport: Landauer conductance by NEGF.

The reference has no transport story at all; this module adds the
standard two-terminal Landauer-Buttiker machinery on top of the
package's Sancho-Rubio decimation (:mod:`pythtb_tpu.surface`):

    T(E) = Tr[ Gamma_L G_D Gamma_R G_D^dag ],
    G_D = [(E + i eta) - H_D - Sigma_L - Sigma_R]^{-1},
    Sigma_L = V^dag g_L V,   Sigma_R = V g_R V^dag,
    Gamma = i (Sigma - Sigma^dag),

with ``g_L/R`` the left/right lead surface Green's functions from the
same fixed-depth decimation scan that powers
:func:`pythtb_tpu.surface.spectral_function` -- the whole energy batch
is ONE device program.

Leads are described by any 1-D periodic model (typically
``ribbon = model2d.cut_piece(W, 1)``): the principal-layer blocks
H00/H01 come from :func:`pythtb_tpu.surface._layer_blocks`, so
second-neighbor-and-beyond couplings along the wire are handled by the
same supercell enlargement the surface module uses.  The device region
defaults to one pristine principal layer and accepts any Hermitian
matrix of the same size (e.g. ``H00 + diag(disorder)``) -- enough for
quantum point contacts, single impurities, and Anderson wires.

Oracle (committed): a PRISTINE wire's transmission is EXACTLY the
number of propagating modes at E -- an integer staircase computed
independently by counting band crossings of the lead dispersion;
disorder can only reduce it (0 <= T <= T_pristine); a strong barrier
suppresses it exponentially.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .model import PythtbError
from .utils.xfer import host_pack, host_unpack, pack_cplx, unpack_cplx

__all__ = ["landauer_transmission", "lead_blocks", "mode_count"]


def lead_blocks(lead_model):
    """Principal-layer blocks of a 1-D lead: ``(H00, H01)`` dense
    complex matrices (H00 Hermitian intra-layer, H01 the one-sided
    coupling INTO the next layer along the wire).  Multi-cell hopping
    ranges are folded by the same supercell construction as
    :mod:`pythtb_tpu.surface`."""
    from .surface import _layer_blocks

    if lead_model._dim_k != 1:
        raise PythtbError(
            "lead_blocks needs a 1-D periodic lead (cut_piece a ribbon "
            "from a higher-dimensional model first)"
        )
    surf_dir = int(lead_model._per[0])
    s00, s01, d00, d01, _m = _layer_blocks(lead_model, surf_dir)
    H00_ri, H01_ri = jax.device_get(_lead_blocks_jit(s00, s01, d00, d01))
    return host_unpack(H00_ri), host_unpack(H01_ri)


@partial(jax.jit, static_argnums=(0, 1))
def _lead_blocks_jit(s00, s01, d00, d01):
    from .ops.hamiltonian import assemble
    from .surface import _one_sided

    kpar = jnp.zeros((1, 0), config.float_dtype())
    return (pack_cplx(assemble(s00, d00, kpar)[0]),
            pack_cplx(_one_sided(s01, d01, kpar)[0]))


@partial(jax.jit, static_argnums=(5, 6))
def _landauer_jit(H00_ri, H01_ri, Hd_ri, energies, eta, iters, nlay):
    """T(E) for the whole energy batch: two decimations (left/right
    surface GFs) + self-energies + one dense solve per energy.  The
    device is ``nlay`` layers (diagonal blocks stacked in Hd_ri's
    leading axis) chained by H01."""
    hp = jax.lax.Precision.HIGHEST
    mm = partial(jnp.matmul, precision=hp)
    H00 = unpack_cplx(H00_ri)
    H01 = unpack_cplx(H01_ri)
    Hd = unpack_cplx(Hd_ri)  # (nlay, S, S)
    S = H00.shape[-1]
    ctype = H00.dtype
    eye = jnp.eye(S, dtype=ctype)
    w = (energies.astype(jnp.real(jnp.zeros(0, ctype)).dtype)
         + 1j * jnp.asarray(eta, ctype))
    wI = w[:, None, None] * eye  # (E, S, S)

    def surface_g(a0):
        """Sancho-Rubio surface GF with inter-layer block a0."""
        es = jnp.broadcast_to(H00[None], wI.shape)
        e = es
        a = jnp.broadcast_to(a0[None], wI.shape)
        b = jnp.conj(jnp.swapaxes(a, -1, -2))

        def step(carry, _):
            es, e, a, b = carry
            g = jnp.linalg.solve(wI - e, jnp.broadcast_to(eye, e.shape))
            agb = mm(a, mm(g, b))
            bga = mm(b, mm(g, a))
            return (es + agb, e + agb + bga, mm(a, mm(g, a)),
                    mm(b, mm(g, b))), None

        (es, _, _, _), _ = jax.lax.scan(step, (es, e, a, b), None,
                                        length=iters)
        return jnp.linalg.solve(wI - es, jnp.broadcast_to(eye, es.shape))

    # left lead extends to -inf: its exposed face couples via H01 into
    # the device, and its surface GF is the H01^dag-oriented one; the
    # right lead is the mirror.  (Orientation is pinned by the
    # pristine-wire == mode-count oracle.)
    H01d = jnp.conj(H01.T)
    gL = surface_g(H01d)
    gR = surface_g(H01)
    SigL = mm(jnp.broadcast_to(H01d[None], wI.shape),
              mm(gL, jnp.broadcast_to(H01[None], wI.shape)))
    SigR = mm(jnp.broadcast_to(H01[None], wI.shape),
              mm(gR, jnp.broadcast_to(H01d[None], wI.shape)))
    GamL = 1j * (SigL - jnp.conj(jnp.swapaxes(SigL, -1, -2)))
    GamR = 1j * (SigR - jnp.conj(jnp.swapaxes(SigR, -1, -2)))
    # block-tridiagonal device: nlay diagonal blocks chained by H01,
    # assembled dense (fine for nlay * S up to a few thousand)
    N = nlay * S
    nE = energies.shape[0]
    Hbig = jnp.zeros((N, N), dtype=ctype)
    for l in range(nlay):
        Hbig = Hbig.at[l * S:(l + 1) * S, l * S:(l + 1) * S].set(Hd[l])
        if l + 1 < nlay:
            Hbig = Hbig.at[l * S:(l + 1) * S,
                           (l + 1) * S:(l + 2) * S].set(H01)
            Hbig = Hbig.at[(l + 1) * S:(l + 2) * S,
                           l * S:(l + 1) * S].set(H01d)
    Sig = jnp.zeros((nE, N, N), dtype=ctype)
    Sig = Sig.at[:, :S, :S].add(SigL)
    Sig = Sig.at[:, N - S:, N - S:].add(SigR)
    eyeN = jnp.eye(N, dtype=ctype)
    A = (w[:, None, None] * eyeN - Hbig[None] - Sig)
    # only the (first-block x last-block) corner of G enters T
    rhs = jnp.broadcast_to(eyeN[:, N - S:], (nE, N, S))
    Gcol = jnp.linalg.solve(A, rhs)  # (nE, N, S) = G[:, :, last block]
    G1n = Gcol[:, :S, :]             # (nE, S, S) = G_{1, nlay}
    T = jnp.einsum("eab,ebc,ecd,eda->e", GamL, G1n, GamR,
                   jnp.conj(jnp.swapaxes(G1n, -1, -2)), precision=hp)
    return jnp.real(T)


def landauer_transmission(lead_model, energies, device=None, eta=1e-6,
                          iters=60):
    """Two-terminal Landauer transmission ``T(E)`` (conductance in
    units of ``2 e^2 / h`` per spin convention of the model), one
    device program for the whole energy batch.

    :param lead_model: 1-D periodic lead (e.g. a ribbon from
      ``cut_piece``); both leads are copies of it
    :param energies: (nE,) energies
    :param device: scattering region in the principal-layer basis
      (default: one pristine layer H00): a Hermitian (S, S) matrix or
      a LIST of them -- consecutive layers chained by the lead's H01
      (barriers of any length, Anderson wires).  Build blocks from
      :func:`lead_blocks`, e.g. ``[H00 + np.diag(d) for d in ...]``
    :param eta: positive infinitesimal
    :param iters: decimation depth (coupling decays doubly
      exponentially; 60 covers eta down to ~1e-8)
    :returns: (nE,) float transmission
    """
    H00, H01 = lead_blocks(lead_model)
    S = H00.shape[0]
    if device is None:
        layers = [H00]
    elif isinstance(device, (list, tuple)):
        layers = [np.asarray(d, dtype=np.complex128) for d in device]
    else:
        layers = [np.asarray(device, dtype=np.complex128)]
    if len(layers) == 0:
        raise PythtbError("device needs at least one layer")
    for d in layers:
        if d.shape != (S, S):
            raise PythtbError(
                "device layers must be (%d, %d) in the principal-layer "
                "basis (see lead_blocks)" % (S, S))
        if np.abs(d - d.conj().T).max() > 1e-12:
            raise PythtbError("device layers must be Hermitian")
    Hd = np.stack(layers)
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    ftype = config.float_dtype()
    T = jax.device_get(_landauer_jit(
        host_pack(H00), host_pack(H01), host_pack(Hd),
        jnp.asarray(energies, ftype), jnp.asarray(float(eta), ftype),
        int(iters), len(layers),
    ))
    return np.asarray(T, dtype=np.float64)


def mode_count(lead_model, energies, nk=512):
    """Independent mode counter: the number of propagating channels at
    each energy from the lead dispersion (band crossings around the
    closed k-loop, counted with multiplicity) -- the exact value of
    the pristine-wire transmission."""
    if lead_model._dim_k != 1:
        raise PythtbError("mode_count needs a 1-D lead")
    ks = (np.arange(nk) / nk)[:, None]
    ev = np.asarray(lead_model.solve_all(ks))  # (nsta, nk)
    energies = np.atleast_1d(np.asarray(energies, dtype=np.float64))
    out = np.zeros(len(energies), dtype=int)
    for ie, E in enumerate(energies):
        s = np.sign(ev - E)  # (nsta, nk)
        crossings = np.sum(s != np.roll(s, 1, axis=1), axis=1)
        out[ie] = int(np.sum(crossings) // 2)
    return out
