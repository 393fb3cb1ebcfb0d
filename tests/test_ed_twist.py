"""Twisted-boundary many-body topology (ed.many_body_chern & co.).

Oracle strategy:

* **U = 0 exactness**: for a Slater-determinant ground state the
  twist-torus plaquette Chern number equals the filled-band Chern
  number exactly (Niu-Thouless-Wu); pinned against the package's
  independent k-space plaquette engine (``flows.chern_number``).
* **L = (1, 1) identity**: with one cell the twisted one-body
  Hamiltonian IS the Bloch Hamiltonian at k = theta / 2 pi, so the
  single-electron twist Chern is algebraically the band Chern -- no
  finite-size caveat at all.  This also exercises the self-wrap edge
  case (hops mapping a site onto itself with a nonzero wrap).
* **Resta determinant identity**: for free fermions
  ``<e^{2 pi i X / L}> = det(U_occ^dag D U_occ)`` -- an algebraic
  identity at any L, checked at 1e-12 against an independent dense
  diagonalization.
* **Interaction robustness**: quantized invariants must not move
  under interactions that do not close the gap (NTW).
* **Charge pumping**: the winding of the many-body twist Berry phase
  over a Rice-Mele cycle equals the winding of the occupied-band Zak
  phase computed by the (independent) wf_array Berry-phase engine.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, ed, flows
from pythtb_tpu.models.library import haldane, kane_mele, ssh


HALDANE_NN_V = [(1.0, 0, 1, (0, 0)), (1.0, 1, 0, (1, 0)), (1.0, 1, 0, (0, 1))]


def _scale(terms, v):
    return [(v * a, i, j, R) for (a, i, j, R) in terms]


# ---------------------------------------------------------------------------
# many_body_chern


def test_u0_equals_band_chern_2x2():
    m = haldane()
    c_band = flows.chern_number(m, occ=[0], nk=(31, 31))
    c_mb = ed.many_body_chern(m, (2, 2), nelec=4, grid=6)
    assert abs(c_mb - round(c_mb)) < 1e-10
    assert abs(c_mb - c_band) < 1e-8


def test_one_cell_torus_is_bloch_identity():
    # L = (1, 1), nelec = 1: the twist torus IS the Brillouin zone and
    # the sector is the single-particle Hilbert space
    m = haldane()
    c = ed.many_body_chern(m, (1, 1), nelec=1, grid=10)
    assert abs(c - flows.chern_number(m, occ=[0], nk=(31, 31))) < 1e-10


def test_interacting_haldane_stays_quantized():
    m = haldane()
    c = ed.many_body_chern(m, (2, 2), nelec=4,
                           interactions=_scale(HALDANE_NN_V, 0.5), grid=6)
    assert abs(c + 1.0) < 1e-10


def test_trivial_phase_is_zero():
    m = haldane(delta=1.5, t2=0.0)
    assert abs(ed.many_body_chern(m, (2, 2), nelec=4, grid=6)) < 1e-10


def test_spin_degenerate_multiplet():
    # spinful U = 0 Haldane, one electron on the (1,1) torus: the
    # ground multiplet is the exact 2-fold spin doublet and its
    # rank-2 det-link Chern is 2 x the band Chern
    m = haldane()
    c = ed.many_body_chern(m, (1, 1), nelec=1, spinful=True,
                           multiplet=2, grid=10)
    assert abs(c + 2.0) < 1e-10
    # the q = 1 scalar method on the same degenerate doublet must warn
    with pytest.warns(UserWarning, match="not gapped"):
        ed.many_body_chern(m, (1, 1), nelec=1, spinful=True, grid=4)


def test_nspin2_mode_flattening():
    # Kane-Mele (nspin == 2 amplitudes): filled Kramers pair on the
    # one-cell torus has total Chern 0 by TRS
    m = kane_mele()
    c = ed.many_body_chern(m, (1, 1), nelec=2, grid=8)
    assert abs(c) < 1e-10


def test_hubbard_u_haldane():
    # spinful Haldane + Hubbard U on the one-cell torus, 2 electrons:
    # the Chern number survives small U, then steps down through
    # U-driven transitions (measured: -2 up to U ~ 0.8, -1 at U = 1,
    # 0 by U = 2) -- pin the quantized plateau on each side
    m = haldane()
    assert abs(ed.many_body_chern(m, (1, 1), nelec=2, u=0.5, grid=8)
               + 2.0) < 1e-10
    assert abs(ed.many_body_chern(m, (1, 1), nelec=2, u=2.0, grid=8)
               ) < 1e-10


def test_chern_needs_2d():
    with pytest.raises(PythtbError, match="2-D"):
        ed.many_body_chern(ssh(), (4,), nelec=4)


# ---------------------------------------------------------------------------
# twist_berry_phase


@pytest.mark.slow
def test_ssh_twist_phase_quantized():
    # inversion quantizes the U = 0 twist Berry phase to {0, pi}; the
    # two dimerizations differ by pi
    pa = ed.twist_berry_phase(ssh(delta=-0.3), (6,), nelec=6, grid=12)
    pb = ed.twist_berry_phase(ssh(delta=0.3), (6,), nelec=6, grid=12)
    assert min(abs(pa), abs(abs(pa) - np.pi)) < 1e-10
    assert min(abs(pb), abs(abs(pb) - np.pi)) < 1e-10
    assert abs(abs(pa - pb) - np.pi) < 1e-10


@pytest.mark.slow
def test_ssh_twist_phase_interaction_robust():
    # nearest-neighbor V preserves inversion: the phase stays pinned
    inter = [(0.8, 0, 1, (0,)), (0.8, 1, 0, (1,))]
    pa = ed.twist_berry_phase(ssh(delta=-0.3), (6,), nelec=6, grid=12,
                              interactions=inter)
    pa0 = ed.twist_berry_phase(ssh(delta=-0.3), (6,), nelec=6, grid=12)
    assert abs(pa - pa0) < 1e-10


def _rice_mele(lam, t=1.0, dt=0.6, d0=0.8):
    m = ptt.tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
    m.set_onsite([d0 * np.sin(lam), -d0 * np.sin(lam)])
    m.set_hop(t + dt * np.cos(lam), 0, 1, [0])
    m.set_hop(t - dt * np.cos(lam), 1, 0, [1])
    return m


def test_rice_mele_pump_winding_matches_zak():
    # the many-body twist phase must pump exactly one charge per
    # Rice-Mele cycle, with the SAME winding sign as the occupied-band
    # Zak phase from the independent wf_array engine (winding is
    # embedding-offset-free, so the conventions are comparable)
    L, nlam = 4, 9
    lams = np.linspace(0.0, 2.0 * np.pi, nlam)
    mb, sp = [], []
    for lam in lams:
        m = _rice_mele(lam)
        mb.append(ed.twist_berry_phase(m, (L,), nelec=L, grid=10))
        wf = ptt.wf_array(m, [L + 1])
        wf.solve_on_grid([0.0])
        sp.append(float(wf.berry_phase([0], 0)))
    from pythtb_tpu.utils.continuity import no_2pi

    def winding(ph):
        out = [float(ph[0])]
        for x in ph[1:]:
            out.append(float(no_2pi(float(x), out[-1])))
        return out[-1] - out[0]

    w_mb = winding(mb)
    w_sp = winding(sp)
    assert abs(w_mb - 2.0 * np.pi * round(w_mb / (2.0 * np.pi))) < 1e-8
    assert abs(w_mb) > 1.0  # it actually pumps
    assert abs(w_mb - w_sp) < 1e-8


def test_pump_winding_interaction_robust():
    # quantization of the pumped charge survives interactions
    L, nlam = 4, 7
    lams = np.linspace(0.0, 2.0 * np.pi, nlam)
    inter = [(0.5, 0, 1, (0,)), (0.5, 1, 0, (1,))]
    ph = [ed.twist_berry_phase(_rice_mele(lam), (L,), nelec=L, grid=10,
                               interactions=inter) for lam in lams]
    unwrapped = np.unwrap(ph)
    w = unwrapped[-1] - unwrapped[0]
    assert abs(abs(w) - 2.0 * np.pi) < 1e-8


# ---------------------------------------------------------------------------
# resta_polarization


def test_resta_free_fermion_det_identity():
    # <e^{2 pi i X / L}> on the Slater ground state == det(U^dag D U):
    # algebraic identity, independent dense diagonalization
    m = ssh(delta=-0.3)
    L, nel = 6, 6
    m0, wraps, mats, fracpos, _ = ed._torus_onebody(m, (L,))
    h = m0.copy()
    for M in mats:
        h += M + M.conj().T
    w, v = np.linalg.eigh(h)
    assert w[nel] - w[nel - 1] > 1e-8
    Uocc = v[:, :nel]
    D = np.diag(np.exp(2j * np.pi * fracpos[:, 0]))
    det = np.linalg.det(Uocc.conj().T @ D @ Uocc)
    p_det = np.angle(det) / (2.0 * np.pi)
    p = ed.resta_polarization(m, (L,), nel)
    assert abs((p - p_det + 0.5) % 1.0 - 0.5) < 1e-12


def test_resta_dimerization_difference_is_half():
    pa = ed.resta_polarization(ssh(delta=-0.3), (6,), 6)
    pb = ed.resta_polarization(ssh(delta=0.3), (6,), 6)
    assert abs(abs(pa - pb) - 0.5) < 1e-10
    # V preserving inversion leaves each pinned
    inter = [(0.6, 0, 1, (0,)), (0.6, 1, 0, (1,))]
    pv = ed.resta_polarization(ssh(delta=-0.3), (6,), 6,
                               interactions=inter)
    assert abs(pv - pa) < 1e-10


# ---------------------------------------------------------------------------
# guards


def test_self_interaction_raises():
    with pytest.raises(PythtbError, match="onto itself"):
        ed.many_body_chern(haldane(), (2, 2), nelec=4,
                           interactions=[(1.0, 0, 0, (0, 0))])


def test_hubbard_needs_spinful():
    # u > 0 forces the spin-doubled set automatically; but interactions
    # passed with an explicit spinless layout stay spinless -- check u
    # on a spinless request promotes rather than raises
    c = ed.many_body_chern(haldane(), (1, 1), nelec=2, u=0.5, grid=6)
    assert np.isfinite(c)


def test_mode_limit_raises():
    with pytest.raises(PythtbError, match="63"):
        ed.many_body_chern(haldane(), (8, 8), nelec=4)
