"""Multi-terminal Landauer-Buttiker oracles (pythtb_tpu.negf).

- two-terminal reduction: a W/E-only hall_bar of the square lattice
  reproduces landauer_transmission of the equivalent ribbon (the
  independent RGF path) at 1e-4;
- S-matrix unitarity sum rule sum_q T_pq == sum_q T_qp on every
  geometry driven;
- the flagship quantization oracle: a QWZ Chern-insulator Hall cross
  with leads of the same material reads R_xy = +h/(C e^2) = +1 and
  R_xx ~ 0 from the Buttiker inversion, with NO magnetic gauge
  bookkeeping; conjugating the model (C -> -C) flips the sign; device
  disorder inside the gap does not move it (topological protection);
- Kane-Mele (spinful blocks through strip_blocks/coupling): T(W<-E)
  equals the two-terminal helical value 2 in the QSH gap and R_xy = 0
  by TRS;
- eta auto-escalation: an energy where the fixed-depth decimation
  overflows at tiny eta is recomputed at escalated eta (warned) and
  comes back finite;
- buttiker() current conservation and error paths.

The reference has no transport machinery at all (SURVEY section 2:
pythtb.py is a band-structure library); this tier extends the round-3
two-terminal NEGF suite (tests/test_negf.py) to Hall-bar geometries.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, negf


def qwz(m=-1.0, conj=False):
    """Qi-Wu-Zhang two-band Chern insulator (C = +1 for -2 < m < 0)."""
    lat = [[1.0, 0.0], [0.0, 1.0]]
    orb = [[0.0, 0.0], [0.0, 0.0]]
    mod = ptt.tb_model(2, 2, lat, orb)
    mod.set_onsite([m, -m])
    s = -1.0 if conj else 1.0
    mod.set_hop(0.5, 0, 0, [1, 0])
    mod.set_hop(-0.5, 1, 1, [1, 0])
    mod.set_hop(0.5, 0, 0, [0, 1])
    mod.set_hop(-0.5, 1, 1, [0, 1])
    mod.set_hop(0.5j * s, 0, 1, [1, 0])
    mod.set_hop(0.5j * s, 1, 0, [1, 0])
    mod.set_hop(0.5, 0, 1, [0, 1])
    mod.set_hop(-0.5, 1, 0, [0, 1])
    return mod


def sumrule(T):
    return np.abs(T.sum(axis=-1) - T.sum(axis=-2)).max()


def test_two_terminal_reduction():
    sq = ptt.models.square(t=-1.0)
    W = 4
    rib = sq.cut_piece(W, 1, glue_edgs=False)
    Es = np.array([-1.3, -0.5, 0.7])
    Tref = negf.landauer_transmission(rib, Es, eta=1e-7)
    Hd, leads, info = negf.hall_bar(sq, (3, W))
    assert info["order"] == ["W", "E", "S", "N"]
    T = negf.multi_terminal(Hd, [leads[0], leads[1]], Es, eta=1e-7)
    np.testing.assert_allclose(T[:, 0, 1], Tref, atol=1e-4)
    np.testing.assert_allclose(T[:, 1, 0], Tref, atol=1e-4)
    assert sumrule(T) < 1e-6


def test_qwz_hall_quantization_and_sign():
    Es = np.array([0.0])
    for conj, sign in ((False, 1.0), (True, -1.0)):
        mod = qwz(-1.0, conj=conj)
        Hd, leads, _ = negf.hall_bar(mod, (8, 8))
        T = negf.multi_terminal(Hd, leads, Es, eta=1e-7)
        assert sumrule(T[0]) < 1e-6
        V = negf.buttiker(T[0], source=0, drain=1)
        rxy = V[3] - V[2]
        rxx = (V[0] - V[1]) - abs(rxy)
        assert abs(rxy - sign) < 2e-3, (conj, rxy)
        assert abs(rxx) < 0.06, (conj, rxx)


def test_qwz_disorder_protected():
    mod = qwz(-1.0)
    Hd, leads, _ = negf.hall_bar(mod, (8, 8), disorder=0.5, seed=3)
    T = negf.multi_terminal(Hd, leads, np.array([0.0]), eta=1e-7)
    V = negf.buttiker(T[0], source=0, drain=1)
    assert abs((V[3] - V[2]) - 1.0) < 5e-3


def test_kane_mele_spinful_blocks_and_trs():
    km = ptt.models.kane_mele(esite=1.0, rashba=0.0)
    rib = km.cut_piece(5, 1, glue_edgs=False)
    Es = np.array([0.3])
    Tref = negf.landauer_transmission(rib, Es, eta=1e-6)
    np.testing.assert_allclose(Tref, 2.0, atol=1e-5)
    Hd, leads, _ = negf.hall_bar(km, (3, 5))
    T = negf.multi_terminal(Hd, [leads[0], leads[1]], Es, eta=1e-6)
    np.testing.assert_allclose(T[:, 0, 1], 2.0, atol=1e-4)
    # full cross: at B = 0 the Onsager/TRS relation T_pq == T_qp is
    # EXACT (the spinful S-matrix is self-dual), and the Hall signal is
    # geometric leakage only, far below the h/e^2 quantum (the 3x5
    # honeycomb cross has no x -> -x mirror, so it need not vanish)
    T4 = negf.multi_terminal(Hd, leads, Es, eta=1e-6)
    assert sumrule(T4[0]) < 1e-5
    np.testing.assert_allclose(T4[0], T4[0].T, atol=1e-6)
    V = negf.buttiker(T4[0], source=0, drain=1)
    assert abs(V[3] - V[2]) < 0.05


def test_eta_escalation_recovers_overflow(monkeypatch):
    # The decimation overflow is an f32-hardware failure mode (measured
    # on QWZ at eta=1e-7 on the chip; x64 CPU never overflows even at
    # eta=1e-15), so the per-energy escalation HOST logic is pinned
    # deterministically: the jit core is wrapped to poison energy 0.2
    # whenever eta < 1e-6, and the wrapper must recompute exactly that
    # energy at escalated eta, warn, and leave the clean energy at its
    # original small-eta value.
    mod = qwz(-1.0)
    Hd, leads, _ = negf.hall_bar(mod, (8, 8))
    Es = np.array([0.0, 0.2])
    T_ref = negf.multi_terminal(Hd, leads, Es, eta=1e-7)

    real = negf._multi_terminal_jit

    def poisoned(hd, packed, energies, eta, iters, mesh=None):
        T, res = real(hd, packed, energies, eta, iters, mesh)
        import jax.numpy as jnp

        if float(eta) < 1e-6:
            bad = jnp.isclose(energies, 0.2)[:, None, None]
            T = jnp.where(bad, jnp.nan, T)
        return T, res

    monkeypatch.setattr(negf, "_multi_terminal_jit", poisoned)
    with pytest.warns(UserWarning, match="escalated"):
        T = negf.multi_terminal(Hd, leads, Es, eta=1e-7)
    assert np.isfinite(T).all()
    assert sumrule(T[1]) < 1e-4
    # the clean energy kept its small-eta values bit-for-bit
    np.testing.assert_array_equal(T[0], T_ref[0])
    # the poisoned energy was recomputed at escalated (>= 1e-6) eta and
    # agrees with the unpoisoned run at transmission-level accuracy
    np.testing.assert_allclose(T[1], T_ref[1], atol=1e-3)


def test_buttiker_conservation_and_errors():
    mod = qwz(-1.0)
    Hd, leads, _ = negf.hall_bar(mod, (6, 6))
    T = negf.multi_terminal(Hd, leads, np.array([0.0]), eta=1e-6)[0]
    V = negf.buttiker(T, source=0, drain=1, current=2.5)
    assert V[1] == 0.0
    # floating probes carry zero current: I_p = sum_q (T_qp V_p - T_pq V_q)
    I = T.sum(axis=0) * V - T @ V
    np.testing.assert_allclose(I[2:], 0.0, atol=1e-8)
    np.testing.assert_allclose(I[0], 2.5, atol=1e-6)
    np.testing.assert_allclose(I[1], -2.5, atol=1e-6)
    with pytest.raises(PythtbError):
        negf.buttiker(T, source=1, drain=1)
    with pytest.raises(PythtbError):
        negf.buttiker(T[:3, :2], source=0, drain=1)


def test_input_validation():
    mod = qwz(-1.0)
    Hd, leads, _ = negf.hall_bar(mod, (4, 4))
    bad = Hd.copy()
    bad[0, 1] += 1.0  # breaks Hermiticity
    with pytest.raises(PythtbError, match="Hermitian"):
        negf.multi_terminal(bad, leads, [0.0])
    with pytest.raises(PythtbError, match="at least 2"):
        negf.multi_terminal(Hd, leads[:1], [0.0])
    H00, Hin, W = leads[0]
    with pytest.raises(PythtbError, match="coupling"):
        negf.multi_terminal(Hd, [(H00, Hin, W[:, :-1]), leads[1]], [0.0])
    with pytest.raises(PythtbError, match="2-D periodic"):
        negf.hall_bar(ptt.models.ssh(), (4, 4))
    with pytest.raises(PythtbError, match="2 x 2"):
        negf.hall_bar(mod, (1, 4))
    with pytest.raises(PythtbError, match="lead_width"):
        negf.hall_bar(mod, (4, 4), lead_width=9)
