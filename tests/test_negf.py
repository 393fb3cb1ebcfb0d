"""Landauer/NEGF oracles (pythtb_tpu.negf).

- the pristine-wire transmission equals the independently counted
  number of propagating modes (integer staircase; energies where the
  counter itself is stable under +-h shifts, avoiding band-edge
  tangencies);
- the Kane-Mele QSH ribbon transmits exactly 2 in the bulk gap (one
  helical pair per edge) and keeps doing so under TRS-preserving
  disorder (topological protection) while a trivial wire does not;
- a strong barrier suppresses transmission; disorder cannot exceed the
  pristine value.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, negf


def test_pristine_equals_mode_count():
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(5, 1, glue_edgs=False)
    Es = np.linspace(-2.6, 2.6, 53)
    T = negf.landauer_transmission(rib, Es, eta=1e-7)
    M = negf.mode_count(rib, Es)
    h = 0.02
    Mm = negf.mode_count(rib, Es - h)
    Mp = negf.mode_count(rib, Es + h)
    stable = (M == Mm) & (M == Mp) & (M > 0)
    assert stable.sum() >= 20
    assert np.abs(T[stable] - M[stable]).max() < 1e-4


def test_qsh_quantized_and_disorder_protected():
    km = ptt.models.kane_mele(esite=1.0, rashba=0.0)
    rib = km.cut_piece(6, 1, glue_edgs=False)
    Es = np.array([-0.4, -0.2, 0.2, 0.4])
    T = negf.landauer_transmission(rib, Es, eta=1e-7)
    np.testing.assert_allclose(T, 2.0, atol=1e-6)
    # TRS-preserving onsite disorder in the device: the helical pair
    # cannot backscatter -- T stays pinned at 2
    H00, _ = negf.lead_blocks(rib)
    rng = np.random.default_rng(0)
    dis = np.repeat(rng.uniform(-0.4, 0.4, len(H00) // 2), 2)
    Td = negf.landauer_transmission(rib, Es, device=H00 + np.diag(dis),
                                    eta=1e-7)
    np.testing.assert_allclose(Td, 2.0, atol=0.02)
    # contrast: a trivial metal wire IS degraded by the same disorder
    g = ptt.models.graphene(t=-1.0)
    rib2 = g.cut_piece(5, 1, glue_edgs=False)
    G00, _ = negf.lead_blocks(rib2)
    dis2 = rng.uniform(-0.8, 0.8, len(G00))
    E1 = np.array([1.25])
    T0 = negf.landauer_transmission(rib2, E1, eta=1e-7)
    Tdis = negf.landauer_transmission(rib2, E1,
                                      device=G00 + np.diag(dis2),
                                      eta=1e-7)
    assert Tdis[0] < T0[0] - 0.05
    assert Tdis[0] > 0.0


def test_barrier_and_bounds():
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(5, 1, glue_edgs=False)
    H00, _ = negf.lead_blocks(rib)
    E1 = np.array([1.25])
    T0 = negf.landauer_transmission(rib, E1, eta=1e-7)
    Tb = negf.landauer_transmission(rib, E1,
                                    device=H00 + 6.0 * np.eye(len(H00)),
                                    eta=1e-7)
    assert Tb[0] < 0.1 * T0[0]
    # transmission never exceeds the channel count (where the counter
    # is stable -- exact band-edge tangencies undercount crossings)
    Es = np.linspace(-2.5, 2.5, 41)
    T = negf.landauer_transmission(rib, Es, eta=1e-7)
    M = negf.mode_count(rib, Es)
    h = 0.02
    stable = ((M == negf.mode_count(rib, Es - h))
              & (M == negf.mode_count(rib, Es + h)) & (M > 0))
    assert np.all(T[stable] <= M[stable] + 1e-3)


def test_guards():
    g = ptt.models.graphene()
    with pytest.raises(PythtbError):
        negf.landauer_transmission(g, [0.0])  # 2-D model, not a lead
    rib = g.cut_piece(3, 1, glue_edgs=False)
    with pytest.raises(PythtbError):
        negf.landauer_transmission(rib, [0.0], device=np.eye(3))
    H00, _ = negf.lead_blocks(rib)
    bad = H00.copy()
    bad[0, 1] += 1.0  # non-Hermitian
    with pytest.raises(PythtbError):
        negf.landauer_transmission(rib, [0.0], device=bad)


def test_multilayer_pristine_and_tunneling():
    """A device of n PRISTINE layers transmits exactly like one (the
    multi-layer chain assembly is seamless); an in-gap barrier region
    decays exponentially with length at a constant slope (evanescent
    complex-band tunneling)."""
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(5, 1, glue_edgs=False)
    H00, _ = negf.lead_blocks(rib)
    E1 = np.array([1.25])
    T1 = negf.landauer_transmission(rib, E1, eta=1e-7)[0]
    for n in (3, 7):
        Tn = negf.landauer_transmission(rib, E1, device=[H00] * n,
                                        eta=1e-7)[0]
        assert abs(Tn - T1) < 1e-4
    Ts = [negf.landauer_transmission(
        rib, E1, device=[H00 + 6.0 * np.eye(len(H00))] * n,
        eta=1e-9)[0] for n in (2, 4, 6, 8)]
    slopes = np.diff(np.log(Ts)) / 2.0
    assert slopes.max() < -3.0  # strongly evanescent
    assert np.abs(slopes - slopes.mean()).max() < 0.1  # constant slope
    # guards
    with pytest.raises(PythtbError):
        negf.landauer_transmission(rib, E1, device=[])


def test_rgf_matches_dense_assembly():
    """The recursive Green's function sweep equals an explicit dense
    block-tridiagonal inversion (test-side numpy, shares nothing with
    the scan) on a disordered 4-layer device."""
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(4, 1, glue_edgs=False)
    H00, H01 = negf.lead_blocks(rib)
    S = len(H00)
    rng = np.random.default_rng(7)
    layers = [H00 + np.diag(rng.uniform(-0.5, 0.5, S)) for _ in range(4)]
    Es = np.array([-1.3, 0.7, 1.6])
    eta = 1e-6
    T = negf.landauer_transmission(rib, Es, device=layers, eta=eta)

    # dense reference: lead surface g by plain host iteration
    def surf(E, a0):
        es = H00.copy()
        e = H00.copy()
        a = a0.copy()
        b = a0.conj().T.copy()
        w = (E + 1j * eta) * np.eye(S)
        for _ in range(60):
            gg = np.linalg.inv(w - e)
            es = es + a @ gg @ b
            e = e + a @ gg @ b + b @ gg @ a
            a, b = a @ gg @ a, b @ gg @ b
        return np.linalg.inv(w - es)

    for iE, E in enumerate(Es):
        gL = surf(E, H01.conj().T)
        gR = surf(E, H01)
        SigL = H01.conj().T @ gL @ H01
        SigR = H01 @ gR @ H01.conj().T
        GamL = 1j * (SigL - SigL.conj().T)
        GamR = 1j * (SigR - SigR.conj().T)
        N = 4 * S
        Hbig = np.zeros((N, N), complex)
        for l in range(4):
            Hbig[l * S:(l + 1) * S, l * S:(l + 1) * S] = layers[l]
            if l < 3:
                Hbig[l * S:(l + 1) * S, (l + 1) * S:(l + 2) * S] = H01
                Hbig[(l + 1) * S:(l + 2) * S, l * S:(l + 1) * S] = \
                    H01.conj().T
        Sig = np.zeros((N, N), complex)
        Sig[:S, :S] = SigL
        Sig[N - S:, N - S:] = SigR
        G = np.linalg.inv((E + 1j * eta) * np.eye(N) - Hbig - Sig)
        G1n = G[:S, N - S:]
        Tref = np.real(np.trace(GamL @ G1n @ GamR @ G1n.conj().T))
        assert abs(T[iE] - Tref) < 1e-8


def test_decimation_warning_and_stability_mask():
    """Regressions (review): an eta too small for the decimation depth
    must WARN instead of returning silent garbage, and mode_count's
    stability mask flags band-edge tangencies as -1."""
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(5, 1, glue_edgs=False)
    Es = np.linspace(-2.6, 2.6, 53)
    with pytest.warns(UserWarning, match="not converged"):
        T = negf.landauer_transmission(rib, Es, eta=1e-14)
    assert np.isnan(T).any()  # the warning marks real garbage
    M = negf.mode_count(rib, np.array([1.0, 1.25]), stability_h=0.02)
    assert M[0] == -1   # exact band-edge tangency flagged
    assert M[1] == 4    # stable energy keeps its count


def test_spin_resolved_helical_split():
    """Sz-conserving QSH ribbon: the T = 2 plateau splits as exactly
    1 + 1 per spin; the per-spin sum equals the total; a Rashba lead
    (Sz broken) raises instead of returning a fake split."""
    km = ptt.models.kane_mele(esite=1.0, rashba=0.0)
    rib = km.cut_piece(6, 1, glue_edgs=False)
    Es = np.array([-0.3, 0.3])
    Ts = negf.landauer_transmission(rib, Es, eta=1e-7,
                                    spin_resolved=True)
    assert Ts.shape == (2, 2)
    np.testing.assert_allclose(Ts, 1.0, atol=1e-6)
    Tt = negf.landauer_transmission(rib, Es, eta=1e-7)
    np.testing.assert_allclose(Ts.sum(axis=1), Tt, atol=1e-6)
    bad = ptt.models.kane_mele(esite=1.0, rashba=0.3).cut_piece(
        4, 1, glue_edgs=False)
    with pytest.raises(PythtbError, match="Sz conservation"):
        negf.landauer_transmission(bad, Es, spin_resolved=True)
    with pytest.raises(PythtbError, match="spinful"):
        negf.landauer_transmission(
            ptt.models.graphene().cut_piece(3, 1, glue_edgs=False), Es,
            spin_resolved=True)


def test_anderson_localization_monotone():
    """Disorder-averaged <ln T> decreases monotonically with device
    length (localization; fixed seeds, deterministic)."""
    g = ptt.models.graphene(t=-1.0)
    rib = g.cut_piece(4, 1, glue_edgs=False)
    H00, _ = negf.lead_blocks(rib)
    S = len(H00)
    E1 = np.array([1.25])
    means = []
    for L in (4, 8, 32):
        lnT = []
        for s_ in range(6):
            rr = np.random.default_rng(100 * s_ + L)
            layers = [H00 + np.diag(rr.uniform(-1.5, 1.5, S))
                      for _ in range(L)]
            T = negf.landauer_transmission(rib, E1, device=layers,
                                           eta=1e-7)
            lnT.append(np.log(max(T[0], 1e-300)))
        means.append(np.mean(lnT))
    assert means[0] > means[1] > means[2]
    assert means[2] < -6.0  # strongly localized by L = 32


def test_thermoelectrics_mott_and_wiedemann_franz():
    """Landauer thermoelectrics: the Seebeck coefficient obeys the
    Mott relation against an independent finite-difference d ln G/dmu,
    and kappa_e/(G T) converges to the Lorenz number pi^2/3 at O(T^2)
    (disordered device so T(E) is smooth, not a staircase)."""
    rib = ptt.models.graphene(t=-1.0).cut_piece(5, 1, glue_edgs=False)
    H00, _ = negf.lead_blocks(rib)
    rng = np.random.default_rng(3)
    dev = [H00 + np.diag(rng.uniform(-1.0, 1.0, len(H00)))
           for _ in range(3)]
    kt = 0.02
    r = negf.thermoelectrics(rib, 1.25, kt, device=dev)
    h = 0.01
    Gp = negf.thermoelectrics(rib, 1.25 + h, kt, device=dev)["G"]
    Gm = negf.thermoelectrics(rib, 1.25 - h, kt, device=dev)["G"]
    mott = -(np.pi**2 / 3.0) * kt * (np.log(Gp) - np.log(Gm)) / (2 * h)
    assert abs(r["S"] - mott) < 0.03 * max(abs(mott), 1e-3)
    wf = []
    for ktv in (0.01, 0.0025):
        rv = negf.thermoelectrics(rib, 1.25, ktv, device=dev,
                                  n_energies=1601)
        wf.append(rv["kappa_e"] / (rv["G"] * ktv))
    L0 = np.pi**2 / 3.0
    assert abs(wf[1] - L0) < 1e-3 * L0
    assert abs(wf[1] - L0) < 0.2 * abs(wf[0] - L0)  # O(T^2)
    # batch shape + guard
    rb = negf.thermoelectrics(rib, [1.2, 1.3], kt, device=dev)
    assert rb["G"].shape == (2,)
    with pytest.raises(PythtbError):
        negf.thermoelectrics(rib, 1.0, 0.0)


def test_thermoelectrics_gap_returns_nan_with_warning():
    """mu inside a transport gap: G is numerical noise and S = L1/L0 is
    an ill-conditioned 0/0 -- the API must warn and return NaN instead
    of astronomically large finite garbage (ADVICE r3)."""
    ssh = ptt.models.ssh(t=1.0, delta=0.5)  # bands +-[1, 2], gap (-1, 1)
    with pytest.warns(UserWarning, match="transport gap"):
        r = negf.thermoelectrics(ssh, 0.0, 0.01)
    assert np.isnan(r["S"]) and np.isnan(r["kappa_e"])
    assert 0.0 <= r["G"] < 1e-10
    # mixed batch: NaN only where gapped, finite physics elsewhere
    with pytest.warns(UserWarning, match="transport gap"):
        rb = negf.thermoelectrics(ssh, [0.0, 1.5], 0.01)
    assert np.isnan(rb["S"][0]) and np.isfinite(rb["S"][1])
    assert abs(rb["G"][1] - 1.0) < 1e-2  # one propagating mode


@pytest.mark.slow
def test_thermoelectrics_resolution_autoscale():
    """A wide mu sweep must not under-resolve the kT-wide Fermi window:
    n_energies is a minimum and the grid is refined to dE <= kT/4
    (ADVICE r3).  A deliberately tiny n_energies therefore agrees with
    an explicitly fine grid."""
    ssh = ptt.models.ssh(t=1.0, delta=0.5)
    kt = 0.005
    mus = [-1.8, 1.5]  # window span ~3.4 >> 801 * kT/4
    coarse = negf.thermoelectrics(ssh, mus, kt, n_energies=11)
    fine = negf.thermoelectrics(ssh, mus, kt, n_energies=8001)
    np.testing.assert_allclose(coarse["G"], fine["G"], rtol=1e-3)
    np.testing.assert_allclose(coarse["S"], fine["S"],
                               rtol=1e-2, atol=1e-3)
    # the cap warns rather than silently exploding the batch
    with pytest.warns(UserWarning, match="capping at 50001"):
        negf.thermoelectrics(ssh, [-1.8, 1.5], 1e-5,
                             e_window=(-2.5, 2.5), n_energies=11)


def test_thermoelectrics_gap_nan_at_transport_eta():
    """Review r4 regression: the transport-gap NaN guard must also fire
    at realistic eta (the eta^2 leakage floor), not only at eta=1e-6."""
    ssh = ptt.models.ssh(t=1.0, delta=0.5)
    with pytest.warns(UserWarning, match="transport gap"):
        r = negf.thermoelectrics(ssh, 0.0, 0.01, eta=1e-4)
    assert np.isnan(r["S"]) and np.isnan(r["kappa_e"])
