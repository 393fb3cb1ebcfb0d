"""Oracle tier for the exciton / Bethe-Salpeter module.

Tiers (strongest first):

1. EXACT closure vs many-body ED: with a frozen (hop-free,
   unhybridized) valence band the one-pair sector closes under the
   full interacting Hamiltonian, so Tamm-Dancoff + one-shot diagonal
   HF is exact -- every one-pair ED excitation on the glued torus must
   match the union over exciton momenta Q of BSE eigenvalues at 1e-10.
   Offset orbital positions make this a sharp test of the
   Convention-II rephasing (a Convention-I W(q) table is wrong by
   e^{2 pi i G.(t_b - t_a)} phases under grid folding).
2. Exchange scaling: with k-independent orbital mixing (flat bands,
   X != 0) the BSE error vs ED is the neglected pair-number coupling,
   O(V^2/gap); dropping the exchange degrades it to O(V).  Pins the
   exchange term's presence, sign, and magnitude.
3. Analytic Frenkel limit (all-frozen): circulant exciton spectrum
   E = gap - V(separation), exact.
4. V = None differential limit: absorption == optical_conductivity
   (same grid/broadening) at machine precision -- pins dipoles,
   antiresonant poles, units, and the package's mirrored Hall frame.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import ed, exciton, optical
from pythtb_tpu.model import PythtbError


def chain_ab(D=8.0, tB=0.7, tA=0.0, g=0.0, pos=(0.1, 0.4)):
    m = ptt.tb_model(1, 1, [[1.0]], [[pos[0]], [pos[1]]])
    m.set_onsite([0.0, D])
    if tB != 0.0:
        m.set_hop(tB, 1, 1, [1])
    if tA != 0.0:
        m.set_hop(tA, 0, 0, [1])
    if g != 0.0:
        m.set_hop(g, 0, 1, [0])
    return m


def bn_model(delta=0.7, t=-1.0):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = ptt.tb_model(2, 2, lat, orb)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    return m


def ed_pair_excitations(model, L, inter, npair):
    fin = model.cut_piece(L, 0, glue_edgs=True)
    r = ed.solve(fin, nelec=L, interactions=inter)
    return np.sort(r.evals - r.evals[0])[1:npair + 1]


def bse_union(model, V, L, spin="spinless", qp="hf"):
    out = []
    for q in range(L):
        out.append(exciton.bse(model, V, occ=[0], nk=(L,), Q=[q / L],
                               spin=spin, qp=qp).energies)
    return np.sort(np.concatenate(out))


def test_frenkel_atomic_limit_analytic():
    """All-frozen limit: circulant spectrum E = D - V(rho), exact."""
    L, D, U0, U1 = 8, 5.0, 2.0, 0.7
    m = chain_ab(D=D, tB=0.0, pos=(0.0, 0.0))
    V = [(U0, 0, 1, (0,)), (U1, 0, 1, (1,)), (U1, 0, 1, (-1,))]
    res = exciton.bse(m, V, occ=[0], nk=(L,), qp="none")
    expect = np.sort([D - U0] + [D - U1] * 2 + [D] * (L - 3))
    np.testing.assert_allclose(res.energies, expect, atol=1e-12)


def test_ed_closure_exact_all_q():
    """Frozen-valence closure: 36 one-pair ED levels == union-over-Q
    BSE at 1e-10, with Hartree AND Fock shifts exercised (V_AA term)
    and offset orbital positions (rephasing phases)."""
    L, D, tB = 6, 8.0, 0.7
    U0, U1, VAA, VBB = 2.0, 0.8, 0.6, 0.5
    m = chain_ab(D=D, tB=tB)
    V = [(U0, 0, 1, (0,)), (U1, 0, 1, (1,)), (U1, 0, 1, (-1,)),
         (VAA, 0, 0, (1,)), (VBB, 1, 1, (1,))]
    inter = []
    for c in range(L):
        A, B = 2 * c, 2 * c + 1
        inter += [(U0, A, B),
                  (U1, A, 2 * ((c + 1) % L) + 1),
                  (U1, A, 2 * ((c - 1) % L) + 1),
                  (VAA, A, 2 * ((c + 1) % L)),
                  (VBB, B, 2 * ((c + 1) % L) + 1)]
    exc_ed = ed_pair_excitations(m, L, inter, L * L)
    exc_bse = bse_union(m, V, L)
    np.testing.assert_allclose(exc_bse, exc_ed, atol=1e-10)


def test_qp_none_misses_hf_shifts():
    """Negative control for the closure test: without the HF
    self-energy the same comparison must fail at O(V)."""
    L, D = 6, 8.0
    U0 = 2.0
    m = chain_ab(D=D, tB=0.7)
    V = [(U0, 0, 1, (0,))]
    inter = [(U0, 2 * c, 2 * c + 1) for c in range(L)]
    exc_ed = ed_pair_excitations(m, L, inter, L * L)
    exc_bse = bse_union(m, V, L, qp="none")
    assert np.max(np.abs(exc_bse - exc_ed)) > 0.1


def test_exchange_scaling_pins_x_term():
    """Flat bands + k-independent mixing: BSE-with-X error is
    O(V^2/gap) (ratio ~4 under V -> V/2); dropping X gives O(V)
    (ratio ~2) and a much larger error."""
    L, D, g = 6, 6.0, 1.5

    def errs(Vs):
        m = chain_ab(D=D, tB=0.0, g=g, pos=(0.0, 0.0))
        V = [(Vs, 0, 1, (0,)), (0.5 * Vs, 0, 1, (1,)),
             (0.5 * Vs, 0, 1, (-1,))]
        inter = []
        for c in range(L):
            A, B = 2 * c, 2 * c + 1
            inter += [(Vs, A, B),
                      (0.5 * Vs, A, 2 * ((c + 1) % L) + 1),
                      (0.5 * Vs, A, 2 * ((c - 1) % L) + 1)]
        exc_ed = ed_pair_excitations(m, L, inter, L * L)
        with_x = np.max(np.abs(bse_union(m, V, L, "spinless") - exc_ed))
        no_x = np.max(np.abs(bse_union(m, V, L, "triplet") - exc_ed))
        return with_x, no_x

    e1, e1n = errs(0.2)
    e2, e2n = errs(0.1)
    assert e1 / e2 > 3.3  # quadratic
    assert e1n / e2n < 2.6  # linear
    assert e1n > 10 * e1  # exchange matters at this coupling


def test_v_none_matches_optical_conductivity():
    """Independent-particle limit == optical.optical_conductivity on
    the same grid and broadening (full complex tensor)."""
    bn = bn_model()
    w = np.linspace(0.0, 5.0, 41)
    nk = (9, 9)
    sig_ip = optical.optical_conductivity(bn, w, occ=[0], nk=nk, eta=0.08)
    sig_bse = exciton.absorption(bn, None, w, occ=[0], nk=nk, eta=0.08,
                                 qp="none")
    np.testing.assert_allclose(sig_bse, sig_ip, atol=1e-12)


def test_spin_channel_operator_identity_and_unitarity():
    """The three spin channels differ only by the exchange factor:
    H_singlet - H_triplet == 2 (H_spinless - H_triplet) as operators
    (reconstructed from eigenpairs) -- pins the s_x = 0/1/2 wiring
    without sign assumptions (for inter-orbital contact terms W(0) is
    indefinite, so the naive 'singlet above triplet' rule does NOT
    hold).  Amplitude matrices are unitary."""
    bn = bn_model()
    V = [(1.2, 0, 1, (0, 0))]

    def ham(spin):
        r = exciton.bse(bn, V, occ=[0], nk=(6, 6), spin=spin)
        A = r.amplitudes
        np.testing.assert_allclose(A @ A.conj().T, np.eye(A.shape[0]),
                                   atol=1e-10)
        # package row-eigenvector convention: H = (A.T * E) @ conj(A)
        return (A.T * r.energies) @ A.conj()

    hs, ht, hl = ham("singlet"), ham("triplet"), ham("spinless")
    np.testing.assert_allclose(hs - ht, 2.0 * (hl - ht), atol=1e-10)
    assert np.max(np.abs(hl - ht)) > 1e-3  # exchange actually nonzero


def test_binding_grows_with_coupling_and_localizes():
    """Repulsive density-density V binds the exciton below the QP gap;
    stronger coupling binds deeper and localizes the e-h envelope."""
    bn = bn_model()
    nk = (12, 12)
    kpts = np.stack(np.meshgrid(np.arange(12) / 12.0,
                                np.arange(12) / 12.0,
                                indexing="ij"), axis=-1).reshape(-1, 2)
    ev = bn.solve_all(kpts)
    gap = float(np.min(ev[1] - ev[0]))

    def run(scale):
        Vc = exciton.radial_interaction(
            bn, lambda r: scale / (r + 0.6), 2.5)
        return exciton.bse(bn, Vc, occ=[0], nk=nk, qp="none")

    r1, r2 = run(0.8), run(1.6)
    b1 = gap - r1.energies[0]
    b2 = gap - r2.energies[0]
    assert b1 > 0.01 and b2 > b1
    _, wR1 = r1.wavefunction(0)
    _, wR2 = r2.wavefunction(0)
    # inverse participation ratio rises as the envelope localizes
    assert np.sum(wR2 ** 2) > np.sum(wR1 ** 2)
    np.testing.assert_allclose(np.sum(wR1), 1.0, atol=1e-12)


def test_dispersion_time_reversal_symmetry():
    """Real-hopping model: exciton bands satisfy E(Q) == E(-Q)."""
    m = chain_ab(D=4.0, tB=0.6, tA=0.2, g=0.3)
    V = [(0.8, 0, 1, (0,)), (0.3, 0, 1, (1,)), (0.3, 0, 1, (-1,))]
    Ep = exciton.dispersion(m, V, [0], (8,), [[0.25]])
    Em = exciton.dispersion(m, V, [0], (8,), [[-0.25]])
    np.testing.assert_allclose(Ep, Em, atol=1e-10)


def test_radial_interaction_counts_and_symmetry():
    """Same-cell pairs once; mirrored cells excluded; values follow the
    radial law."""
    bn = bn_model()
    V = exciton.radial_interaction(bn, lambda r: 1.0 / r, 1.2)
    keys = [(a, b, R) for _, a, b, R in V]
    assert len(set(keys)) == len(keys)
    for val, a, b, R in V:
        assert (-np.asarray(R)).tolist() != list(R) or a < b or \
            any(x != 0 for x in R)
    # nearest-neighbour distance in this lattice is 1/sqrt(3)
    dmin = 1.0 / np.sqrt(3.0)
    assert any(abs(val - 1.0 / dmin) < 1e-9 for val, *_ in V)


def test_oscillator_strengths_ip_limit():
    """At V = None, Omega_S |D_S|^2 equals the independent-particle
    |v_cv|^2 / de weights pairwise."""
    bn = bn_model()
    res = exciton.bse(bn, None, occ=[0], nk=(5, 5), qp="none")
    osc = res.oscillator_strengths(0)
    # every pair energy appears as an exciton energy
    np.testing.assert_allclose(np.sort(res.pair_energies),
                               res.energies, atol=1e-12)
    assert np.all(osc >= -1e-14)


def test_degenerate_doublet_oscillator_sum_invariant():
    """The lowest hBN exciton is a valley-degenerate doublet, so the
    per-state oscillator strength is eigh-basis-dependent; only the
    doublet SUM is physical.  Pins the invariant sum and asserts the
    degeneracy (any hardware/f32 pin must use the sum -- f0 alone was
    measured 7.7% off on the TPU with E0 exact)."""
    bn = bn_model(delta=0.9)
    V = exciton.radial_interaction(bn, lambda r: 1.6 / (r + 0.5), 3.0)
    res = exciton.bse(bn, V, occ=[0], nk=(12, 12), qp="none")
    assert abs(res.energies[0] - res.energies[1]) < 1e-9
    f = res.oscillator_strengths(0)
    np.testing.assert_allclose(res.energies[0], 1.15735978, atol=2e-6)
    np.testing.assert_allclose(f[0] + f[1], 5.663195, atol=2e-4)
    # invariance under an explicit rotation of the degenerate pair
    c, s = np.cos(0.3), np.sin(0.3)
    A = np.array(res.amplitudes[:2])
    res.amplitudes[0] = c * A[0] + s * A[1]
    res.amplitudes[1] = -s * A[0] + c * A[1]
    d = res._dipoles_from_amplitudes() if hasattr(
        res, "_dipoles_from_amplitudes") else None
    if d is None:
        # rotate the stored dipoles directly (same linear map)
        D = np.array(res.dipoles[:2])
        res.dipoles[0] = c * D[0] + s * D[1]
        res.dipoles[1] = -s * D[0] + c * D[1]
    f2 = res.oscillator_strengths(0)
    np.testing.assert_allclose(f2[0] + f2[1], f[0] + f[1], rtol=1e-10)


def test_validation_errors():
    bn = bn_model()
    with pytest.raises(PythtbError):
        exciton.bse(bn, [(1.0, 0, 0, (0, 0))], occ=[0], nk=(4, 4))
    with pytest.raises(PythtbError):
        exciton.bse(bn, [(1.0, 0, 5, (0, 0))], occ=[0], nk=(4, 4))
    with pytest.raises(PythtbError):
        exciton.bse(bn, [(1.0, 0, 1, (0,))], occ=[0], nk=(4, 4))
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0], nk=(4,))
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0, 0], nk=(4, 4))
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0], nk=(4, 4), vbands=[1])
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0], nk=(4, 4), cbands=[0])
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0], nk=(4, 4), spin="doublet")
    with pytest.raises(PythtbError):
        exciton.bse(bn, None, occ=[0], nk=(4, 4), qp="gw")
    with pytest.raises(PythtbError):
        exciton.absorption(bn, None, [0.1], occ=[0], nk=(4, 4),
                           Q=[0.1, 0.0])
    with pytest.raises(PythtbError):
        exciton.radial_interaction(bn, lambda r: 1.0, -1.0)
