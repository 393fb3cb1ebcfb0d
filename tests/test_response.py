"""Response-function oracle tier.

The load-bearing oracle is exact diagonalization: on a finite ring
with ``nk = L`` the k-sum Lindhard bubble is ALGEBRAICALLY equal to
the many-body U = 0 susceptibility of the glued cluster (same
discrete k set), including every orbital-embedding phase.  Both the
spinless-basis and the explicit-spin (spin-flip hopping) paths are
pinned that way.  The RPA/Stoner layer is pinned against the
self-consistent Hartree-Fock onset on the same grid/temperature.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, ed, meanfield, response
from pythtb_tpu.parallel import mesh as pmesh


def _embedded_chain():
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
    m.set_onsite([0.3, -0.3])
    m.set_hop(-1.0, 0, 1, [0])
    m.set_hop(-0.7, 1, 0, [1])
    return m


def _ed_chi_matrix(ring, nelec, qred, positions, om, eta, nspin=2):
    """ED orbital-density susceptibility matrix on a glued ring.

    positions: list of (cell + orbital) positions per flat orbital
    index of ONE cell; modes are ``nspin*(cell*norb + o) + s``.
    """
    norb = len(positions)
    L = ring._norb // norb
    M = nspin * ring._norb
    chi = np.zeros((len(om), norb, norb), complex)
    for a in range(norb):
        for b in range(norb):
            Aop = np.zeros((M, M), complex)
            Bop = np.zeros((M, M), complex)
            for c in range(L):
                for s in range(nspin):
                    ia = nspin * (c * norb + a) + s
                    ib = nspin * (c * norb + b) + s
                    Aop[ia, ia] = np.exp(
                        -2j * np.pi * qred * (c + positions[a])
                    )
                    Bop[ib, ib] = np.exp(
                        +2j * np.pi * qred * (c + positions[b])
                    )
            chi[:, a, b] = ed.dynamic_susceptibility(
                ring, nelec, Aop, Bop, om, U=0.0, eta=eta,
                spinful=(nspin == 2)
            )
    return chi


def test_lindhard_vs_ed_embedded_orbitals():
    """Spinless-basis path incl. orbital-embedding phases: lindhard ==
    -ED/(2L) on the matching L-ring (2 = both ED spin species)."""
    L = 3
    m = _embedded_chain()
    ring = m.cut_piece(L, 0, glue_edgs=True)
    om = np.array([-0.8, 0.0, 0.7, 2.1])
    eta = 0.07
    for qi in (0, 1):
        qred = qi / L
        chi_l = response.lindhard(m, [[qred]], om, nk=L, nocc=1, eta=eta)[0]
        chi_e = _ed_chi_matrix(ring, 2 * L, qred, [0.0, 0.5], om, eta)
        np.testing.assert_allclose(chi_l, -chi_e / (2 * L), atol=1e-10)


def test_lindhard_vs_ed_spinflip():
    """Explicit-spin path with spin-flip (Rashba-like) hopping: the
    orbital-density chi0 (spin summed inside) == -ED/L."""
    L = 3
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0]], nspin=2)
    # large sz splitting keeps the lowest band separated on the grid;
    # sx/sy hop components make Sz non-conserved (spin-flip hopping)
    m.set_onsite([[0.1, 0.0, 0.0, 1.5]])
    m.set_hop([-0.4, 0.1, 0.08, 0.0], 0, 0, [1])
    ring = m.cut_piece(L, 0, glue_edgs=True)
    om = np.array([-0.5, 0.0, 1.2])
    eta = 0.09
    nelec = L  # lowest spin-split band filled
    # ED operators: both spin components of the single orbital
    chi_e = _ed_chi_matrix(ring, nelec, 1 / L, [0.0], om, eta)
    chi_l = response.lindhard(m, [[1 / L]], om, nk=L, nocc=1, eta=eta)[0]
    np.testing.assert_allclose(chi_l, -chi_e / L, atol=1e-10)


def test_sz_operator_weights_vs_ed():
    """Custom ops= weights: S^z-S^z susceptibility of the spin-flip
    ring against the ED correlator of the same operator."""
    L = 3
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0]], nspin=2)
    m.set_onsite([[0.0, 0.0, 0.0, 1.4]])
    m.set_hop([-0.4, 0.12, 0.0, 0.05], 0, 0, [1])
    ring = m.cut_piece(L, 0, glue_edgs=True)
    om = np.array([0.0, 0.8])
    eta = 0.08
    qred = 1 / L
    wts = np.array([[0.5, -0.5]])  # S^z of the single orbital
    chi_l = response.lindhard(m, [[qred]], om, nk=L, nocc=1, eta=eta,
                              ops=wts)[0][:, 0, 0]
    M = 2 * L
    Aop = np.zeros((M, M), complex)
    Bop = np.zeros((M, M), complex)
    for c in range(L):
        for s, w in ((0, 0.5), (1, -0.5)):
            Aop[2 * c + s, 2 * c + s] = w * np.exp(-2j * np.pi * qred * c)
            Bop[2 * c + s, 2 * c + s] = w * np.exp(+2j * np.pi * qred * c)
    chi_e = ed.dynamic_susceptibility(ring, L, Aop, Bop, om, U=0.0, eta=eta)
    np.testing.assert_allclose(chi_l, -chi_e / L, atol=1e-10)


def test_mu_mode_matches_nocc_mode_insulator():
    m = _embedded_chain()
    om = np.array([0.0, 1.1])
    c1 = response.lindhard(m, [[0.25]], om, nk=6, nocc=1, eta=0.05)
    # mu anywhere in the gap at tiny temperature
    ev = np.asarray(m.solve_all(m.k_uniform_mesh([6])))
    mu = 0.5 * (np.max(ev[0]) + np.min(ev[1]))
    c2 = response.lindhard(m, [[0.25]], om, nk=6, mu=mu,
                           temperature=1e-4, eta=0.05)
    np.testing.assert_allclose(c1, c2, atol=1e-8)


def test_causality_symmetry():
    """chi_ab(-omega) = conj(chi_ba(omega)) for Hermitian density
    operators, and Im chi_aa(omega > 0) >= 0 in the positive
    convention."""
    m = _embedded_chain()
    om = np.linspace(-3.0, 3.0, 13)
    chi = response.lindhard(m, [[1 / 3]], om, nk=6, nocc=1, eta=0.06)[0]
    rev = chi[::-1]
    np.testing.assert_allclose(
        rev, np.conj(np.swapaxes(chi, -1, -2)), atol=1e-12
    )
    pos = om > 0.1
    assert np.all(np.imag(chi[pos, 0, 0]) >= -1e-12)


def test_metallic_filling_warns():
    g = ptt.models.graphene()
    with pytest.warns(UserWarning, match="metallic"):
        response.lindhard(g, [[0.0, 0.0]], [0.0], nk=6, nocc=1, eta=0.05)


def test_stoner_matches_hf_onset():
    """RPA Stoner U_c == self-consistent HF symmetry-breaking onset on
    the same (Dirac-avoiding) grid and temperature; the critical
    vector is the staggered (AFM) combination."""
    g = ptt.models.graphene()
    st = response.stoner_analysis(g, [[0.0, 0.0]], nk=25, mu=0.0,
                                  temperature=2e-3)
    uc = st["U_c_min"]
    assert 2.1 < uc < 2.5
    v = st["vector"][0]
    assert abs(abs(v[0]) - abs(v[1])) < 1e-6
    assert abs(v[0] + v[1]) < 1e-6  # staggered
    lo, hi = uc - 0.1, uc + 0.12
    r_lo = meanfield.hartree_fock(g, lo, 2.0, nk=(25, 25),
                                  temperature=2e-3, stagger=0.3, seed=2,
                                  max_iters=20000, tol=1e-10)
    r_hi = meanfield.hartree_fock(g, hi, 2.0, nk=(25, 25),
                                  temperature=2e-3, stagger=0.3, seed=2,
                                  max_iters=20000, tol=1e-10)
    assert np.abs(r_lo["magnetization"]).max() < 1e-4
    assert np.abs(r_hi["magnetization"]).max() > 0.02


def test_rpa_channels():
    """Spin channel enhanced / charge channel suppressed, and the RPA
    resummation identity chi = chi0 + chi0 (-+U) chi holds."""
    m = _embedded_chain()
    om = np.array([0.0])
    U = 1.2
    chi_s, chi0 = response.rpa_susceptibility(
        m, [[0.2]], om, nk=8, U=U, channel="spin", nocc=1, eta=0.03
    )
    chi_c, _ = response.rpa_susceptibility(
        m, [[0.2]], om, nk=8, U=U, channel="charge", nocc=1, eta=0.03
    )
    s0 = np.linalg.eigvalsh(chi0[0, 0])[-1]
    ss = np.linalg.eigvalsh(0.5 * (chi_s + np.conj(
        np.swapaxes(chi_s, -1, -2)))[0, 0])[-1]
    sc = np.linalg.eigvalsh(0.5 * (chi_c + np.conj(
        np.swapaxes(chi_c, -1, -2)))[0, 0])[-1]
    assert ss > s0 > sc
    # Dyson identity per channel
    Um = U * np.eye(2)
    np.testing.assert_allclose(
        chi_s[0, 0], chi0[0, 0] + chi0[0, 0] @ Um @ chi_s[0, 0], atol=1e-10
    )
    np.testing.assert_allclose(
        chi_c[0, 0], chi0[0, 0] - chi0[0, 0] @ Um @ chi_c[0, 0], atol=1e-10
    )


def test_lindhard_mesh_sharded():
    m = _embedded_chain()
    om = np.array([0.0, 0.9])
    qs = [[i / 8] for i in range(8)]
    base = response.lindhard(m, qs, om, nk=6, nocc=1, eta=0.05)
    with pmesh.use_mesh(pmesh.auto_mesh()):
        shard = response.lindhard(m, qs, om, nk=6, nocc=1, eta=0.05)
    np.testing.assert_allclose(base, shard, atol=1e-12)


def test_guards():
    m = _embedded_chain()
    with pytest.raises(PythtbError):
        response.lindhard(m, [[0.1]], [0.0], nk=4)  # no occupation mode
    with pytest.raises(PythtbError):
        response.lindhard(m, [[0.1]], [0.0], nk=4, nocc=1, mu=0.0,
                          temperature=0.1)
    with pytest.raises(PythtbError):
        response.lindhard(m, [[0.1]], [0.0], nk=4, mu=0.0)  # no temperature
    with pytest.raises(PythtbError):
        response.lindhard(m, [[0.1, 0.2]], [0.0], nk=4, nocc=1)  # bad q dim
    fin = m.cut_piece(3, 0)
    with pytest.raises(PythtbError):
        response.lindhard(fin, [[0.1]], [0.0], nk=4, nocc=1)
    km = ptt.models.kane_mele()
    with pytest.raises(PythtbError):
        response.rpa_susceptibility(km, [[0.0, 0.0]], [0.0], 4, 1.0,
                                    nocc=2)
