"""Entanglement-spectrum oracles.

The crown jewel is the EXACT many-body oracle: for small free-fermion
systems the full Fock-space ground state is built explicitly (Slater
determinant amplitudes), the reduced density matrix of region A taken
by partial trace, and its spectrum compared against the Peschel
prediction {prod_i xi_i^{n_i} (1-xi_i)^{1-n_i}} from the one-body
correlation eigenvalues.  This validates the entire formalism, not
just an implementation detail.
"""

import itertools

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import entanglement
from pythtb_tpu.model import PythtbError


def _random_finite_chain(n, seed=0):
    rng = np.random.default_rng(seed)
    m = ptt.tb_model(0, 1, lat=[[1.0]], orb=[[i / n] for i in range(n)])
    m.set_onsite(rng.standard_normal(n) * 0.5)
    for i in range(n - 1):
        m.set_hop(rng.standard_normal() + 1j * rng.standard_normal(), i, i + 1)
    return m


def _exact_rdm_spectrum(model, nocc, sites):
    """Many-body oracle: build the Slater ground state in the full Fock
    space, partial-trace region B, return the RDM spectrum."""
    H = np.zeros((model._norb, model._norb), dtype=complex)
    for i, e in enumerate(np.asarray(model._site_energies, dtype=float)):
        H[i, i] = e
    for amp, i, j in [(h[0], h[1], h[2]) for h in model._hoppings]:
        H[i, j] += amp
        H[j, i] += np.conj(amp)
    w, v = np.linalg.eigh(H)
    U = v[:, :nocc]  # columns are occupied orbitals
    n = model._norb
    sites = list(sites)
    rest = [s for s in range(n) if s not in sites]
    # psi(occupation config) = det of U rows at the occupied sites
    amps = {}
    for occ_sites in itertools.combinations(range(n), nocc):
        a = np.linalg.det(U[list(occ_sites), :])
        # fermionic sign: row order ascending = canonical ordering
        amps[occ_sites] = a
    # group by (config on A, config on B)
    rho = {}
    for occ_sites, a in amps.items():
        cfg_a = tuple(s for s in sites if s in occ_sites)
        cfg_b = tuple(s for s in rest if s in occ_sites)
        # reorder sign: canonical ascending order -> (A sites, B sites)
        perm = sorted(range(len(occ_sites)),
                      key=lambda i: (occ_sites[i] not in sites,
                                     occ_sites[i]))
        sign = np.linalg.det(np.eye(len(perm))[perm])
        rho.setdefault(cfg_b, {})[cfg_a] = a * sign
    # rho_A = sum_b |psi_b><psi_b| over A configurations
    acfgs = sorted({ca for d in rho.values() for ca in d})
    idx = {c: i for i, c in enumerate(acfgs)}
    R = np.zeros((len(acfgs), len(acfgs)), dtype=complex)
    for d in rho.values():
        vec = np.zeros(len(acfgs), dtype=complex)
        for ca, a in d.items():
            vec[idx[ca]] = a
        R += np.outer(vec, np.conj(vec))
    return np.sort(np.linalg.eigvalsh(R))[::-1]


@pytest.mark.parametrize("n,nocc,sites", [(4, 2, [0, 1]), (5, 2, [1, 3]),
                                          (6, 3, [0, 2, 4])])
def test_peschel_vs_exact_fock_space(n, nocc, sites):
    m = _random_finite_chain(n, seed=n)
    xi = entanglement.correlation_spectrum(m, nocc, sites)
    # Peschel: RDM spectrum = all products of xi / (1 - xi)
    levels = [1.0]
    for x in xi:
        levels = [l * (1.0 - x) for l in levels] + [l * x for l in levels]
    pred = np.sort(np.array(levels))[::-1]
    exact = _exact_rdm_spectrum(m, nocc, sites)
    pe = np.zeros(max(len(pred), len(exact)))
    pe[: len(pred)] = pred[: len(pe)]
    ex = np.zeros_like(pe)
    ex[: len(exact)] = exact[: len(pe)]
    np.testing.assert_allclose(pe, ex, atol=1e-10)


def test_complementary_cut_mirror():
    """Pure state: nontrivial spectra of A and its complement mirror
    (xi_B = 1 - xi_A)."""
    m = _random_finite_chain(8, seed=3)
    A = [0, 1, 2]
    B = [s for s in range(8) if s not in A]
    xa = entanglement.correlation_spectrum(m, 4, A)
    xb = entanglement.correlation_spectrum(m, 4, B)
    nta = np.sort(xa[(xa > 1e-9) & (xa < 1 - 1e-9)])
    ntb = np.sort(1.0 - xb[(xb > 1e-9) & (xb < 1 - 1e-9)])
    np.testing.assert_allclose(nta, ntb, atol=1e-9)
    # entropies agree
    np.testing.assert_allclose(
        entanglement.entanglement_entropy(xa),
        entanglement.entanglement_entropy(xb), atol=1e-9,
    )


def test_atomic_limit_product_state():
    m = ptt.tb_model(0, 1, lat=[[1.0]], orb=[[0.0], [0.3], [0.7]])
    m.set_onsite([-1.0, 0.5, 2.0])
    xi = entanglement.correlation_spectrum(m, 1, [0, 1])
    np.testing.assert_allclose(np.sort(xi), [0.0, 1.0], atol=1e-12)
    assert entanglement.entanglement_entropy(xi) < 1e-10


def test_chern_flow_gapless_trivial_gapped():
    """Fidkowski: the virtual cut of a Chern insulator carries gapless
    spectral flow through xi = 1/2; a trivial insulator keeps an
    entanglement gap."""
    topo = ptt.models.haldane()  # C = -1
    kpar, xi_t = entanglement.entanglement_flow(topo, [0], 0, L=12, nk=31)
    min_mid = np.abs(xi_t - 0.5).min()
    assert min_mid < 0.02
    # trivial: large sublattice mass, no t2
    triv = ptt.models.graphene(delta=1.5)
    _, xi_0 = entanglement.entanglement_flow(triv, [0], 0, L=12, nk=31)
    assert np.abs(xi_0 - 0.5).min() > 0.2


def test_qsh_kramers_degeneracy():
    """Kane-Mele: at the TRIM transverse momenta the entanglement
    spectrum is Kramers-degenerate, and the QSH flow is mid-gap
    gapless."""
    m = ptt.models.kane_mele()
    kpar, xi = entanglement.entanglement_flow(m, [0, 1], 0, L=8, nk=21)
    for ik in (0, 10, 20):  # k = 0, 0.5, 1.0
        assert abs(kpar[ik] % 0.5) < 1e-12
        nt = xi[ik][(xi[ik] > 1e-6) & (xi[ik] < 1 - 1e-6)]
        pairs = nt.reshape(-1, 2)
        np.testing.assert_allclose(pairs[:, 0], pairs[:, 1], atol=1e-8)
    assert np.abs(xi - 0.5).min() < 0.02


def test_entanglement_errors():
    m = ptt.models.haldane()
    fin = m.cut_piece(3, 0).cut_piece(3, 1)
    with pytest.raises(PythtbError):
        entanglement.correlation_spectrum(m, 1, [0])
    with pytest.raises(PythtbError):
        entanglement.correlation_spectrum(fin, 0, [0])
    with pytest.raises(PythtbError):
        entanglement.correlation_spectrum(fin, 1, [0, 0])
    with pytest.raises(PythtbError):
        entanglement.entanglement_flow(ptt.models.chain(), [0], 0)
    with pytest.raises(PythtbError):
        entanglement.entanglement_flow(m, [0], 0, L=4, LA=4)
    with pytest.warns(UserWarning):
        entanglement.entanglement_flow(ptt.models.graphene(), [0], 0,
                                       L=6, nk=7)  # gapless filling
