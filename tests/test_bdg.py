"""BdG/Majorana oracle tier.

Anchors: the analytic Kitaev phase diagram (M = -1 iff |mu| < 2|t|),
the closed-form s-wave quasiparticle dispersion
``+-sqrt((eps_k - mu)^2 + |Delta|^2)``, the Pfaffian identity
``Pf(A)^2 = det(A)`` on random antisymmetric matrices, exponential
Majorana end-mode splitting, and the p+ip BdG Chern phase diagram --
computed through the UNMODIFIED electronic machinery
(``flows.chern_number`` / ``cut_piece`` / ``surface``), which is the
point of the Nambu-as-tb_model design.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, bdg, flows


def test_pfaffian_identity():
    rng = np.random.default_rng(3)
    for m in (2, 4, 8, 12):
        A = rng.normal(size=(m, m))
        A = A - A.T
        pf = bdg.pfaffian(A)
        assert abs(pf ** 2 - np.linalg.det(A)) < 1e-8 * max(
            1.0, abs(np.linalg.det(A))
        )
    # known closed form: Pf([[0, a], [-a, 0]]) = a
    assert abs(bdg.pfaffian(np.array([[0.0, 2.5], [-2.5, 0.0]])) - 2.5) < 1e-12
    with pytest.raises(PythtbError):
        bdg.pfaffian(np.zeros((3, 3)))
    with pytest.raises(PythtbError):
        bdg.pfaffian(np.eye(4))


def test_kitaev_phase_diagram():
    for mu, expect in ((0.0, -1), (1.9, -1), (-1.5, -1), (2.1, 1),
                       (4.0, 1), (-2.5, 1)):
        kc = bdg.kitaev_chain(t=1.0, delta=0.4, mu=mu)
        assert bdg.majorana_number(kc) == expect, mu
    # invariance under delta sign/scale
    assert bdg.majorana_number(bdg.kitaev_chain(1.0, -0.7, 0.5)) == -1


def test_majorana_end_modes():
    """Topological chains bind end Majoranas whose splitting decays
    exponentially with length; trivial chains keep the bulk gap."""
    kc = bdg.kitaev_chain(1.0, 0.4, 0.5)
    e = [np.min(np.abs(np.asarray(kc.cut_piece(L, 0).solve_all())))
         for L in (10, 20, 30)]
    assert e[1] < 0.05 * e[0] and e[2] < 0.05 * e[1]
    assert e[2] < 1e-4
    triv = bdg.kitaev_chain(1.0, 0.4, 3.0)
    e_triv = np.min(np.abs(np.asarray(triv.cut_piece(30, 0).solve_all())))
    assert e_triv > 0.3  # bulk-gapped


def test_swave_analytic_dispersion():
    """Singlet onsite pairing on a ring: +-sqrt((eps-mu)^2 + D^2)."""
    t, mu, D = 1.0, -0.6, 0.35
    ch = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    ch.set_hop(-t, 0, 0, [1])
    sw = bdg.bdg_model(ch, mu=mu, delta=[(D, 0, 0)], pairing="singlet")
    ks = np.linspace(0.0, 1.0, 17)[:, None]
    ev = np.asarray(sw.solve_all(ks))  # (2, nk)
    eps = -2 * t * np.cos(2 * np.pi * ks[:, 0])
    E = np.sqrt((eps - mu) ** 2 + D ** 2)
    np.testing.assert_allclose(ev[0], -E, atol=1e-10)
    np.testing.assert_allclose(ev[1], +E, atol=1e-10)


def test_kitaev_bulk_dispersion():
    """Triplet chain: E(k) = sqrt((2t cos k + mu)^2 + 4 D^2 sin^2 k)."""
    t, mu, D = 1.0, 0.7, 0.4
    kc = bdg.kitaev_chain(t, D, mu)
    ks = np.linspace(0.0, 1.0, 13)[:, None]
    ev = np.asarray(kc.solve_all(ks))
    th = 2 * np.pi * ks[:, 0]
    E = np.sqrt((2 * t * np.cos(th) + mu) ** 2
                + 4 * D * D * np.sin(th) ** 2)
    np.testing.assert_allclose(np.abs(ev[0]), E, atol=1e-10)


def test_pip_chern_phase_diagram():
    """p+ip on the square lattice: BdG Chern +-1 inside the band,
    0 outside; sign flips with mu across half filling."""
    sq = ptt.models.square(t=-1.0)
    pair = [(0.3, 0, 0, [1, 0]), (0.3j, 0, 0, [0, 1])]
    c_lo = flows.chern_number(
        bdg.bdg_model(sq, mu=-2.0, delta=pair), occ=[0], nk=(41, 41))
    c_hi = flows.chern_number(
        bdg.bdg_model(sq, mu=+2.0, delta=pair), occ=[0], nk=(41, 41))
    c_out = flows.chern_number(
        bdg.bdg_model(sq, mu=-5.0, delta=pair), occ=[0], nk=(41, 41))
    assert abs(abs(c_lo) - 1.0) < 1e-6
    assert abs(c_lo + c_hi) < 1e-6  # opposite signs
    assert abs(c_out) < 1e-6


def test_chiral_majorana_edge():
    """Composition: cut_piece of the topological p+ip BdG model hosts
    in-gap chiral edge modes crossing E = 0."""
    sq = ptt.models.square(t=-1.0)
    pip = bdg.bdg_model(sq, mu=-2.0,
                        delta=[(0.4, 0, 0, [1, 0]), (0.4j, 0, 0, [0, 1])])
    rib = pip.cut_piece(14, 1, glue_edgs=False)
    ks = np.linspace(0.0, 1.0, 41)[:, None]
    ev = np.asarray(rib.solve_all(ks))
    mins = np.min(np.abs(ev), axis=0)
    # bulk gap of the infinite system
    bulk = np.min(np.abs(np.asarray(pip.solve_all(
        np.stack([ks[:, 0], ks[:, 0] * 0 + 0.31], axis=-1)))))
    assert mins.min() < 0.05 * max(bulk, 0.1)  # edge mode crosses 0
    # PH symmetry of the ribbon spectrum
    np.testing.assert_allclose(np.sort(ev.reshape(-1)),
                               np.sort(-ev.reshape(-1)), atol=1e-9)


def test_ph_symmetry_and_guards():
    ch = ptt.tb_model(1, 1, [[1.0]], [[0.3]])  # fractional position
    ch.set_hop(-1.0, 0, 0, [1])
    kc = bdg.bdg_model(ch, mu=0.5, delta=[(0.4, 0, 0, [1])],
                       pairing="triplet")
    # Majorana number robust to orbital embedding (Convention-II gauge
    # inside the Pfaffian step)
    assert bdg.majorana_number(kc) == -1
    with pytest.raises(PythtbError):
        bdg.bdg_model(ch, delta=[(0.4, 0, 0)], pairing="triplet")  # onsite
    with pytest.raises(PythtbError):
        bdg.bdg_model(ch, delta=[(0.4, 0, 0, [1])], pairing="pwave")
    km = ptt.models.kane_mele()
    with pytest.raises(PythtbError):
        bdg.bdg_model(km, delta=[(0.1, 0, 0, [1, 0])])  # nspin == 2
    with pytest.raises(PythtbError):
        bdg.majorana_number(bdg.bdg_model(
            ptt.models.square(), mu=0.0,
            delta=[(0.1, 0, 0, [1, 0])]))  # dim_k != 1
    # gap closing at the transition raises (Pf = 0)
    with pytest.raises(PythtbError):
        bdg.majorana_number(bdg.kitaev_chain(1.0, 0.4, 2.0))


def test_meanfield_composition():
    """bcs_gap's converged uniform Delta fed into bdg_model gives a
    quasiparticle gap equal to the BCS coherence gap on the same
    grid (singlet reduction)."""
    from pythtb_tpu import meanfield

    sq = ptt.models.square(t=-1.0)
    r = meanfield.bcs_gap(sq, 2.0, -0.4, nk=(32, 32), temperature=0.01)
    D = float(np.abs(r["delta"][0]))
    assert D > 0.1
    sw = bdg.bdg_model(sq, mu=-0.4, delta=[(D, 0, 0)], pairing="singlet")
    ks = sq.k_uniform_mesh([32, 32])
    ev = np.asarray(sw.solve_all(ks))
    # min quasiparticle energy == Delta when mu crosses the band
    assert abs(np.min(np.abs(ev)) - D) < 5e-3
