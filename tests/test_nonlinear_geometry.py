"""Injection current and Berry-curvature dipole oracles.

- the analytic per-band curvature used by berry_dipole is pinned
  against the package's plaquette Chern number (sign + normalization);
- injection current: exact (b, c) antisymmetry, TRS -> 0, broadening
  independence of the frequency integral, spin doubling;
- dipole: inversion -> 0, mirror kills the in-mirror component, a
  tilted Dirac model gives a nonzero dipole that flips with the tilt.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pythtb_tpu as ptt
from pythtb_tpu import flows, optical
from pythtb_tpu.model import PythtbError


def tilted_bn(t2=0.4, delta=0.7):
    """BN plus a REAL second-neighbor hop along a single direction:
    breaks C3 (tilts the Dirac-like cones) but keeps time reversal and
    the mirror that maps the two tilted valleys onto each other --
    the minimal Berry-dipole (nonlinear Hall) testbed."""
    m = ptt.models.bn(delta=delta)
    m.set_hop(t2, 0, 0, [1, 0])
    m.set_hop(t2, 1, 1, [1, 0])
    return m


# ---------------------------------------------------------------------------
# the shared analytic curvature
# ---------------------------------------------------------------------------


def test_analytic_curvature_matches_package_chern():
    """Omega_n = -2 Im sum_m v^x v^y / D^2 with the (1 / N V_c)
    measure integrates to the package (plaquette-convention) Chern
    number -- sign and normalization pinned against the independent
    link-determinant engine."""
    m = ptt.models.haldane()
    static, data = m._get_finalized()
    lat = np.asarray(m._lat)
    evals, _vecs, V, _ = optical._band_tensors(
        static, data, (61, 61), jnp.asarray(lat), need_d2=False
    )
    D = np.asarray(evals)[:, :, None] - np.asarray(evals)[:, None, :]
    Vn = np.asarray(V)
    inv2 = np.where(np.abs(D) > 1e-7, 1.0 / np.where(np.abs(D) > 1e-7, D * D, 1.0), 0.0)
    om = -2.0 * np.imag(np.einsum("bnm,bnm,bnm->bn", Vn[:, 0],
                                  np.conj(Vn[:, 1]), inv2))
    c_analytic = om[:, 0].sum() * (2.0 * np.pi) / (
        61 * 61 * abs(np.linalg.det(lat))
    )
    c_package = flows.chern_number(m, [0], nk=(61, 61))
    np.testing.assert_allclose(c_analytic, c_package, atol=1e-6)


# ---------------------------------------------------------------------------
# injection current
# ---------------------------------------------------------------------------


def test_injection_antisymmetry_and_trs():
    w = np.linspace(0.5, 5.0, 41)
    # TRS (BN): every component vanishes
    eta_trs = optical.injection_current(ptt.models.bn(), w, occ=[0],
                                        nk=(61, 61), sigma=0.1)
    assert np.abs(eta_trs).max() < 1e-10
    # unstrained Haldane: TRS broken but C3 intact -- the injection
    # tensor is a 2-D VECTOR times epsilon_{bc}, and C3 kills vectors
    eta_c3 = optical.injection_current(ptt.models.haldane(), w, occ=[0],
                                       nk=(61, 61), sigma=0.1)
    assert np.abs(eta_c3).max() < 1e-10
    # one strained bond breaks C3: nonzero, exactly (b, c)-antisymmetric
    h = ptt.models.haldane()
    h.set_hop(-1.35, 0, 1, [0, 0], mode="reset")
    eta = optical.injection_current(h, w, occ=[0], nk=(61, 61), sigma=0.1)
    assert np.abs(eta).max() > 1e-3
    np.testing.assert_allclose(eta, -np.swapaxes(eta, 1, 2), atol=1e-12)


def test_injection_integral_broadening_independent():
    """int eta(w) dw is a pure k-space weight sum -- it must not
    depend on the delta broadening."""
    hs = ptt.models.haldane()
    hs.set_hop(-1.35, 0, 1, [0, 0], mode="reset")
    w = np.linspace(0.0, 8.0, 401)
    dw = w[1] - w[0]
    i1 = optical.injection_current(hs, w, occ=[0], nk=(41, 41),
                                   sigma=0.08)[0, 0, 1].sum() * dw
    i2 = optical.injection_current(hs, w, occ=[0], nk=(41, 41),
                                   sigma=0.2)[0, 0, 1].sum() * dw
    np.testing.assert_allclose(i1, i2, rtol=1e-4)


def test_injection_spin_doubling():
    w = np.linspace(1.0, 5.0, 21)
    h0 = ptt.models.haldane()
    h0.set_hop(-1.35, 0, 1, [0, 0], mode="reset")
    e1 = optical.injection_current(h0, w, occ=[0], nk=(31, 31), sigma=0.1)
    m2 = ptt.tb_model(2, 2, lat=np.asarray(ptt.models.haldane()._lat),
                      orb=np.asarray(ptt.models.haldane()._orb), nspin=2)
    m2.set_onsite([complex(e).real for e in h0._site_energies])
    for amp, i, j, R in h0._hoppings:
        m2.set_hop(complex(amp), i, j, list(np.asarray(R, dtype=int)))
    e2 = optical.injection_current(m2, w, occ=[0, 1], nk=(31, 31),
                                   sigma=0.1)
    np.testing.assert_allclose(e2, 2.0 * e1, atol=1e-9)


# ---------------------------------------------------------------------------
# Berry-curvature dipole
# ---------------------------------------------------------------------------


def test_dipole_symmetry_zeros():
    # inversion-symmetric metal: dipole vanishes at any mu
    g = ptt.models.graphene()
    d = flows.berry_dipole(g, np.array([-0.5, 0.2, 0.7]), 0.05,
                           nk=(61, 61))
    assert np.abs(d).max() < 1e-10
    # gapped TRS model with mu inside the gap: no Fermi surface
    # (weak tilt: t2 = 0.4 would push the valence top above mu = 0 and
    # close the INDIRECT gap -- the tilt term is 2 t2 cos(2 pi kx))
    d2 = flows.berry_dipole(tilted_bn(0.1), 0.0, 0.02, nk=(61, 61))
    assert np.abs(d2).max() < 1e-8


def _curvature_grid(model, nk):
    """Analytic per-band curvature and energies on a uniform grid."""
    static, data = model._get_finalized()
    lat = np.asarray(model._lat)
    evals, _vecs, V, _ = optical._band_tensors(
        static, data, nk, jnp.asarray(lat), need_d2=False
    )
    E = np.asarray(evals)
    Vn = np.asarray(V)
    D = E[:, :, None] - E[:, None, :]
    ok = np.abs(D) > 1e-7
    inv2 = np.where(ok, 1.0 / np.where(ok, D * D, 1.0), 0.0)
    om = -2.0 * np.imag(np.einsum("bnm,bnm,bnm->bn", Vn[:, 0],
                                  np.conj(Vn[:, 1]), inv2))
    return (E.reshape(nk + (-1,)), om.reshape(nk + (-1,)), lat)


def test_dipole_vs_curvature_gradient_oracle():
    """Independent differential oracle: D_a = int [dk] f dOmega/dk_a,
    with dOmega by central differences of the curvature grid, must
    match the Fermi-surface form int [dk] v_a Omega (-df/de) used by
    berry_dipole (they are integration-by-parts partners)."""
    m = tilted_bn(+0.4)
    mu, T = -1.05, 0.05
    nk = (151, 151)
    d_pkg = flows.berry_dipole(m, mu, T, nk=nk)
    assert np.abs(d_pkg).max() > 1e-4  # genuinely nonzero testbed
    E, om, lat = _curvature_grid(m, nk)
    f = 1.0 / (np.exp(np.clip((E - mu) / T, -80, 80)) + 1.0)
    # periodic central differences in reduced coordinates
    dom_red = np.stack([
        (np.roll(om, -1, axis=d) - np.roll(om, 1, axis=d)) * (nk[d] / 2.0)
        for d in range(2)
    ])  # (2, n0, n1, S)
    dom_cart = np.einsum("ra,rijs->aijs", lat / (2.0 * np.pi), dom_red)
    d_fd = np.einsum("ijs,aijs->a", f, dom_cart) / (
        nk[0] * nk[1] * abs(np.linalg.det(lat))
    )
    np.testing.assert_allclose(d_fd, d_pkg, rtol=2e-3, atol=1e-8)


def test_dipole_errors():
    with pytest.raises(ValueError):
        flows.berry_dipole(ptt.models.graphene(), 0.0, 0.0)
    with pytest.raises(ValueError):
        flows.berry_dipole(ptt.models.chain(), 0.0, 0.1)


# ---------------------------------------------------------------------------
# spin Hall conductivity
# ---------------------------------------------------------------------------


def test_spin_hall_conserved_sz_quantized():
    """With rashba = 0 Kane-Mele conserves s_z exactly: the Kubo spin
    Hall value is the integer C_up - C_dn = 2 * spin_chern."""
    m = ptt.models.kane_mele(esite=1.0, rashba=0.0)
    sh = flows.spin_hall_conductivity(m, [0, 1], nk=(61, 61))
    cs = flows.spin_chern(m, (0, 1), nk=(41, 41))["spin_chern"]
    np.testing.assert_allclose(sh, 2.0 * cs, atol=1e-4)
    assert abs(abs(sh) - 2.0) < 1e-4
    # trivial phase: zero
    t = ptt.models.kane_mele(esite=2.5, rashba=0.0)
    sh_t = flows.spin_hall_conductivity(t, [0, 1], nk=(61, 61))
    assert abs(sh_t) < 1e-4


def test_spin_hall_rashba_deviation():
    """Rashba breaks s_z conservation: the Kubo value deviates
    CONTINUOUSLY from quantization (grows with rashba), while the
    P.Sz.P spin Chern stays pinned -- the standard diagnostic pair."""
    devs = []
    for r in (0.0, 0.15, 0.3):
        m = ptt.models.kane_mele(esite=1.0, rashba=r)
        sh = flows.spin_hall_conductivity(m, [0, 1], nk=(61, 61))
        cs = flows.spin_chern(m, (0, 1), nk=(41, 41))["spin_chern"]
        assert abs(abs(cs) - 1.0) < 1e-3  # sector invariant stays pinned
        devs.append(abs(abs(sh) - 2.0))
    assert devs[0] < 1e-4 and devs[0] < devs[1] < devs[2]
    assert devs[2] < 0.5  # still recognizably near the QSH value


def test_spin_hall_errors():
    with pytest.raises(ValueError):
        flows.spin_hall_conductivity(ptt.models.haldane(), [0])
    with pytest.raises(ValueError):
        flows.spin_hall_conductivity(
            ptt.models.kane_mele().cut_piece(3, 0), [0, 1])
