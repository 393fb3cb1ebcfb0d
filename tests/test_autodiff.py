"""Differentiability of the compute path (TPU/JAX-native capability).

The reference is pure NumPy and cannot differentiate; here gradients of
band energies w.r.t. model parameters flow through Hamiltonian assembly
and the eigensolver.  Checked against finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import flows

from . import zoo


def test_gap_gradient_matches_finite_difference():
    m = zoo.haldane(ptt)
    fn, p0 = flows.energy_fn(m)
    kpts = m.k_uniform_mesh([6, 6])

    def direct_gap(p):
        ev = fn(p, kpts)
        return jnp.min(ev[:, 1] - ev[:, 0])

    g = jax.grad(direct_gap)(p0)
    # perturb one hopping amplitude's real part
    h = 1e-6
    for idx in [(0, 0), (3, 0), (5, 1)]:
        amps_p = np.array(p0["amps"]); amps_p[idx] += h
        amps_m = np.array(p0["amps"]); amps_m[idx] -= h
        fd = (
            direct_gap({**p0, "amps": jnp.asarray(amps_p)})
            - direct_gap({**p0, "amps": jnp.asarray(amps_m)})
        ) / (2 * h)
        np.testing.assert_allclose(np.array(g["amps"])[idx], fd, rtol=1e-5, atol=1e-7)


def test_onsite_gradient():
    m = zoo.checkerboard(ptt)
    fn, p0 = flows.energy_fn(m)
    kpts = np.array([[0.21, 0.37]])

    def e0(p):
        return fn(p, kpts)[0, 0]

    g = jax.grad(e0)(p0)
    # diagonal element (0,0) real part: finite difference
    h = 1e-6
    diag_p = np.array(p0["diag"]); diag_p[0, 0, 0] += h
    diag_m = np.array(p0["diag"]); diag_m[0, 0, 0] -= h
    fd = (
        e0({**p0, "diag": jnp.asarray(diag_p)})
        - e0({**p0, "diag": jnp.asarray(diag_m)})
    ) / (2 * h)
    np.testing.assert_allclose(np.array(g["diag"])[0, 0, 0], fd, rtol=1e-5, atol=1e-7)


def test_fit_hopping_by_gradient_descent():
    """Recover a hopping amplitude from target bands by gradient descent
    -- the canonical use case autodiff unlocks."""
    target_t = -1.3
    m_target = zoo.graphene(ptt, delta=0.0, t=target_t)
    kpts = m_target.k_uniform_mesh([5, 5])
    target = m_target.solve_all(kpts).T  # (B, nsta)

    m0 = zoo.graphene(ptt, delta=0.0, t=-1.0)
    fn, p = flows.energy_fn(m0)
    target_j = jnp.asarray(target)

    @jax.jit
    def loss(p):
        return jnp.mean((fn(p, kpts) - target_j) ** 2)

    gradf = jax.jit(jax.grad(loss))
    for _ in range(200):
        g = gradf(p)
        p = {**p, "amps": p["amps"] - 0.5 * g["amps"]}
    fitted = np.array(p["amps"])[:, 0]  # real parts of the 3 hops
    np.testing.assert_allclose(fitted, target_t, atol=1e-3)


def test_density_of_states():
    """Device DOS: integrates to the number of states, vanishes in the
    gap, matches a NumPy-broadening reference."""
    m = zoo.haldane(ptt)
    e, dos = flows.density_of_states(m, (24, 24), sigma=0.08, n_energies=301)
    # integral = total states per cell (2 bands)
    integral = np.trapezoid(dos, e)
    np.testing.assert_allclose(integral, 2.0, rtol=2e-2)
    # gapped region around E=0 (Haldane gap ~1.16)
    assert dos[np.abs(e) < 0.3].max() < 1e-3
    # against direct NumPy broadening of the same eigenvalues
    evals = m.solve_all(m.k_uniform_mesh([24, 24])).reshape(-1)
    ref = np.exp(-0.5 * ((e[:, None] - evals[None, :]) / 0.08) ** 2).sum(1)
    ref /= 0.08 * np.sqrt(2 * np.pi) * (24 * 24)
    np.testing.assert_allclose(dos, ref, atol=1e-8)


def test_chern_fn_matches_chern_number():
    m = zoo.haldane(ptt)
    fn, p0 = flows.chern_fn(m, [0], nk=(15, 15))
    c = float(fn(p0))
    np.testing.assert_allclose(
        c, flows.chern_number(m, [0], nk=(15, 15)), atol=1e-10
    )


def test_chern_fn_vmap_phase_diagram():
    """The Haldane phase diagram over a parameter sweep in one vmapped
    call: C = sign(phi) for |sin(phi)| large vs delta, C = 0 when the
    staggered mass dominates."""
    import jax

    base = zoo.haldane(ptt)  # establishes the hopping graph
    fn, p0 = flows.chern_fn(base, [0], nk=(13, 13))

    # parameter sweep: vary t2 phase and the staggered onsite delta
    phis = [np.pi / 2, -np.pi / 2, np.pi / 2]
    deltas = [0.2, 0.2, 1.5]  # third point: trivial (delta > 3*sqrt(3)*t2)
    amps_list, diag_list = [], []
    for phi, delta in zip(phis, deltas):
        m = zoo.haldane(ptt, delta=delta, phi=phi)
        _, d = m._get_finalized()
        amps_list.append(np.array(d.amps))
        diag_list.append(np.array(d.diag))
    params = {
        "amps": np.stack(amps_list),
        "diag": np.stack(diag_list),
    }
    cherns = jax.vmap(lambda a, dg: fn({"amps": a, "diag": dg}))(
        params["amps"], params["diag"]
    )
    np.testing.assert_allclose(np.asarray(cherns), [-1.0, 1.0, 0.0], atol=1e-6)


def test_band_velocities_1d_chain_analytic():
    """1-D chain: E(k) = 2 t cos(2 pi k) -> dE/dk = -4 pi t sin(2 pi k)."""
    t = -1.0
    m = ptt.tb_model(1, 1, [[1.0]], [[0.0]])
    m.set_hop(t, 0, 0, [1])
    k = np.linspace(0.05, 0.95, 13)[:, None]
    vels, evals = flows.band_velocities(m, k)
    np.testing.assert_allclose(evals[0], 2 * t * np.cos(2 * np.pi * k[:, 0]), atol=1e-12)
    np.testing.assert_allclose(
        vels[0, :, 0], -4 * np.pi * t * np.sin(2 * np.pi * k[:, 0]), atol=1e-10
    )


def test_band_velocities_vs_finite_difference():
    m = zoo.haldane(ptt)
    k0 = np.array([[0.13, 0.29]])
    vels, _ = flows.band_velocities(m, k0)
    h = 1e-6
    for d in range(2):
        kp = k0.copy(); kp[0, d] += h
        km = k0.copy(); km[0, d] -= h
        fd = (m.solve_all(kp) - m.solve_all(km))[:, 0] / (2 * h)
        np.testing.assert_allclose(vels[:, 0, d], fd, rtol=1e-5, atol=1e-6)


def test_projected_dos_sums_to_dos():
    m = zoo.haldane(ptt)
    e1, dos = flows.density_of_states(m, (16, 16), sigma=0.1, n_energies=101,
                                      energies=(-4.0, 4.0))
    e2, pdos = flows.projected_dos(m, (16, 16), sigma=0.1, n_energies=101,
                                   energies=(-4.0, 4.0))
    np.testing.assert_array_equal(e1, e2)
    assert pdos.shape == (101, 2)
    np.testing.assert_allclose(pdos.sum(axis=1), dos, atol=1e-10)
    # staggered Haldane: low-energy weight sits on the low-onsite sublattice
    low = e1 < -1.0
    assert pdos[low, 0].sum() > pdos[low, 1].sum()


def test_projected_dos_spinful():
    m = zoo.kane_mele(ptt, "odd")
    e, pdos = flows.projected_dos(m, (8, 8), sigma=0.2, n_energies=61)
    assert pdos.shape == (61, 2)  # per orbital, spin summed
    np.testing.assert_allclose(np.trapezoid(pdos.sum(1), e), 4.0, rtol=5e-2)


def test_z2_invariant_kane_mele():
    """Device Z2 (gap-crossing criterion): 1 in the QSH phase, 0 in the
    trivial phase, stable across k-resolutions."""
    for nk in (25, 41):
        assert flows.z2_invariant(zoo.kane_mele(ptt, "odd"), (0, 1), nk=(nk, nk)) == 1.0
        assert flows.z2_invariant(zoo.kane_mele(ptt, "even"), (0, 1), nk=(nk, nk)) == 0.0


def test_z2_invariant_convergence_check():
    """check=True recomputes on a doubled grid: it warns and returns the
    refined value when the coarse grid mis-resolves the Wannier-gap flow
    (Kane-Mele QSH at nk=(9,9) wrongly gives 0), and stays quiet when
    the two grids agree."""
    import warnings

    import pytest

    m = zoo.kane_mele(ptt, "odd")
    # coarse grid gets it wrong on its own...
    assert flows.z2_invariant(m, (0, 1), nk=(9, 9)) == 0.0
    # ...check=True catches the disagreement and returns the refined value
    with pytest.warns(UserWarning, match="under-resolves"):
        assert flows.z2_invariant(m, (0, 1), nk=(9, 9), check=True) == 1.0
    # converged grid: no warning, same value
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert flows.z2_invariant(m, (0, 1), nk=(21, 21), check=True) == 1.0


def test_z2_degenerate_flow_self_diagnosis():
    """The gap-counting method is structurally defeated by a flow whose
    centers stay exactly pairwise degenerate (every gap-line crossing
    sweeps a pair -> parity stuck at 0, identically on both grids).
    check=True must return converged=0 there instead of a confident
    wrong answer, and must stay converged=1 on healthy flows (FKM
    planes, Kane-Mele)."""
    import jax

    # two identical decoupled spin copies of Haldane C=1: flow exactly
    # pairwise degenerate everywhere, naive parity count reads 0
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = ptt.tb_model(2, 2, lat, orb, nspin=2)
    delta, t, t2 = 0.2, -1.0, 0.15 * np.exp(1.0j * np.pi / 2.0)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2, 0, 0, lv)
        m.set_hop(np.conj(t2), 1, 1, lv)
    fn, p0 = flows.z2_fn(m, (0, 1), nk=(21, 21), check=True)
    _, conv = jax.device_get(jax.jit(fn)(p0))
    assert conv == 0.0
    # healthy flows keep converged=1 with the detector active
    plane = ptt.models.fu_kane_mele().reduce_dim(2, 0.5)
    fn, p0 = flows.z2_fn(plane, (0, 1), nk=(31, 31), check=True)
    z2, conv = jax.device_get(jax.jit(fn)(p0))
    assert (z2, conv) == (1.0, 1.0)


def test_z2_fn_vmappable():
    import jax

    base = zoo.kane_mele(ptt, "odd")
    fn, p0 = flows.z2_fn(base, (0, 1), nk=(21, 21))
    amps, diags = [], []
    for topo in ("odd", "even", "odd"):
        m = zoo.kane_mele(ptt, topo)
        _, d = m._get_finalized()
        amps.append(np.array(d.amps))
        diags.append(np.array(d.diag))
    zs = jax.vmap(lambda a, g: fn({"amps": a, "diag": g}))(
        np.stack(amps), np.stack(diags)
    )
    np.testing.assert_array_equal(np.asarray(zs), [1.0, 0.0, 1.0])


def test_z2_branch_cut_robustness():
    """Z2 must be invariant under rigid orbital shifts, which move every
    Wannier center around the circle (incl. across the +-pi branch cut
    where the largest-gap placement once failed)."""
    import pythtb_tpu as ptt

    def km(esite, shift):
        lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
        orb = [[1 / 3.0 + shift, 1 / 3.0], [2 / 3.0 + shift, 2 / 3.0]]
        m = ptt.tb_model(2, 2, lat, orb, nspin=2)
        sx = np.array([0.0, 1.0, 0.0, 0.0])
        sy = np.array([0.0, 0.0, 1.0, 0.0])
        sz = np.array([0.0, 0.0, 0.0, 1.0])
        m.set_onsite([esite, -esite])
        for lv in ([0, 0], [0, -1], [-1, 0]):
            m.set_hop(1.0, 0, 1, lv)
        so = 0.3
        m.set_hop(-1j * so * sz, 0, 0, [0, 1])
        m.set_hop(1j * so * sz, 0, 0, [1, 0])
        m.set_hop(-1j * so * sz, 0, 0, [1, -1])
        m.set_hop(1j * so * sz, 1, 1, [0, 1])
        m.set_hop(-1j * so * sz, 1, 1, [1, 0])
        m.set_hop(1j * so * sz, 1, 1, [1, -1])
        r3h = np.sqrt(3) / 2
        ra = 0.25
        m.set_hop(1j * ra * (0.5 * sx - r3h * sy), 0, 1, [0, 0], mode="add")
        m.set_hop(1j * ra * (-1.0 * sx), 0, 1, [0, -1], mode="add")
        m.set_hop(1j * ra * (0.5 * sx + r3h * sy), 0, 1, [-1, 0], mode="add")
        return m

    for shift in (0.0, 0.35, 0.63):
        assert flows.z2_invariant(km(1.0, shift), (0, 1), nk=(31, 31)) == 1.0
        assert flows.z2_invariant(km(2.5, shift), (0, 1), nk=(31, 31)) == 0.0
