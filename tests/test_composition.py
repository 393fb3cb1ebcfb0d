"""Cross-feature composition: the round-2 subsystems are plain model /
hop-table transforms, so they must compose freely.  Each test pairs two
subsystems and validates against an independent route."""

import numpy as np
import pytest

from pythtb_tpu import flows, magnetic, surface, wannier, wf_array
from pythtb_tpu.models import library as zoo


def test_magnetic_surface_hofstadter_edge():
    """Semi-infinite Hofstadter edge: magnetic supercell -> Sancho-Rubio,
    validated against a deep finite ribbon built independently."""
    msc = magnetic.magnetic_supercell(zoo.square(), 1, 4)  # flux 1/4
    kpar = np.array([[0.1], [0.35], [0.7]])
    energies = np.array([-2.2, -1.0, 0.0, 1.5])
    eta = 0.08
    A = surface.spectral_function(msc, 1, k_par=kpar, energies=energies, eta=eta)
    # oracle: 120-layer ribbon, trace over the outermost layer
    slab = msc.cut_piece(120, 1, glue_edgs=False)
    S = msc.get_num_orbitals()
    ref = np.zeros_like(A)
    for jk, k in enumerate(kpar):
        H = np.asarray(slab.gen_ham([list(k)]))[0].reshape(slab._nsta, slab._nsta)
        for je, e in enumerate(energies):
            G = np.linalg.inv((e + 1j * eta) * np.eye(slab._nsta) - H)
            ref[je, jk] = -np.imag(np.trace(G[:S, :S])) / np.pi
    np.testing.assert_allclose(A, ref, atol=2e-4, rtol=1e-3)
    # in-gap edge states exist somewhere (chiral Hofstadter edges)
    ev = msc.solve_all(msc.k_uniform_mesh([15, 15]))
    gap_mid = 0.5 * (ev[0].max() + ev[1].min())
    kscan = np.linspace(0, 1, 41)[:, None]
    As, Ab = surface.spectral_function(
        msc, 1, k_par=kscan, energies=np.array([gap_mid]), eta=0.03,
        return_bulk=True)
    assert As.max() > 10 * Ab.max()


def test_magnetic_wannier_exact_recovery():
    """Full-space Wannier interpolation of a magnetic supercell (complex
    hops everywhere) is still exact."""
    msc = magnetic.magnetic_supercell(zoo.square(), 1, 3)
    itp = wannier.interpolator(msc, [0, 1, 2], nk=6, trial=np.eye(3))
    k = np.random.RandomState(0).rand(10, 2)
    np.testing.assert_allclose(itp.bands(k), msc.solve_all(k), atol=1e-10)
    assert itp.min_projection_sv > 0.99


def test_magnetic_wilson_flow_hofstadter_chern():
    """Fused Wilson flow on a magnetic supercell: the lowest-subband
    Wannier center winds once (Chern 1, TKNN)."""
    msc = magnetic.magnetic_supercell(zoo.square(), 1, 3)
    evph, _ = flows.wilson_flow(msc, [0], nk=(31, 31), start_k=(0.0, 0.0))
    winding = np.sum(np.diff(np.unwrap(evph[:, 0]))) / (2.0 * np.pi)
    assert abs(abs(winding) - 1.0) < 0.05


def test_checkpoint_family_pump_roundtrip(tmp_path):
    """Family-filled pump grid -> checkpoint -> reload -> same Chern."""
    lams = np.linspace(0.0, 1.0, 11)
    wf = wf_array(zoo.three_site_chain(0.0), [11, 13])
    wf.solve_on_grid_models([zoo.three_site_chain(l) for l in lams], param_dir=0)
    wf.impose_loop(0)
    c0 = wf.berry_flux([0], dirs=[0, 1]) / (2 * np.pi)
    p = str(tmp_path / "pump")
    wf.save(p)
    back = wf_array.load(p)
    c1 = back.berry_flux([0], dirs=[0, 1]) / (2 * np.pi)
    np.testing.assert_allclose(c1, c0, atol=1e-12)
    np.testing.assert_allclose(back.energies, wf.energies, atol=0)


def test_trimmed_ribbon_matvec_solvers():
    """Edge-trimmed cut + matrix-free solvers agree with dense."""
    flake = zoo.graphene().cut_piece(10, 0).cut_piece(
        10, 1, trim_first=[0], trim_last=[1]
    )
    H = np.asarray(flake.gen_ham()).reshape(flake._nsta, flake._nsta)
    dense = np.sort(np.linalg.eigvalsh(H))
    low = flows.solve_lowest(flake, 5, max_iters=400)
    np.testing.assert_allclose(low, dense[:5], atol=1e-7)
    e, d = flows.kpm_dos(flake, num_moments=128, num_vectors=8)
    assert abs(d.sum() * (e[1] - e[0]) - flake._nsta) / flake._nsta < 0.05


def test_smooth_gauge_then_wannier_consistency():
    """Gauge operations do not disturb downstream interpolation inputs:
    interpolated bands from a model equal direct solves regardless of
    any wf_array gauge work done on the same model object."""
    m = zoo.bn()
    wf = wf_array(m, [9, 9])
    wf.solve_on_grid([0.0, 0.0])
    wf.smooth_gauge([0], dir=0)
    itp = wannier.interpolator(m, [0, 1], nk=8, trial=np.eye(2))
    k = np.random.RandomState(1).rand(6, 2)
    np.testing.assert_allclose(itp.bands(k), m.solve_all(k), atol=1e-10)
