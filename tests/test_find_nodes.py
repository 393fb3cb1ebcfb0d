"""BZ node finder (flows.find_nodes): gap-scan + Hellmann-Feynman
refinement against analytically known band-touching locations.

No reference counterpart (the reference locates crossings by eye from
band plots, /root/reference/pythtb.py has no search utility); oracles
here are exact analytic node positions.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import flows, models


def _graphene(t=-1.0, delta=0.0):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = ptt.tb_model(2, 2, lat, orb)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    return m


def _min_image(a, b):
    d = np.asarray(a) - np.asarray(b)
    d -= np.round(d)
    return np.linalg.norm(d)


def test_graphene_dirac_points():
    """Pristine graphene: exactly the two Dirac points K=(1/3, 2/3) and
    K'=(2/3, 1/3), located to refinement precision."""
    m = _graphene()
    kpts, gaps = flows.find_nodes(m, band=0, nk=18, gap_tol=1e-4)
    assert kpts.shape == (2, 2)
    assert np.all(gaps < 1e-4)
    targets = [np.array([1.0 / 3.0, 2.0 / 3.0]),
               np.array([2.0 / 3.0, 1.0 / 3.0])]
    found = sorted(_min_image(k, t) for k in kpts for t in targets)
    # each node matches one target to ~1e-6 reduced coordinates
    assert found[0] < 2e-6 and found[1] < 2e-6


def test_gapped_graphene_empty():
    """A staggered onsite gap removes every node: empty result, correct
    shapes."""
    m = _graphene(delta=0.3)
    kpts, gaps = flows.find_nodes(m, band=0, nk=18, gap_tol=1e-4)
    assert kpts.shape == (0, 2)
    assert gaps.shape == (0,)


def test_return_energies_at_node():
    """Dirac-point energy of particle-hole-symmetric graphene is 0."""
    m = _graphene()
    kpts, gaps, ens = flows.find_nodes(m, band=0, nk=18, gap_tol=1e-4,
                                       return_energies=True)
    assert ens.shape == (2,)
    # the refined k sits ~1e-7 (reduced) from the exact node, so the
    # band energy carries v * |dk| ~ 1e-6 of residual
    np.testing.assert_allclose(ens, 0.0, atol=1e-5)


def test_weyl_nodes_3d():
    """The zoo Weyl model has two Weyl nodes on the k_z axis; both are
    found, at k_z symmetric about the node plane."""
    m = models.weyl()  # nodes at (0, 0, +-k0/2pi) = (0, 0, +-1/4)
    kpts, gaps = flows.find_nodes(m, band=0, nk=14, gap_tol=1e-4)
    assert kpts.shape[0] == 2
    assert np.all(gaps < 1e-4)
    targets = [np.array([0.0, 0.0, 0.25]), np.array([0.0, 0.0, 0.75])]
    found = sorted(_min_image(k, t) for k in kpts for t in targets)
    assert found[0] < 2e-6 and found[1] < 2e-6


def test_ssh_critical_crossing_1d():
    """SSH at the critical point t1 = t2 closes its gap at k = 1/2;
    off-critical it is gapped."""
    crit = models.ssh(delta=0.0)
    kpts, gaps = flows.find_nodes(crit, band=0, nk=16, gap_tol=1e-4)
    assert kpts.shape == (1, 1)
    assert _min_image(kpts[0], [0.5]) < 1e-6
    gapped = models.ssh(delta=0.25)
    kpts2, _ = flows.find_nodes(gapped, band=0, nk=16, gap_tol=1e-4)
    assert kpts2.shape == (0, 1)


def test_band_argument_validation():
    m = _graphene()
    with pytest.raises(Exception):
        flows.find_nodes(m, band=5)
    with pytest.raises(Exception):
        flows.find_nodes(m, nk=2)


def test_refinement_beats_grid_resolution():
    """The refined node is orders of magnitude closer to the true
    Dirac point than the best scan-grid point: the scan grid nk=18
    has spacing 0.056 and is incommensurate with 1/3."""
    m = _graphene()
    kpts, gaps = flows.find_nodes(m, band=0, nk=17, gap_tol=1e-3)
    assert kpts.shape[0] == 2
    best = min(_min_image(k, [1.0 / 3.0, 2.0 / 3.0]) for k in kpts)
    assert best < 1e-6
    # and the gap at the refined point reflects that accuracy
    assert np.min(gaps) < 1e-5


def test_weyl_chirality_signs_vs_slice_chern():
    """Gauss-law sign oracle: the cube charge of each Weyl node equals
    the package's own slice-Chern difference across it.  For the zoo
    model the kz ~ 1/2 slices carry C = -1 and the outer slices 0, so
    chi(0,0,1/4) = -1 and chi(0,0,3/4) = +1; the pair sums to zero."""
    m = models.weyl()
    chi_lo = flows.node_chirality(m, [0.0, 0.0, 0.25], band=0)
    chi_hi = flows.node_chirality(m, [0.0, 0.0, 0.75], band=0)
    def slice_chern(kz):
        return flows.chern_number(m.reduce_dim(2, kz), occ=[0],
                                  nk=(21, 21))
    c_below = slice_chern(0.15)
    c_mid = slice_chern(0.5)
    c_above = slice_chern(0.85)
    assert chi_lo == int(round(float(c_mid - c_below)))
    assert chi_hi == int(round(float(c_above - c_mid)))
    assert chi_lo == -1 and chi_hi == 1


def test_chirality_pipeline_with_find_nodes():
    """find_nodes -> node_chirality composes: both charges, net zero."""
    m = models.weyl()
    kpts, _ = flows.find_nodes(m, band=0, nk=12, gap_tol=1e-4)
    chis = [flows.node_chirality(m, k, band=0) for k in kpts]
    assert sorted(chis) == [-1, 1]


def test_chirality_surface_clip_warns():
    """A cube so large it clips the partner node must warn."""
    m = models.weyl()
    with pytest.warns(UserWarning):
        flows.node_chirality(m, [0.0, 0.0, 0.25], band=0, radius=0.5)


def test_chirality_requires_3d():
    with pytest.raises(Exception):
        flows.node_chirality(_graphene(), [1.0 / 3.0, 2.0 / 3.0], band=0)
