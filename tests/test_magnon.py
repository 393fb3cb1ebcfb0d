"""LSWT oracle tier.

The load-bearing oracle: for a ferromagnetic ground state the fully
polarized product state is an exact eigenstate and the one-magnon
(``S^z_tot = N/2 - 1``) sector of the FULL spin Hamiltonian is exactly
the LSWT magnon spectrum.  We build the full Pauli-kron Hamiltonian of
small S = 1/2 clusters (independent machinery: no Holstein-Primakoff,
no local frames, no bosons), project onto the one-flip sector, and
compare every eigenvalue with the magnon bands at the cluster's
discrete k set -- including DM vectors and Zeeman fields.

Antiferromagnets (where LSWT is NOT exact and B(k) != 0) are pinned to
the analytic Bogoliubov chain dispersion, and the B = 0 topological
sector is pinned to the ELECTRONIC machinery: a collinear FM with
z-DM maps onto a tb_model with identical Bloch matrix, so magnon
bands/Chern numbers must match solve_all/flows.chern_number exactly.
"""

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import PythtbError, flows, magnon
from pythtb_tpu.parallel import mesh as pmesh

_SX = np.array([[0, 1], [1, 0]], dtype=complex) / 2
_SY = np.array([[0, -1j], [1j, 0]], dtype=complex) / 2
_SZ = np.array([[1, 0], [0, -1]], dtype=complex) / 2
_I2 = np.eye(2, dtype=complex)


def _site_op(op, i, N):
    out = np.array([[1.0 + 0j]])
    for m in range(N):
        out = np.kron(out, op if m == i else _I2)
    return out


def _full_spin_h(N, bonds, fields):
    """Full 2^N S=1/2 Hamiltonian: sum_b S_i^T J S_j - sum h.S."""
    S = [[_site_op(o, i, N) for o in (_SX, _SY, _SZ)] for i in range(N)]
    H = np.zeros((2 ** N, 2 ** N), dtype=complex)
    for J, i, j in bonds:
        for a in range(3):
            for b in range(3):
                if J[a, b] != 0:
                    H += J[a, b] * (S[i][a] @ S[j][b])
    for h, i in fields:
        for a in range(3):
            if h[a] != 0:
                H -= h[a] * S[i][a]
    return H


def _one_magnon_energies(N, bonds, fields):
    """Exact excitation energies in the one-flip sector above the
    fully polarized state (which must be an exact eigenstate)."""
    H = _full_spin_h(N, bonds, fields)
    up = np.zeros(2 ** N, dtype=complex)
    up[0] = 1.0  # |000...0> with bit 0 = spin up in the kron order
    e0 = np.real(up @ H @ up)
    # verify the polarized state is an exact eigenstate
    assert np.linalg.norm(H @ up - e0 * up) < 1e-12
    # one-flip basis: bit i set
    idx = [1 << (N - 1 - i) for i in range(N)]
    block = H[np.ix_(idx, idx)]
    return np.sort(np.linalg.eigvalsh(block) - e0)


def _dm_matrix(D):
    D = np.asarray(D, float)
    return np.array([
        [0.0, D[2], -D[1]],
        [-D[2], 0.0, D[0]],
        [D[1], -D[0], 0.0],
    ])


def test_exact_one_magnon_ring():
    """FM ring with Heisenberg + z-DM + field: LSWT == exact."""
    N, J, D, h = 8, 1.1, 0.37, 0.21
    Jm = -J * np.eye(3) + _dm_matrix([0.0, 0.0, D])
    bonds = [(Jm, i, (i + 1) % N) for i in range(N)]
    fields = [(np.array([0.0, 0.0, h]), i) for i in range(N)]
    exact = _one_magnon_energies(N, bonds, fields)

    sm = magnon.spin_model([[1.0]], [[0.0]], spin=0.5)
    sm.set_coupling(-J, 0, 0, [1], dm=[0.0, 0.0, D])
    sm.set_field([0.0, 0.0, h])
    ks = (np.arange(N) / N)[:, None]
    w = np.sort(magnon.bands(sm, ks, shift=0.0).reshape(-1))
    np.testing.assert_allclose(w, exact, atol=1e-8)


def test_exact_one_magnon_honeycomb_dm():
    """2x2-cell honeycomb FM with Haldane-pattern nnn z-DM: the full
    8-spin one-magnon sector == LSWT at the folded k set."""
    J, D = 1.0, 0.25
    sm = _honeycomb_fm(J, D, field=0.12)
    # flatten 2x2 cells: site (c1, c2, s) -> index 2*(2*c1 + c2) + s
    def site(c1, c2, s):
        return 2 * (2 * (c1 % 2) + (c2 % 2)) + s

    bonds = []
    for c1 in range(2):
        for c2 in range(2):
            # nn bonds from sublattice 0: R = (0,0), (-1,0), (0,-1)
            for dR in ((0, 0), (-1, 0), (0, -1)):
                bonds.append((
                    -J * np.eye(3),
                    site(c1, c2, 0),
                    site(c1 + dR[0], c2 + dR[1], 1),
                ))
            # nnn DM bonds (Haldane pattern): sublattice 0 with +D for
            # R in (1,0), (-1,1), (0,-1); sublattice 1 opposite
            for s, sgn in ((0, 1.0), (1, -1.0)):
                for dR in ((1, 0), (-1, 1), (0, -1)):
                    bonds.append((
                        _dm_matrix([0, 0, sgn * D]),
                        site(c1, c2, s),
                        site(c1 + dR[0], c2 + dR[1], s),
                    ))
    fields = [(np.array([0.0, 0.0, 0.12]), i) for i in range(8)]
    exact = _one_magnon_energies(8, bonds, fields)
    ks = np.array([[a / 2, b / 2] for a in range(2) for b in range(2)])
    w = np.sort(magnon.bands(sm, ks, shift=0.0).reshape(-1))
    np.testing.assert_allclose(w, exact, atol=1e-8)


def _honeycomb_fm(J, D, field=0.0):
    lat = [[1.0, 0.0], [0.5, np.sqrt(3) / 2]]
    pos = [[1 / 3, 1 / 3], [2 / 3, 2 / 3]]
    sm = magnon.spin_model(lat, pos, spin=0.5)
    sm.set_coupling(-J, 0, 1, [0, 0])
    sm.set_coupling(-J, 1, 0, [1, 0])
    sm.set_coupling(-J, 1, 0, [0, 1])
    for dR in ((1, 0), (-1, 1), (0, -1)):
        sm.set_coupling(np.zeros((3, 3)), 0, 0, dR, dm=[0, 0, D])
        sm.set_coupling(np.zeros((3, 3)), 1, 1, dR, dm=[0, 0, -D])
    if field:
        sm.set_field([0.0, 0.0, field])
    return sm


def test_fm_afm_chain_analytics():
    J, S = 1.3, 0.5
    sm = magnon.spin_model([[1.0]], [[0.0]], spin=S)
    sm.set_coupling(-J, 0, 0, [1])
    ks = np.linspace(0.0, 1.0, 9)[:, None]
    w = magnon.bands(sm, ks, shift=1e-12)
    np.testing.assert_allclose(
        w[:, 0], 4 * J * S * np.sin(np.pi * ks[:, 0]) ** 2, atol=1e-6
    )
    afm = magnon.spin_model([[2.0]], [[0.0], [0.5]], spin=S)
    afm.set_coupling(J, 0, 1, [0])
    afm.set_coupling(J, 1, 0, [1])
    afm.set_moments([[0, 0, 1], [0, 0, -1]])
    ks2 = np.linspace(0.04, 0.46, 6)[:, None]
    w2 = magnon.bands(afm, ks2, shift=1e-10)
    np.testing.assert_allclose(
        w2[:, 0], 2 * J * S * np.abs(np.sin(np.pi * ks2[:, 0])), atol=1e-6
    )
    # both folded branches degenerate in the doubled cell
    np.testing.assert_allclose(w2[:, 0], w2[:, 1], atol=1e-6)


def test_single_ion_conventions():
    J = 1.0
    # S = 1/2: single-ion anisotropy is spectrally inert
    a = magnon.spin_model([[1.0]], [[0.0]], spin=0.5)
    a.set_coupling(-J, 0, 0, [1])
    b = magnon.spin_model([[1.0]], [[0.0]], spin=0.5)
    b.set_coupling(-J, 0, 0, [1])
    b.set_single_ion(np.diag([0.0, 0.0, -0.8]), 0)
    ks = np.linspace(0.0, 0.5, 5)[:, None]
    np.testing.assert_allclose(
        magnon.bands(a, ks), magnon.bands(b, ks), atol=1e-9
    )
    # S = 1 easy axis: gap (2S-1) D = D
    c = magnon.spin_model([[1.0]], [[0.0]], spin=1.0)
    c.set_coupling(-J, 0, 0, [1])
    c.set_single_ion(np.diag([0.0, 0.0, -0.4]), 0)
    w0 = magnon.bands(c, np.array([[0.0]]), shift=1e-12)
    assert abs(w0[0, 0] - 0.4) < 1e-7


def test_magnon_chern_matches_tb():
    """B = 0 reduction: the magnon problem of a collinear FM with
    z-DM has the same Bloch matrix as an electronic tb_model built
    from the LSWT hop table; bands and Chern numbers must agree."""
    J, D, h = 1.0, 0.2, 0.1
    sm = _honeycomb_fm(J, D, field=h)
    iidx, jidx, dvec, a_amp, b_amp, cdiag = sm._tables()
    assert np.max(np.abs(b_amp)) < 1e-14  # collinear z-DM: B == 0
    tb = ptt.tb_model(2, 2, [[1.0, 0.0], [0.5, np.sqrt(3) / 2]],
                      [[1 / 3, 1 / 3], [2 / 3, 2 / 3]])
    tb.set_onsite([-c for c in cdiag])
    # the symmetrized table holds every directed entry; set_hop adds
    # the Hermitian partner itself, so keep one entry per pair:
    # i < j, or for i == j the +R member
    for b in range(len(iidx)):
        i, j = int(iidx[b]), int(jidx[b])
        R = np.round(
            dvec[b] - sm._pos[j][: sm._dim_k] + sm._pos[i][: sm._dim_k]
        ).astype(int)
        if i > j:
            continue
        if i == j:
            nz = next((int(x) for x in R if abs(x) > 0), 0)
            if nz < 0:
                continue
        tb.set_hop(complex(a_amp[b]), i, j, list(R), mode="add")
    ks = np.array([[0.13, 0.27], [0.4, 0.8], [0.0, 0.5]])
    w_tb = np.asarray(tb.solve_all(ks)).T
    w_mag = magnon.bands(sm, ks, shift=0.0)
    np.testing.assert_allclose(w_mag, w_tb, atol=1e-8)
    c_tb = flows.chern_number(tb, [0], nk=(25, 25))
    c_mag = magnon.chern(sm, 0, nk=25)
    assert abs(c_mag - np.round(c_tb)) < 1e-9
    assert abs(c_mag) == 1.0
    # DM sign flip reverses the Chern number
    sm2 = _honeycomb_fm(J, -D, field=h)
    assert magnon.chern(sm2, 0, nk=25) == -c_mag


def test_thermal_hall_sanity():
    sm = _honeycomb_fm(1.0, 0.25, field=0.05)
    Ts = np.array([1e-3, 0.3, 0.8])
    k1 = magnon.thermal_hall(sm, Ts, nk=31)
    assert abs(k1[0]) < 1e-3  # vanishes as T -> 0
    assert abs(k1[2]) > 1e-3
    # grid convergence
    k2 = magnon.thermal_hall(sm, Ts[2], nk=41)
    assert abs(k2 - k1[2]) < 0.05 * abs(k1[2]) + 1e-4
    # DM sign flips the sign
    sm2 = _honeycomb_fm(1.0, -0.25, field=0.05)
    k3 = magnon.thermal_hall(sm2, Ts[2], nk=31)
    np.testing.assert_allclose(k3, -k1[2], rtol=1e-6)


def test_mesh_sharded_bands():
    sm = _honeycomb_fm(1.0, 0.2)
    ks = np.random.default_rng(0).uniform(size=(16, 2))
    base = magnon.bands(sm, ks)
    with pmesh.use_mesh(pmesh.auto_mesh()):
        shard = magnon.bands(sm, ks)
    np.testing.assert_allclose(base, shard, atol=1e-10)


def test_classical_energy_and_guards():
    sm = magnon.spin_model([[1.0]], [[0.0]], spin=0.5)
    sm.set_coupling(-1.0, 0, 0, [1])
    # FM chain classical energy per cell: -J S^2
    assert abs(sm.classical_energy() - (-0.25)) < 1e-12
    with pytest.raises(PythtbError):
        sm.set_coupling(1.0, 0, 0)  # same-site R=0
    with pytest.raises(PythtbError):
        sm.set_moments([[0.0, 0.0, 0.0]])
    with pytest.raises(PythtbError):
        magnon.chern(sm, 0)  # dim_k != 2
    # non-minimum configuration: AFM coupling with FM moments is not
    # positive definite -> Colpa failure raises
    bad = magnon.spin_model([[2.0]], [[0.0], [0.5]], spin=0.5)
    bad.set_coupling(1.0, 0, 1, [0])
    bad.set_coupling(1.0, 1, 0, [1])
    with pytest.raises(PythtbError):
        magnon.bands(bad, np.array([[0.25]]), shift=0.0)
