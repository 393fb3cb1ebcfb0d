"""Synthetic Wannier90 filesets: parser edge cases + differential import.

Generates .win / _hr.dat / _centres.xyz files from scratch (bohr and
angstrom units, Wigner-Seitz degeneracies spanning several lines,
negative-R partners) and imports them through both implementations.
"""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import pythtb_tpu as ptt


def _write_w90(dirpath, prefix, lat_ang, centers_ang, ham_r, degs, units="ang"):
    """Write a minimal Wannier90 fileset.

    ham_r: dict {(R1,R2,R3): (nw, nw) complex}; degs: matching list of ints.
    """
    nw = centers_ang.shape[0]
    conv = 1.0 / 0.5291772108 if units == "bohr" else 1.0
    with open("%s/%s.win" % (dirpath, prefix), "w") as f:
        f.write("! synthetic test fileset\n")
        f.write("begin unit_cell_cart\n")
        if units != "none":
            f.write("%s\n" % ("bohr" if units == "bohr" else "ang"))
        for row in lat_ang * conv:
            f.write("  %.12f %.12f %.12f\n" % tuple(row))
        f.write("end unit_cell_cart\n")
    with open("%s/%s_hr.dat" % (dirpath, prefix), "w") as f:
        f.write("synthetic hr file\n")
        f.write(" %d\n" % nw)
        f.write(" %d\n" % len(ham_r))
        # degeneracies, 15 per line (w90 format); force multiple lines
        for i in range(0, len(degs), 5):
            f.write(" " + " ".join("%5d" % d for d in degs[i : i + 5]) + "\n")
        for (R, H) in ham_r.items():
            for j in range(nw):
                for i in range(nw):
                    f.write(
                        "%5d%5d%5d%5d%5d %18.10f %18.10f\n"
                        % (R[0], R[1], R[2], i + 1, j + 1, H[i, j].real, H[i, j].imag)
                    )
    with open("%s/%s_centres.xyz" % (dirpath, prefix), "w") as f:
        f.write("%d\n\n" % nw)
        for c in centers_ang:
            f.write("X   %.10f %.10f %.10f\n" % tuple(c))


def _synthetic_set(seed):
    rng = np.random.RandomState(seed)
    nw = rng.randint(2, 4)
    lat = np.eye(3) * 2.0 + 0.3 * rng.randn(3, 3)
    if np.linalg.det(lat) < 0.5:
        lat = np.eye(3) * 2.0
    centers = rng.randn(nw, 3) * 0.4 + lat.sum(0) * 0.25
    Rs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (1, 1, -1), (-1, -1, 1)]
    ham_r = {}
    for R in Rs:
        H = rng.randn(nw, nw) * 0.3 + 1j * rng.randn(nw, nw) * 0.1
        ham_r[R] = H
    # enforce the Hermiticity structure H(-R) = H(R)^dagger and real onsite
    ham_r[(0, 0, 0)] = 0.5 * (ham_r[(0, 0, 0)] + ham_r[(0, 0, 0)].conj().T)
    for R in [(1, 0, 0), (0, 1, 0), (1, 1, -1)]:
        mR = tuple(-x for x in R)
        ham_r[mR] = ham_r[R].conj().T
    degs = [int(rng.randint(1, 3)) for _ in Rs]
    # deg must pair for R and -R (physical WS degeneracy)
    for i, R in enumerate(Rs):
        mR = tuple(-x for x in R)
        if mR in Rs:
            degs[Rs.index(mR)] = degs[i]
    return lat, centers, ham_r, degs


@pytest.mark.parametrize("seed,units", [(0, "ang"), (1, "bohr"), (2, "none"), (3, "bohr")])
def test_synthetic_w90_matches_reference(tmp_path, ref, seed, units):
    lat, centers, ham_r, degs = _synthetic_set(seed)
    _write_w90(str(tmp_path), "syn", lat, centers, ham_r, degs, units)
    with redirect_stdout(io.StringIO()):
        w_ref = ref.w90(str(tmp_path), "syn")
        w_tpu = ptt.w90(str(tmp_path), "syn")
    np.testing.assert_allclose(w_ref.lat, w_tpu.lat, atol=1e-12)
    np.testing.assert_allclose(w_ref.red_cen, w_tpu.red_cen, atol=1e-12)
    d_ref, h_ref = w_ref.dist_hop()
    d_tpu, h_tpu = w_tpu.dist_hop()
    np.testing.assert_allclose(d_ref, d_tpu, atol=1e-10)
    np.testing.assert_allclose(h_ref, h_tpu, atol=1e-12)
    for kwargs in (
        {},
        {"min_hopping_norm": 0.15},
        {"max_distance": 2.5},
        {"zero_energy": 0.3, "ignorable_imaginary_part": 0.05},
    ):
        with redirect_stdout(io.StringIO()):
            m_ref = w_ref.model(**kwargs)
            m_tpu = w_tpu.model(**kwargs)
        kpts = np.random.RandomState(seed).rand(6, 3)
        np.testing.assert_allclose(
            m_ref.solve_all(kpts), m_tpu.solve_all(kpts), atol=1e-11,
            err_msg=str(kwargs),
        )


def test_synthetic_w90_missing_negative_R_rejected(tmp_path, ref):
    lat, centers, ham_r, degs = _synthetic_set(5)
    bad = dict(ham_r)
    bad.pop((-1, 0, 0))  # break the +-R pairing
    degs = degs[:-1]
    _write_w90(str(tmp_path), "bad", lat, centers, bad, degs)
    for M in (ref, ptt):
        with pytest.raises(Exception):
            with redirect_stdout(io.StringIO()):
                M.w90(str(tmp_path), "bad")
