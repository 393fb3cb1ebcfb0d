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


# ---------------------------------------------------------------------------
# write_tb (_tb.dat) support -- beyond-reference (upstream wish list,
# /root/reference/notes/TODO:3); oracle = our own standard-file import,
# itself differentially tested against the reference above.
# ---------------------------------------------------------------------------


def _write_tb(dirpath, prefix, lat_ang, centers_ang, ham_r, degs):
    """Write a <prefix>_tb.dat in Wannier90's write_tb layout; the
    position matrices are synthesized as diagonal-dominant with the
    given centers on the R=0 diagonal plus small off-diagonal noise."""
    nw = centers_ang.shape[0]
    rng = np.random.RandomState(7)
    with open("%s/%s_tb.dat" % (dirpath, prefix), "w") as f:
        f.write("written on synthetic-test-data\n")
        for row in lat_ang:
            f.write("  %.12f %.12f %.12f\n" % tuple(row))
        f.write(" %d\n" % nw)
        f.write(" %d\n" % len(ham_r))
        degl = list(degs)
        for i in range(0, len(degl), 15):
            f.write(" " + " ".join("%5d" % d for d in degl[i : i + 15]) + "\n")
        for (R, H) in ham_r.items():
            f.write("\n%5d%5d%5d\n" % R)
            for j in range(nw):
                for i in range(nw):
                    f.write("%5d%5d  %15.8e %15.8e\n" % (i + 1, j + 1, H[i, j].real, H[i, j].imag))
        for (R, _) in ham_r.items():
            f.write("\n%5d%5d%5d\n" % R)
            for j in range(nw):
                for i in range(nw):
                    if R == (0, 0, 0) and i == j:
                        v = np.array(centers_ang[i], dtype=complex)
                    else:
                        v = 0.01 * (rng.randn(3) + 1j * rng.randn(3))
                    f.write(
                        "%5d%5d  " % (i + 1, j + 1)
                        + " ".join("%15.8e %15.8e" % (c.real, c.imag) for c in v)
                        + "\n"
                    )


@pytest.mark.parametrize("seed", [0, 3])
def test_tb_dat_matches_standard_files(tmp_path, seed):
    lat, centers, ham_r, degs = _synthetic_set(seed)
    _write_w90(str(tmp_path), "syn", lat, centers, ham_r, degs, "ang")
    _write_tb(str(tmp_path), "syn", lat, centers, ham_r, degs)
    with redirect_stdout(io.StringIO()):
        w_std = ptt.w90(str(tmp_path), "syn")                     # auto: standard
        w_tb = ptt.w90(str(tmp_path), "syn", use_tb_file=True)    # forced tb
    assert w_std.pos_r is None and w_tb.pos_r is not None
    np.testing.assert_allclose(w_std.lat, w_tb.lat, atol=1e-10)
    np.testing.assert_allclose(w_std.xyz_cen, w_tb.xyz_cen, atol=1e-7)
    with redirect_stdout(io.StringIO()):
        m_std = w_std.model(min_hopping_norm=0.05)
        m_tb = w_tb.model(min_hopping_norm=0.05)
    kpts = np.random.RandomState(seed).rand(6, 3)
    np.testing.assert_allclose(m_std.solve_all(kpts), m_tb.solve_all(kpts), atol=1e-7)
    # position matrices: R=0 diagonal carries the centers
    np.testing.assert_allclose(
        np.real(np.einsum("iid->id", w_tb.pos_r[(0, 0, 0)])), centers, atol=1e-7
    )


def test_tb_dat_auto_fallback_without_standard_files(tmp_path):
    lat, centers, ham_r, degs = _synthetic_set(1)
    _write_tb(str(tmp_path), "solo", lat, centers, ham_r, degs)
    w = ptt.w90(str(tmp_path), "solo")  # no .win/_hr.dat/_centres.xyz present
    assert w.num_wan == centers.shape[0]
    assert set(w.ham_r.keys()) == set(ham_r.keys())
    with redirect_stdout(io.StringIO()):
        m = w.model()
    ev = m.solve_all(np.array([[0.1, 0.2, 0.3]]))
    assert np.all(np.isfinite(ev))


def test_tb_dat_truncated_rejected(tmp_path):
    lat, centers, ham_r, degs = _synthetic_set(2)
    _write_tb(str(tmp_path), "bad", lat, centers, ham_r, degs)
    path = "%s/%s_tb.dat" % (tmp_path, "bad")
    lines = open(path).readlines()
    open(path, "w").writelines(lines[: len(lines) // 2])
    with pytest.raises(Exception):
        ptt.w90(str(tmp_path), "bad", use_tb_file=True)


class TestWriteW90:
    def test_round_trip_random_3d(self, tmp_path):
        rng = np.random.default_rng(5)
        m = ptt.tb_model(
            3, 3, lat=np.eye(3) + 0.1 * rng.standard_normal((3, 3)),
            orb=rng.random((3, 3)))
        m.set_onsite(rng.standard_normal(3))
        for (i, j, R) in [(0, 1, [0, 0, 0]), (0, 2, [1, 0, 0]),
                          (1, 2, [0, 1, 0]), (0, 0, [0, 0, 1]),
                          (2, 2, [1, 1, 0])]:
            amp = rng.standard_normal() + 1j * rng.standard_normal()
            if i == j:
                amp = amp  # complex same-orbital inter-cell hop is legal
            m.set_hop(amp, i, j, R)
        from pythtb_tpu.w90 import write_w90

        write_w90(m, str(tmp_path), "rt")
        back = ptt.w90(str(tmp_path), "rt").model()
        ks = rng.random((23, 3))
        np.testing.assert_allclose(back.solve_all(ks), m.solve_all(ks),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(back._orb),
                                   np.asarray(m._orb), atol=1e-12)

    def test_round_trip_silicon(self, tmp_path):
        import os

        src = os.path.join(os.path.dirname(__file__), "data", "w90_silicon")
        if not os.path.isdir(src):
            pytest.skip("silicon data not vendored")
        si = ptt.w90(src, "silicon").model()
        from pythtb_tpu.w90 import write_w90

        write_w90(si, str(tmp_path), "si2")
        back = ptt.w90(str(tmp_path), "si2").model()
        ks = np.random.default_rng(0).random((17, 3))
        np.testing.assert_allclose(back.solve_all(ks), si.solve_all(ks),
                                   atol=1e-10)

    def test_write_guards(self, tmp_path):
        from pythtb_tpu.w90 import write_w90
        from pythtb_tpu.model import PythtbError

        with pytest.raises(PythtbError):
            write_w90(ptt.models.haldane(), str(tmp_path), "x")
        with pytest.raises(PythtbError):
            write_w90(ptt.models.fu_kane_mele(), str(tmp_path), "x")
