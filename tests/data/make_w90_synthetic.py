#!/usr/bin/env python
"""Generate the vendored synthetic Wannier90 fileset at
tests/data/w90_synthetic/ (committed output -- run once, deterministic).

The fileset exercises every parser branch of the w90 importer
(/root/reference/pythtb.py:3330-3446 semantics): bohr units in .win,
Wigner-Seitz degeneracies > 1 spanning multiple lines, +-R partners,
Wannier centers outside the home cell, amplitudes with small imaginary
parts (for ignorable_imaginary_part), a wide norm spread (for
min_hopping_norm), spread-out centers (for max_distance), and
_band.kpt/_band.dat files for w90_bands_consistency (energies computed
from the same model so the consistency check is exact).

Run from the repo root:  python tests/data/make_w90_synthetic.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

BOHR = 0.5291772108
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "w90_synthetic")
PREFIX = "synth"


def build_data():
    rng = np.random.RandomState(2024)
    nw = 4
    # non-orthogonal cell, in Angstrom
    lat = np.array([
        [3.1, 0.0, 0.1],
        [0.4, 2.9, 0.0],
        [0.0, 0.3, 3.3],
    ])
    # centers: one deliberately outside the home cell
    red = np.array([
        [0.10, 0.20, 0.30],
        [0.60, 0.55, 0.15],
        [0.25, 0.80, 0.70],
        [1.15, -0.20, 0.45],
    ])
    centers = red @ lat

    Rs = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, -1, 1), (2, 0, 0)]
    degs = {}
    ham_r = {}
    deg_choices = [1, 2, 1, 4, 3, 2, 6]
    for R, dg in zip(Rs, deg_choices):
        # wide norm spread; small imaginary parts on some entries
        mag = np.exp(rng.uniform(-6, 0, size=(nw, nw)))
        pha = rng.uniform(-np.pi, np.pi, size=(nw, nw))
        H = mag * np.exp(1j * pha)
        small_im = rng.rand(nw, nw) < 0.4
        H[small_im] = H[small_im].real + 1j * rng.uniform(-1e-5, 1e-5, small_im.sum())
        ham_r[R] = H * dg  # file stores deg * normalized values
        degs[R] = dg
    # Hermiticity: H(-R) = H(R)^dagger; R=0 block Hermitian w/ real diagonal
    H0 = ham_r[(0, 0, 0)]
    H0 = (H0 + H0.conj().T) / 2
    np.fill_diagonal(H0, H0.diagonal().real)
    ham_r[(0, 0, 0)] = H0
    for R in Rs[1:]:
        mR = tuple(-x for x in R)
        ham_r[mR] = ham_r[R].conj().T
        degs[mR] = degs[R]
    return lat, centers, ham_r, degs


def write_fileset(lat, centers, ham_r, degs):
    os.makedirs(OUT, exist_ok=True)
    nw = centers.shape[0]
    # .win in BOHR units (exercises the conversion branch)
    with open(os.path.join(OUT, PREFIX + ".win"), "w") as f:
        f.write("! synthetic vendored test fileset (see make_w90_synthetic.py)\n\n")
        f.write("begin unit_cell_cart\n")
        f.write("bohr\n")
        for row in lat / BOHR:
            f.write("  %.12f %.12f %.12f\n" % tuple(row))
        f.write("end unit_cell_cart\n")
    with open(os.path.join(OUT, PREFIX + "_hr.dat"), "w") as f:
        f.write("synthetic hr file\n")
        f.write(" %d\n" % nw)
        f.write(" %d\n" % len(ham_r))
        dlist = [degs[R] for R in ham_r]
        for i in range(0, len(dlist), 5):  # force multi-line degeneracies
            f.write(" " + " ".join("%5d" % d for d in dlist[i : i + 5]) + "\n")
        for R, H in ham_r.items():
            for j in range(nw):
                for i in range(nw):
                    f.write(
                        "%5d%5d%5d%5d%5d %18.12f %18.12f\n"
                        % (R[0], R[1], R[2], i + 1, j + 1, H[i, j].real, H[i, j].imag)
                    )
    with open(os.path.join(OUT, PREFIX + "_centres.xyz"), "w") as f:
        f.write("%d\n" % nw)
        f.write("synthetic centres\n")
        for c in centers:
            f.write("X   %.12f %.12f %.12f\n" % tuple(c))


def write_bands():
    """k-path + energies computed from the imported model itself (via
    the reference if present, else pythtb_tpu -- both match to 1e-12),
    so w90_bands_consistency closes exactly."""
    import importlib.util

    ref_path = os.environ.get("PYTHTB_REFERENCE", "/root/reference/pythtb.py")
    if os.path.exists(ref_path):
        spec = importlib.util.spec_from_file_location("pythtb_ref", ref_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    else:
        import pythtb_tpu as mod

    w = mod.w90(OUT, PREFIX)
    model = w.model()
    kpts = np.array(
        [[x, x / 2.0, 0.0] for x in np.linspace(0.0, 0.5, 9)]
        + [[0.5 - x, 0.25, x] for x in np.linspace(0.0, 0.5, 8)[1:]]
    )
    ene = model.solve_all(kpts)
    with open(os.path.join(OUT, PREFIX + "_band.kpt"), "w") as f:
        f.write("%d\n" % kpts.shape[0])
        for k in kpts:
            f.write(" %.10f %.10f %.10f  1.0\n" % tuple(k))
    with open(os.path.join(OUT, PREFIX + "_band.dat"), "w") as f:
        for b in range(ene.shape[0]):
            for ik in range(ene.shape[1]):
                f.write(" %.8f  %.8f\n" % (float(ik), ene[b, ik]))
            f.write("\n")


if __name__ == "__main__":
    lat, centers, ham_r, degs = build_data()
    write_fileset(lat, centers, ham_r, degs)
    write_bands()
    print("wrote", OUT)
