"""Output-level tests for viz.visualize: the figure CONTENT (marker
positions, hopping polylines, eigenstate marker sizes/colors, axes
limits) must match the reference's figure artist-for-artist, even
though the drawing uses vectorized collections instead of the
reference's per-hopping plot loop (/root/reference/pythtb.py:636-860).
"""

import io
from contextlib import redirect_stdout

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

import pythtb_tpu as ptt

from . import zoo


def _round_sorted(points, nd=9):
    pts = np.round(np.asarray(points, dtype=float), nd)
    if pts.size == 0:
        return pts.reshape(0, 2)
    order = np.lexsort(pts.T[::-1])
    return pts[order]


def _collect(fig):
    """Extract drawable content from a visualize() figure, artist-type
    agnostic: marker points / polylines / sized-colored markers, grouped
    by zorder."""
    from matplotlib.collections import LineCollection, PathCollection
    from matplotlib.lines import Line2D

    ax = fig.axes[0]
    markers = {}   # zorder -> list of (x, y)
    lines = {}     # zorder -> list of (npts, 2) vertex arrays
    sized = []     # (x, y, diameter_pts, r, g, b) for eigenstate markers
    for art in list(ax.lines) + list(ax.collections):
        z = art.get_zorder()
        if isinstance(art, Line2D):
            xy = np.asarray(art.get_xydata(), dtype=float)
            if art.get_linestyle() in ("None", "none", None) or art.get_marker() not in ("None", "none", None, ""):
                if z == 11:
                    col = np.asarray(matplotlib.colors.to_rgb(art.get_color()))
                    for p in xy:
                        sized.append((p[0], p[1], art.get_markersize(), *col))
                    continue
                if art.get_linestyle() in ("None", "none", None):
                    markers.setdefault(z, []).extend(map(tuple, xy))
                    continue
            # a line (possibly with markers -- reference cell vectors)
            lines.setdefault(z, []).append(xy)
            if art.get_marker() not in ("None", "none", None, ""):
                markers.setdefault(z, []).extend(map(tuple, xy))
        elif isinstance(art, LineCollection):
            for seg in art.get_segments():
                lines.setdefault(z, []).append(np.asarray(seg, dtype=float))
        elif isinstance(art, PathCollection):  # scatter
            offs = np.asarray(art.get_offsets(), dtype=float)
            sizes = np.sqrt(np.asarray(art.get_sizes(), dtype=float))
            cols = np.asarray(art.get_facecolors(), dtype=float)[:, :3]
            if len(sizes) == 1:
                sizes = np.repeat(sizes, len(offs))
            if len(cols) == 1:
                cols = np.repeat(cols, len(offs), axis=0)
            for p, s, c in zip(offs, sizes, cols):
                sized.append((p[0], p[1], s, *c))
    return markers, lines, sized


def _assert_same_figure(fig_ref, fig_tpu, with_eig):
    mk_r, ln_r, sz_r = _collect(fig_ref)
    mk_t, ln_t, sz_t = _collect(fig_tpu)

    # marker point multisets per zorder (7 origin, 9 neighbors, 10 orbitals)
    for z in sorted(set(mk_r) | set(mk_t)):
        if z == 7:
            # reference draws cell-vector lines with default marker=None;
            # compare only the origin dot, present in both
            pass
        a = _round_sorted(mk_r.get(z, []))
        b = _round_sorted(mk_t.get(z, []))
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg="markers z=%s" % z)

    # polylines per zorder (7 cell vectors, 8 bent hoppings)
    for z in sorted(set(ln_r) | set(ln_t)):
        segs_r = [np.round(s, 9) for s in ln_r.get(z, [])]
        segs_t = [np.round(s, 9) for s in ln_t.get(z, [])]
        assert len(segs_r) == len(segs_t), ("line count z=%s" % z, len(segs_r), len(segs_t))
        key = lambda s: tuple(s.reshape(-1))
        for a, b in zip(sorted(segs_r, key=key), sorted(segs_t, key=key)):
            np.testing.assert_allclose(a, b, atol=1e-9, err_msg="lines z=%s" % z)

    # eigenstate markers: position, diameter, color
    assert (len(sz_r) > 0) == with_eig and len(sz_r) == len(sz_t)
    a = _round_sorted(np.array(sz_r).reshape(-1, 6) if sz_r else np.zeros((0, 6)))
    b = _round_sorted(np.array(sz_t).reshape(-1, 6) if sz_t else np.zeros((0, 6)))
    np.testing.assert_allclose(a, b, atol=1e-9, err_msg="eigenstate markers")

    # squared-up limits
    np.testing.assert_allclose(fig_ref.axes[0].get_xlim(), fig_tpu.axes[0].get_xlim(), atol=1e-6)
    np.testing.assert_allclose(fig_ref.axes[0].get_ylim(), fig_tpu.axes[0].get_ylim(), atol=1e-6)


CASES = ["bulk", "ribbon", "finite", "eig_redblue", "eig_wheel", "eig_black", "nohop"]


@pytest.mark.parametrize("case", CASES)
def test_visualize_matches_reference_figure(case, ref):
    with redirect_stdout(io.StringIO()):
        m_ref = zoo.graphene(ref)
        m_tpu = zoo.graphene(ptt)
        if case == "ribbon":
            m_ref = m_ref.cut_piece(3, 0, glue_edgs=False)
            m_tpu = m_tpu.cut_piece(3, 0, glue_edgs=False)
        elif case == "finite":
            m_ref = m_ref.cut_piece(2, 0).cut_piece(2, 1)
            m_tpu = m_tpu.cut_piece(2, 0).cut_piece(2, 1)

    kwargs_ref = {}
    kwargs_tpu = {}
    with_eig = case.startswith("eig")
    if with_eig:
        _, evec = m_ref.solve_one([0.1, 0.2], eig_vectors=True)
        eig = evec[0]
        scheme = {"eig_redblue": "red-blue", "eig_wheel": "wheel", "eig_black": "black"}[case]
        kwargs_ref = kwargs_tpu = dict(eig_dr=eig, ph_color=scheme)
    if case == "nohop":
        kwargs_ref = kwargs_tpu = dict(draw_hoppings=False)

    fig_r, _ = m_ref.visualize(0, 1, **kwargs_ref)
    fig_t, _ = m_tpu.visualize(0, 1, **kwargs_tpu)
    try:
        _assert_same_figure(fig_r, fig_t, with_eig)
    finally:
        plt.close(fig_r)
        plt.close(fig_t)


def test_visualize_1d_chain(ref):
    with redirect_stdout(io.StringIO()):
        m_ref = ref.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
        m_tpu = ptt.tb_model(1, 1, [[1.0]], [[0.0], [0.5]])
        for m in (m_ref, m_tpu):
            m.set_hop(1.0, 0, 1, [0])
            m.set_hop(0.4, 1, 0, [1])
    fig_r, _ = m_ref.visualize(0)
    fig_t, _ = m_tpu.visualize(0)
    try:
        _assert_same_figure(fig_r, fig_t, with_eig=False)
    finally:
        plt.close(fig_r)
        plt.close(fig_t)


def test_visualize_errors():
    with redirect_stdout(io.StringIO()):
        m = zoo.graphene(ptt)
    with pytest.raises(Exception):
        m.visualize(0)  # needs dir_second for dim_r = 2
    with pytest.raises(Exception):
        m.visualize(0, 1, ph_color="rainbow")
    with pytest.raises(Exception):
        m.visualize(0, 1, eig_dr=np.ones(5))


def test_visualize_hopping_labels():
    """annotate_hoppings labels each bond with its amplitude (upstream
    wish-list, /root/reference/notes/TODO:49)."""
    import matplotlib

    matplotlib.use("Agg")
    from pythtb_tpu.models import library as zoo

    m = zoo.haldane()
    fig, ax = m.visualize(0, 1, annotate_hoppings=True)
    texts = [t.get_text() for t in ax.texts]
    assert len(texts) == len(m._hoppings)
    assert "-1" in texts and "0.15j" in texts  # NN real, NNN imaginary
    # default stays label-free (reference-compatible figure content)
    fig2, ax2 = m.visualize(0, 1)
    assert len(ax2.texts) == 0
    # spin blocks labelled by Frobenius norm
    km = zoo.kane_mele()
    fig3, ax3 = km.visualize(0, 1, annotate_hoppings=True)
    assert all(t.get_text().startswith("|t|=") for t in ax3.texts)
