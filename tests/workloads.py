"""Reference workloads used for golden-data parity testing.

Each workload function takes a module implementing the PythTB API (the
reference ``pythtb`` or ``pythtb_tpu``) and returns a dict of NumPy
arrays.  Only gauge-invariant quantities are returned (eigenvalues,
Berry phases/fluxes, Wannier centers, position expectations), since
eigenvector gauges are arbitrary.  Keys starting with ``pha_`` are
phases compared modulo 2*pi.

Workloads mirror the reference examples (cited per function) so the
committed goldens reproduce the reference's own test coverage
(/root/reference/tests/test_examples/).
"""

import pathlib

import numpy as np

from . import zoo

GRID_2D = [[0.0, 0.0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [0.0, 0.0]]


def bands_graphene(mod):
    m = zoo.graphene(mod, delta=0.3)
    k_vec, k_dist, k_node = zoo.graphene_path(m, 61)
    return {
        "k_vec": k_vec,
        "k_dist": k_dist,
        "k_node": k_node,
        "evals": m.solve_all(k_vec),
    }


def bands_checkerboard(mod):
    m = zoo.checkerboard(mod)
    path = [[0.0, 0.0], [0.0, 0.5], [0.5, 0.5], [0.0, 0.0]]
    k_vec = m.k_path(path, 51, report=False)[0]
    return {"evals": m.solve_all(k_vec)}


def bands_trestle(mod):
    m = zoo.trestle(mod)
    k_vec = m.k_path("fullc", 41, report=False)[0]
    return {"evals": m.solve_all(k_vec)}


def molecule_levels(mod):
    m = zoo.molecule(mod)
    return {"evals": m.solve_all()}


def bands_buckled(mod):
    m = zoo.buckled_layer(mod)
    path = [[0.0, 0.0], [0.0, 0.5], [0.5, 0.5], [0.0, 0.0]]
    k_vec = m.k_path(path, 31, report=False)[0]
    return {"evals": m.solve_all(k_vec)}


def haldane_bp(mod):
    """Berry phases and Chern number on a 31x31 grid
    (examples/haldane_bp.py:49-112)."""
    m = zoo.haldane(mod)
    wf = mod.wf_array(m, [31, 31])
    gaps = wf.solve_on_grid([-0.5, -0.5])
    out = {"gaps": gaps}
    out["pha_bp0_d0"] = np.asarray(wf.berry_phase([0], 0, contin=True))
    out["pha_bp0_d1"] = np.asarray(wf.berry_phase([0], 1, contin=False))
    out["pha_bp_both"] = np.asarray(wf.berry_phase([0, 1], 0, contin=True))
    out["flux0"] = np.asarray(wf.berry_flux([0]))
    out["flux_both"] = np.asarray(wf.berry_flux([0, 1]))
    out["pha_plaq"] = wf.berry_flux([0], individual_phases=True)
    return out


def cone(mod):
    """Berry phase around the Dirac cone + flux patch
    (examples/cone.py)."""
    m = zoo.graphene(mod, delta=-0.1)
    circ_step = 31
    circ_center = np.array([1.0 / 3.0, 2.0 / 3.0])
    circ_radius = 0.05
    w_circ = mod.wf_array(m, [circ_step])
    for i in range(circ_step):
        ang = 2.0 * np.pi * float(i) / float(circ_step - 1)
        kpt = np.array([np.cos(ang) * circ_radius, np.sin(ang) * circ_radius])
        kpt += circ_center
        w_circ.solve_on_one_point(kpt, i)
    w_circ[-1] = w_circ[0]
    out = {
        "pha_circ0": np.asarray(w_circ.berry_phase([0], 0)),
        "pha_circ1": np.asarray(w_circ.berry_phase([1], 0)),
        "pha_circ_both": np.asarray(w_circ.berry_phase([0, 1], 0)),
    }
    square_step = 31
    square_center = np.array([1.0 / 3.0, 2.0 / 3.0])
    square_length = 0.1
    w_square = mod.wf_array(m, [square_step, square_step])
    for i in range(square_step):
        for j in range(square_step):
            kpt = np.array(
                [
                    square_length * (-0.5 + float(i) / float(square_step - 1)),
                    square_length * (-0.5 + float(j) / float(square_step - 1)),
                ]
            )
            kpt += square_center
            _, evec = m.solve_one(kpt, eig_vectors=True)
            w_square[i, j] = evec
    out["flux0"] = np.asarray(w_square.berry_flux([0]))
    out["flux1"] = np.asarray(w_square.berry_flux([1]))
    out["flux_both"] = np.asarray(w_square.berry_flux([0, 1]))
    out["pha_plaq"] = w_square.berry_flux([0], individual_phases=True)
    return out


def kane_mele_flow(mod):
    """Z2 Wannier flow for trivial and topological phases
    (examples/kane_mele.py:107-121)."""
    out = {}
    for topo in ("even", "odd"):
        m = zoo.kane_mele(mod, topo)
        k_vec = m.k_path(GRID_2D, 41, report=False)[0]
        out["evals_" + topo] = m.solve_all(k_vec)
        wf = mod.wf_array(m, [21, 21])
        wf.solve_on_grid([-0.5, -0.5])
        out["pha_flow_" + topo] = wf.berry_phase([0, 1], dir=1, contin=False, berry_evals=True)
    return out


def haldane_finite(mod):
    """Finite cuts, glued and open, + edge-state position expectation
    (examples/haldane_fin.py, haldane_hwf.py)."""
    m = zoo.haldane(mod)
    out = {}
    fin = m.cut_piece(8, 0, glue_edgs=False).cut_piece(8, 1, glue_edgs=False)
    out["evals_open"] = fin.solve_all()
    glued = m.cut_piece(8, 0, glue_edgs=True).cut_piece(8, 1, glue_edgs=True)
    out["evals_glued"] = glued.solve_all()
    ribbon = m.cut_piece(8, 1, glue_edgs=False)
    k_vec = ribbon.k_path([[0.0], [0.5], [1.0]], 21, report=False)[0]
    evals, evecs = ribbon.solve_all(k_vec, eig_vectors=True)
    out["evals_ribbon"] = evals
    out["pos_exp"] = ribbon.position_expectation(evecs[:, 7], 1)
    out["hwfc"] = ribbon.position_hwf(evecs[:8, 7], 1)
    return out


def supercell(mod):
    """sqrt(5)-supercell bands (examples/supercell.py:35-41)."""
    m = zoo.haldane(mod)
    sc = m.make_supercell([[2, 1], [-1, 2]], to_home=True, to_home_suppress_warning=True)
    k_vec = sc.k_path([[0.0, 0.0], [0.5, 0.5], [0.0, 0.5], [0.0, 0.0]], 31, report=False)[0]
    return {"evals": sc.solve_all(k_vec)}


def three_site_pump(mod):
    """Charge pump: k x lambda wf_array, pbc along k only
    (examples/3site_cycle.py:43-89)."""
    nk, nl = 31, 21
    m0 = zoo.three_site(mod, 0.0)
    wf = mod.wf_array(m0, [nk, nl])
    for il, lmbd in enumerate(np.linspace(0.0, 1.0, nl)):
        m = zoo.three_site(mod, lmbd)
        _, evec = m.solve_all(np.linspace(0.0, 1.0, nk)[:, None], eig_vectors=True)
        for ik in range(nk):
            wf[ik, il] = evec[:, ik]
    wf.impose_pbc(0, 0)
    return {
        "pha_pump": np.asarray(wf.berry_phase([0], dir=0)),
        "flux": np.asarray(wf.berry_flux([0])),
    }


def slab_hwf(mod):
    """Hybrid-Wannier slab pipeline (examples/cubic_slab_hwf.py)."""

    def set_model(delta, ta, tb):
        lat = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        orb = [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]
        model = mod.tb_model(3, 3, lat, orb)
        model.set_onsite([-delta, delta])
        for lvec in ([-1, 0, 0], [0, 0, -1], [-1, -1, 0], [0, -1, -1]):
            model.set_hop(ta, 0, 1, lvec)
        for lvec in ([0, 0, 0], [0, -1, 0], [-1, -1, -1], [-1, 0, -1]):
            model.set_hop(tb, 0, 1, lvec)
        return model

    bulk = set_model(1.0, 0.4, 0.7)
    nl = 5
    slab = bulk.cut_piece(nl, 2, glue_edgs=False)
    slab = slab.remove_orb(2 * nl - 1)
    nk = 7
    bloch_arr = mod.wf_array(slab, [nk, nk])
    bloch_arr.solve_on_grid([0.0, 0.0])
    hwf_arr = bloch_arr.empty_like(nsta_arr=nl)
    hwfc = np.zeros([nk, nk, nl])
    for ix in range(nk):
        for iy in range(nk):
            val, vec = bloch_arr.position_hwf(
                [ix, iy], occ=list(range(nl)), dir=2, hwf_evec=True, basis="orbital"
            )
            hwfc[ix, iy] = val
            hwf_arr[ix, iy] = vec
    hwf_arr.impose_pbc(0, 0)
    hwf_arr.impose_pbc(1, 1)
    px = np.zeros((nl, nk))
    for n in range(nl):
        px[n, :] = hwf_arr.berry_phase(dir=0, occ=[n]) / (2.0 * np.pi)
    return {"hwfc": hwfc, "pha_px": px * 2.0 * np.pi}


def reduced_and_removed(mod):
    """reduce_dim and remove_orb consistency workloads."""
    m = zoo.haldane(mod)
    red = m.reduce_dim(0, 0.25)
    k1 = np.linspace(0.0, 1.0, 21)[:, None]
    out = {"evals_reduced": red.solve_all(k1)}
    sc = m.make_supercell([[2, 0], [0, 2]], to_home=True, to_home_suppress_warning=True)
    rem = sc.remove_orb([1, 6])
    k_vec = rem.k_path([[0.0, 0.0], [0.5, 0.5]], 11, report=False)[0]
    out["evals_removed"] = rem.solve_all(k_vec)
    return out


def bn_ribbon(mod):
    """BN ribbon Berry phase before/after change_nonperiodic_vector
    (reference tests/test_examples/boron_nitride/bn_ribbon_berry)."""
    bn = zoo.graphene(mod, delta=0.4)
    ribbon = bn.cut_piece(3, 1, glue_edgs=False)
    out = {}
    for tag, model in [
        ("orig", ribbon),
        ("perp", ribbon.change_nonperiodic_vector(1, to_home_suppress_warning=True)),
    ]:
        numk = 41
        k_vec = model.k_path([[-0.5], [0.5]], numk, report=False)[0]
        out["evals_" + tag] = model.solve_all(k_vec)
        wf = mod.wf_array(model, [numk])
        wf.solve_on_grid([0.0])
        n_occ = out["evals_" + tag].shape[0] // 2
        out["pha_" + tag] = np.asarray(wf.berry_phase(range(n_occ), dir=0))
    return out


def berry_3d(mod):
    """3-D wf_array: Berry phases (all contin/berry_evals combinations)
    and fluxes over every plane orientation, exercising the reference's
    hard-coded per-rank loops (pythtb.py:3000-3027, 3152-3202)."""
    lat = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    orb = [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]
    m = mod.tb_model(3, 3, lat, orb)
    m.set_onsite([-0.7, 0.7])
    m.set_hop(-1.0, 0, 1, [0, 0, 0])
    m.set_hop(-0.3, 0, 1, [-1, 0, 0])
    m.set_hop(-0.25, 0, 1, [0, -1, 0])
    m.set_hop(-0.2, 0, 1, [0, 0, -1])
    m.set_hop(0.1j, 0, 0, [1, 0, 0])
    m.set_hop(-0.1j, 1, 1, [1, 0, 0])
    wf = mod.wf_array(m, [7, 6, 5])
    gaps = wf.solve_on_grid([0.0, 0.0, 0.0])
    out = {"gaps": gaps}
    for d in range(3):
        out["pha_bp_d%d" % d] = np.asarray(wf.berry_phase([0], d, contin=False))
        out["pha_bp_d%d_contin" % d] = np.asarray(wf.berry_phase([0], d, contin=True))
        out["pha_ev_d%d" % d] = np.asarray(
            wf.berry_phase([0, 1], d, contin=False, berry_evals=True)
        )
    out["pha_ev_contin_d1"] = np.asarray(
        wf.berry_phase([0, 1], 1, contin=True, berry_evals=True)
    )
    for dirs in ([0, 1], [1, 2], [0, 2], [1, 0]):
        out["flux_%d%d" % tuple(dirs)] = np.asarray(wf.berry_flux([0], dirs=dirs))
    out["pha_plaq_12"] = wf.berry_flux([0], dirs=[1, 2], individual_phases=True)
    return out


def berry_4d(mod):
    """4-D wf_array filled manually ((k1, k2) x (p1, p2) parameter grid),
    berry_flux over k-planes for every parameter point
    (pythtb.py:3187-3202)."""
    m = zoo.haldane(mod)
    n1, n2, np1, np2 = 5, 5, 3, 2
    wf = mod.wf_array(m, [n1, n2, np1, np2])
    for i1 in range(np1):
        for i2 in range(np2):
            # parameters shift the grid origin (gauge-shifted copies)
            for a in range(n1):
                for b in range(n2):
                    kpt = [
                        -0.5 + a / (n1 - 1.0) + 0.01 * i1,
                        -0.5 + b / (n2 - 1.0) + 0.02 * i2,
                    ]
                    _, evec = m.solve_one(kpt, eig_vectors=True)
                    wf[a, b, i1, i2] = evec
    out = {
        "flux_k": np.asarray(wf.berry_flux([0], dirs=[0, 1])),
        "pha_plaq_k": wf.berry_flux([0], dirs=[0, 1], individual_phases=True),
        "flux_mixed": np.asarray(wf.berry_flux([0], dirs=[1, 2])),
    }
    return out


def berry_4d_grid(mod):
    """dim_k=4 model solved on a 4-D grid via solve_on_grid, flux over
    k-planes (exercises the rank-4 grid solver and pbc fixups)."""
    lat = np.eye(4).tolist()
    orb = [[0.0] * 4, [0.3, 0.1, 0.2, 0.4]]
    m = mod.tb_model(4, 4, lat, orb)
    m.set_onsite([-0.6, 0.6])
    m.set_hop(-1.0, 0, 1, [0, 0, 0, 0])
    m.set_hop(-0.5, 0, 1, [-1, 0, 0, 0])
    m.set_hop(-0.35, 0, 1, [0, -1, 0, 0])
    m.set_hop(0.2j, 0, 0, [0, 0, 1, 0])
    m.set_hop(-0.2j, 1, 1, [0, 0, 1, 0])
    m.set_hop(0.15, 0, 1, [0, 0, 0, -1])
    wf = mod.wf_array(m, [4, 4, 3, 3])
    gaps = wf.solve_on_grid([0.0, 0.0, 0.0, 0.0])
    out = {"gaps": gaps}
    out["flux_01"] = np.asarray(wf.berry_flux([0], dirs=[0, 1]))
    out["flux_23"] = np.asarray(wf.berry_flux([0], dirs=[2, 3]))
    out["pha_plaq_01"] = wf.berry_flux([0], dirs=[0, 1], individual_phases=True)
    return out


def w90_silicon(mod, data_dir):
    """Wannier90 silicon import (examples/w90.py)."""
    si = mod.w90(data_dir, "silicon")
    dist, ham = si.dist_hop()
    out = {"dist": dist, "ham_re": ham.real, "ham_im": ham.imag, "shells": si.shells()}
    model = si.model(min_hopping_norm=0.01)
    kpts, ene = si.w90_bands_consistency()
    out["w90_ene"] = ene
    out["evals"] = model.solve_all(kpts[::4])
    fermi_ev = 6.2285135
    model2 = si.model(zero_energy=fermi_ev, min_hopping_norm=0.05, max_distance=4.0)
    out["evals_filtered"] = model2.solve_all(kpts[::4])
    return out


def shift_home_quirk(mod):
    """make_supercell home-cell folding on a model whose orbitals leave
    the home cell -- exercising the reference snapshot's _shift_to_home
    indentation quirk (pythtb.py:1707-1715: only the LAST orbital is
    shifted, and only when the warning branch runs).  pythtb_tpu
    replicates it via to_home_compat="snapshot"; its default implements
    the documented intent instead (see pythtb_tpu/model.py docstring)."""
    lat = [[1.0, 0.1], [-0.2, 1.3]]
    orb = [[0.2, 0.3], [1.7, -0.6], [2.4, 1.9]]
    m = mod.tb_model(2, 2, lat, orb)
    m.set_onsite([0.5, -0.3, 0.1])
    m.set_hop(0.8 + 0.2j, 0, 1, [0, 0])
    m.set_hop(-1.1, 1, 2, [1, 0])
    m.set_hop(0.4 - 0.7j, 2, 0, [0, 1])
    m.set_hop(0.25j, 0, 0, [1, 1])
    compat = {"to_home_compat": "snapshot"} if "pythtb_tpu" in mod.__name__ else {}
    out = {}
    for tag, suppress in (("warn", False), ("silent", True)):
        sc = m.make_supercell([[2, 0], [0, 1]], to_home=True,
                              to_home_suppress_warning=suppress, **compat)
        hops = sorted(sc._hoppings,
                      key=lambda h: (h[1], h[2], tuple(np.asarray(h[3]))))
        out["orb_" + tag] = np.asarray(sc._orb, dtype=np.float64)
        out["hop_amp_" + tag] = np.asarray([complex(h[0]) for h in hops])
        out["hop_ij_" + tag] = np.asarray([[h[1], h[2]] for h in hops],
                                          dtype=np.int64)
        out["hop_R_" + tag] = np.asarray([np.asarray(h[3], dtype=np.float64)
                                          for h in hops])
        # physics must be representation-independent either way
        kp = np.array([[0.0, 0.0], [0.3, 0.4], [0.5, 0.5]])
        out["evals_" + tag] = sc.solve_all(kp)
    return out


ALL = {
    "bands_graphene": bands_graphene,
    "bands_checkerboard": bands_checkerboard,
    "bands_trestle": bands_trestle,
    "molecule_levels": molecule_levels,
    "bands_buckled": bands_buckled,
    "haldane_bp": haldane_bp,
    "cone": cone,
    "kane_mele_flow": kane_mele_flow,
    "haldane_finite": haldane_finite,
    "supercell": supercell,
    "three_site_pump": three_site_pump,
    "slab_hwf": slab_hwf,
    "reduced_and_removed": reduced_and_removed,
    "bn_ribbon": bn_ribbon,
    "berry_3d": berry_3d,
    "berry_4d": berry_4d,
    "berry_4d_grid": berry_4d_grid,
    "shift_home_quirk": shift_home_quirk,
}

def w90_synthetic(mod, data_dir=None):
    """Vendored synthetic Wannier90 fileset (tests/data/w90_synthetic/,
    generated by tests/data/make_w90_synthetic.py): exercises bohr
    units, multi-line WS degeneracies > 1, +-R pairing, out-of-cell
    centers, and all three model() filters -- with NO dependence on the
    reference tree at test time."""
    if data_dir is None:
        data_dir = W90_SYNTH_DIR
    w = mod.w90(data_dir, "synth")
    dist, ham = w.dist_hop()
    out = {"dist": dist, "ham_re": ham.real, "ham_im": ham.imag,
           "shells": w.shells(num_digits=3)}
    kpts, ene = w.w90_bands_consistency()
    out["w90_ene"] = ene
    model = w.model()
    out["evals"] = model.solve_all(kpts)
    out["consistency_dev"] = np.abs(out["evals"] - ene).max()
    filt = w.model(zero_energy=0.05, min_hopping_norm=0.02,
                   max_distance=5.0, ignorable_imaginary_part=2e-5)
    out["evals_filtered"] = filt.solve_all(kpts)
    out["nhop_filtered"] = float(len(filt._hoppings))
    return out


# Vendored copy of the reference distribution's silicon Wannier90 dataset
# (reference website/local/w90_example/example_a) so the flagship ab-initio
# regression no longer depends on the reference tree at test time.
W90_DATA_DIR = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")
W90_SYNTH_DIR = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_synthetic")
