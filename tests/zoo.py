"""Model zoo shared by parity tests and golden-data generation.

Each factory takes a module (`pythtb_tpu` or the reference `pythtb`)
exposing a ``tb_model`` class, so identical models can be built against
both implementations.  Parameters follow the reference examples
(/root/reference/examples/) so the committed goldens correspond to the
reference's own workloads.
"""

import numpy as np


def graphene(mod, delta=0.0, t=-1.0):
    """2-band honeycomb (examples/graphene.py)."""
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = mod.tb_model(2, 2, lat, orb)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    return m


def haldane(mod, delta=0.2, t=-1.0, t2mag=0.15, phi=np.pi / 2.0):
    """Chern insulator (examples/haldane.py:23-40)."""
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = mod.tb_model(2, 2, lat, orb)
    t2 = t2mag * np.exp(1.0j * phi)
    m.set_onsite([-delta, delta])
    m.set_hop(t, 0, 1, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2, 0, 0, lv)
    for lv in ([1, 0], [-1, 1], [0, -1]):
        m.set_hop(t2.conjugate(), 1, 1, lv)
    return m


def checkerboard(mod, delta=1.1, t=0.6):
    """2-band checkerboard (examples/checkerboard.py)."""
    m = mod.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0], [0.5, 0.5]])
    m.set_onsite([-delta, delta])
    m.set_hop(t, 1, 0, [0, 0])
    m.set_hop(t, 1, 0, [1, 0])
    m.set_hop(t, 1, 0, [0, 1])
    m.set_hop(t, 1, 0, [1, 1])
    return m


def trestle(mod, t1=0.8 + 0.6j, t2=2.0):
    """dim_k=1 < dim_r=2 ladder with complex hops (examples/trestle.py)."""
    m = mod.tb_model(1, 2, [[2.0, 0.0], [0.0, 1.0]], [[0.0, 0.0], [0.5, 1.0]], per=[0])
    m.set_hop(t2 + 0.0j, 0, 0, [1, 0])
    m.set_hop(t2 + 0.0j, 1, 1, [1, 0])
    m.set_hop(t1, 0, 1, [0, 0])
    m.set_hop(t1, 1, 0, [1, 0])
    return m


def molecule(mod):
    """dim_k=0 NH3-like molecule (examples/0dim.py)."""
    lat = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    orb = [[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    m = mod.tb_model(0, 3, lat, orb)
    m.set_onsite([-1.3, -0.4, -0.4, -0.4])
    m.set_hop(0.0 + 0.2j, 0, 1)
    m.set_hop(0.0 - 0.2j, 0, 2)
    m.set_hop(0.0 + 0.2j, 0, 3)
    m.set_hop(-0.05, 1, 2)
    m.set_hop(-0.05, 2, 3)
    m.set_hop(-0.05, 3, 1)
    return m


def buckled_layer(mod, t=-1.0):
    """dim_k=2, dim_r=3 buckled square layer (examples/buckled_layer.py)."""
    lat = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    orb = [[0.0, 0.0, 0.0], [0.5, 0.5, 0.3]]
    m = mod.tb_model(2, 3, lat, orb, per=[0, 1])
    m.set_onsite([-0.5, 0.5])
    m.set_hop(t, 0, 1, [0, 0, 0])
    m.set_hop(t, 1, 0, [1, 0, 0])
    m.set_hop(t, 1, 0, [0, 1, 0])
    m.set_hop(t, 1, 0, [1, 1, 0])
    return m


def kane_mele(mod, topological="odd"):
    """Spinful Z2 insulator (examples/kane_mele.py:23-45)."""
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = mod.tb_model(2, 2, lat, orb, nspin=2)
    esite = 2.5 if topological == "even" else 1.0
    thop = 1.0
    spin_orb = 0.6 * thop * 0.5
    rashba = 0.25 * thop
    m.set_onsite([esite, (-1.0) * esite])
    m.set_hop(thop, 0, 1, [0, 0])
    m.set_hop(thop, 0, 1, [0, -1])
    m.set_hop(thop, 0, 1, [-1, 0])
    sz = np.array([0.0, 0.0, 0.0, 1.0])
    m.set_hop(-1.0j * spin_orb * sz, 0, 0, [0, 1])
    m.set_hop(1.0j * spin_orb * sz, 0, 0, [1, 0])
    m.set_hop(-1.0j * spin_orb * sz, 0, 0, [1, -1])
    m.set_hop(1.0j * spin_orb * sz, 1, 1, [0, 1])
    m.set_hop(-1.0j * spin_orb * sz, 1, 1, [1, 0])
    m.set_hop(1.0j * spin_orb * sz, 1, 1, [1, -1])
    r3h = np.sqrt(3.0) / 2.0
    sx = np.array([0.0, 1.0, 0.0, 0.0])
    sy = np.array([0.0, 0.0, 1.0, 0.0])
    m.set_hop(1.0j * rashba * (0.5 * sx - r3h * sy), 0, 1, [0, 0], mode="add")
    m.set_hop(1.0j * rashba * (-1.0 * sx), 0, 1, [0, -1], mode="add")
    m.set_hop(1.0j * rashba * (0.5 * sx + r3h * sy), 0, 1, [-1, 0], mode="add")
    return m


def three_site(mod, lmbd, t=-1.3, delta=2.0):
    """1-D three-site pump chain at parameter lambda
    (examples/3site_cycle.py)."""
    m = mod.tb_model(1, 1, [[1.0]], [[0.0], [1.0 / 3.0], [2.0 / 3.0]])
    m.set_hop(t, 0, 1, [0])
    m.set_hop(t, 1, 2, [0])
    m.set_hop(t, 2, 0, [1])
    ons = [delta * np.cos(2.0 * np.pi * (lmbd - i / 3.0)) for i in range(3)]
    m.set_onsite(ons)
    return m


def cubic_3d(mod, t=-1.0, soc=0.0):
    """Simple cubic single-orbital 3D model (examples/cubic_slab_hwf.py)."""
    lat = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    m = mod.tb_model(3, 3, lat, [[0.0, 0.0, 0.0]])
    m.set_hop(t, 0, 0, [1, 0, 0])
    m.set_hop(t, 0, 0, [0, 1, 0])
    m.set_hop(t, 0, 0, [0, 0, 1])
    return m


def graphene_path(m, nk=61):
    return m.k_path(
        [[0.0, 0.0], [2.0 / 3.0, 1.0 / 3.0], [0.5, 0.5], [0.0, 0.0]], nk, report=False
    )


def kane_mele_bilayer(mod, topo_a="odd", topo_b="odd", tperp=0.15):
    """Two weakly-coupled Kane-Mele layers: a gapped spinful model with
    FOUR occupied bands (nsta = 8), for exercising general-nocc Wilson
    flows and Z2 (reference workload shape: examples/kane_mele.py scaled
    up).  Z2 of the 4-band occupied manifold is the mod-2 sum of the
    layer invariants: odd+odd -> 0, odd+even -> 1."""
    lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
    base = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
    m = mod.tb_model(2, 2, lat, base + base, nspin=2)
    thop, rashba = 1.0, 0.25
    r3h = np.sqrt(3.0) / 2.0
    sz = np.array([0.0, 0.0, 0.0, 1.0])
    sx = np.array([0.0, 1.0, 0.0, 0.0])
    sy = np.array([0.0, 0.0, 1.0, 0.0])
    ons = []
    for layer, topo in ((0, topo_a), (1, topo_b)):
        o = 2 * layer  # orbital offset of this layer
        esite = 2.5 if topo == "even" else 1.0
        spin_orb = 0.6 * thop * 0.5
        ons += [esite, -esite]
        m.set_hop(thop, o, o + 1, [0, 0])
        m.set_hop(thop, o, o + 1, [0, -1])
        m.set_hop(thop, o, o + 1, [-1, 0])
        m.set_hop(-1.0j * spin_orb * sz, o, o, [0, 1])
        m.set_hop(1.0j * spin_orb * sz, o, o, [1, 0])
        m.set_hop(-1.0j * spin_orb * sz, o, o, [1, -1])
        m.set_hop(1.0j * spin_orb * sz, o + 1, o + 1, [0, 1])
        m.set_hop(-1.0j * spin_orb * sz, o + 1, o + 1, [1, 0])
        m.set_hop(1.0j * spin_orb * sz, o + 1, o + 1, [1, -1])
        m.set_hop(1.0j * rashba * (0.5 * sx - r3h * sy), o, o + 1, [0, 0], mode="add")
        m.set_hop(1.0j * rashba * (-1.0 * sx), o, o + 1, [0, -1], mode="add")
        m.set_hop(1.0j * rashba * (0.5 * sx + r3h * sy), o, o + 1, [-1, 0], mode="add")
    m.set_onsite(ons)
    # weak spin-conserving interlayer coupling (keeps the gap open)
    m.set_hop(tperp, 0, 2, [0, 0])
    m.set_hop(tperp, 1, 3, [0, 0])
    return m
