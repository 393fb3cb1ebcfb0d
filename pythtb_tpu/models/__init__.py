"""Model zoo: ready-made tight-binding models.

Canonical models from the tight-binding / band-topology literature,
parameterized and documented, covering every model family used by the
reference examples (/root/reference/examples/, SURVEY.md section 2b)
plus the Fu-Kane-Mele 3D strong topological insulator.

Every constructor returns a fresh :class:`pythtb_tpu.tb_model` that can
be further edited (``mode="reset"/"add"``), cut, super-celled, etc.
"""

from .moire import sk_graphene, tbg, tbg_angle
from .quasicrystal import (
    ammann_beenker,
    aubry_andre,
    fibonacci_chain,
    fibonacci_word,
    multigrid_tiling,
    penrose,
    vertex_areas,
)
from .library import (
    apply_strain,
    bbh,
    bhz,
    bn,
    chain,
    checkerboard,
    cscl,
    fu_kane_mele,
    graphene,
    haldane,
    qwz,
    kagome,
    kane_mele,
    lieb,
    molecule_nh3,
    square,
    ssh,
    three_site_chain,
    trestle,
    triaxial_graphene_flake,
    weyl,
)

__all__ = [
    "chain",
    "molecule_nh3",
    "trestle",
    "checkerboard",
    "graphene",
    "bn",
    "haldane",
    "qwz",
    "kane_mele",
    "three_site_chain",
    "cscl",
    "fu_kane_mele",
    "square",
    "ssh",
    "lieb",
    "kagome",
    "bhz",
    "bbh",
    "weyl",
    "tbg",
    "tbg_angle",
    "sk_graphene",
    "apply_strain",
    "triaxial_graphene_flake",
    "multigrid_tiling",
    "penrose",
    "ammann_beenker",
    "aubry_andre",
    "fibonacci_chain",
    "fibonacci_word",
    "vertex_areas",
]
