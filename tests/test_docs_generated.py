"""Generated-docs freshness: docs/API_REFERENCE.md and docs/GALLERY.md
are rendered from the LIVE docstrings by tools/gen_api_docs.py (the
reference ships a Sphinx autodoc site, pythtb website/source/usage.rst;
this repo's frozen environment has no Sphinx, so a stdlib generator +
this drift test plays that role).  If this test fails, run

    python tools/gen_api_docs.py

and commit the result."""

import pathlib
import sys

DOCS = pathlib.Path(__file__).resolve().parents[1] / "docs"
TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"


def _gen():
    sys.path.insert(0, str(TOOLS))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)
    return gen_api_docs


def test_api_reference_is_current():
    gen = _gen()
    assert (DOCS / "API_REFERENCE.md").read_text() == gen.generate_api()


def test_gallery_is_current():
    gen = _gen()
    assert (DOCS / "GALLERY.md").read_text() == gen.generate_gallery()


def test_reference_covers_public_api():
    """Every public name of the core modules appears in the reference."""
    import pythtb_tpu
    from pythtb_tpu import flows, magnetic, surface, wannier

    text = (DOCS / "API_REFERENCE.md").read_text()
    for mod in (flows, magnetic, surface, wannier):
        for name in mod.__all__:
            assert ("`%s(" % name) in text or ("`%s`" % name) in text, name


def test_public_functions_are_exported():
    """Every module-level public function in the documented modules
    must appear in that module's __all__ -- the generated API
    reference enumerates __all__, so an omission silently undocuments
    a public API (a review finding: seven flows functions were
    missing)."""
    import inspect

    import pythtb_tpu.dynamics
    import pythtb_tpu.entanglement
    import pythtb_tpu.flows
    import pythtb_tpu.floquet
    import pythtb_tpu.geometry
    import pythtb_tpu.impurity
    import pythtb_tpu.magnetic
    import pythtb_tpu.negf
    import pythtb_tpu.optical
    import pythtb_tpu.realspace
    import pythtb_tpu.surface
    import pythtb_tpu.unfold

    mods = [
        pythtb_tpu.flows, pythtb_tpu.geometry, pythtb_tpu.dynamics,
        pythtb_tpu.impurity, pythtb_tpu.optical, pythtb_tpu.realspace,
        pythtb_tpu.surface, pythtb_tpu.magnetic, pythtb_tpu.unfold,
        pythtb_tpu.entanglement, pythtb_tpu.floquet, pythtb_tpu.negf,
    ]
    missing = []
    for mod in mods:
        exported = set(getattr(mod, "__all__", []))
        for name, obj in vars(mod).items():
            if name.startswith("_") or not inspect.isfunction(obj):
                continue
            if obj.__module__ != mod.__name__:
                continue  # re-imports, not this module's API
            if name not in exported:
                missing.append("%s.%s" % (mod.__name__, name))
    assert not missing, "public functions missing from __all__: %s" % missing
