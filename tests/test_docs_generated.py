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
