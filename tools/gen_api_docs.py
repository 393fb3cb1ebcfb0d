#!/usr/bin/env python
"""Generate docs/API_REFERENCE.md and docs/GALLERY.md from the source.

The reference ships a Sphinx site autodoc'd from docstrings; this repo
cannot install Sphinx (frozen environment), so this generator renders
the same information -- every public signature and its LIVE docstring --
to Markdown with stdlib ``inspect`` only.  A test regenerates both
files and fails on any drift, so the committed reference can never go
stale against the code (the failure mode of the old hand-written
API.md).

Run from the repo root:  python tools/gen_api_docs.py
"""

import inspect
import io
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (title, module path, optional explicit name list)
SECTIONS = [
    ("Top-level package", "pythtb_tpu", ["tb_model", "wf_array", "w90", "PythtbError"]),
    ("pythtb_tpu.flows — fused device pipelines", "pythtb_tpu.flows", None),
    ("pythtb_tpu.wannier — Wannier interpolation / MLWF", "pythtb_tpu.wannier", None),
    ("pythtb_tpu.magnetic — Peierls substitution", "pythtb_tpu.magnetic", None),
    ("pythtb_tpu.surface — semi-infinite surfaces", "pythtb_tpu.surface", None),
    ("pythtb_tpu.realspace — disordered-sample topology & transport", "pythtb_tpu.realspace", None),
    ("pythtb_tpu.optical — optical response", "pythtb_tpu.optical", None),
    ("pythtb_tpu.geometry — quantum geometric tensor", "pythtb_tpu.geometry", None),
    ("pythtb_tpu.dynamics — real-time evolution", "pythtb_tpu.dynamics", None),
    ("pythtb_tpu.impurity — defect embedding / T-matrix", "pythtb_tpu.impurity", None),
    ("pythtb_tpu.meanfield — self-consistent mean field", "pythtb_tpu.meanfield", None),
    ("pythtb_tpu.ed — exact diagonalization", "pythtb_tpu.ed", None),
    ("pythtb_tpu.dmft — dynamical mean-field theory", "pythtb_tpu.dmft", None),
    ("pythtb_tpu.continuation — analytic continuation", "pythtb_tpu.continuation", None),
    ("pythtb_tpu.exciton — Bethe-Salpeter excitons", "pythtb_tpu.exciton", None),
    ("pythtb_tpu.response — Lindhard / RPA susceptibility", "pythtb_tpu.response", None),
    ("pythtb_tpu.magnon — linear spin-wave theory", "pythtb_tpu.magnon", None),
    ("pythtb_tpu.bdg — Bogoliubov-de Gennes superconductors", "pythtb_tpu.bdg", None),
    ("pythtb_tpu.disorder — coherent-potential approximation", "pythtb_tpu.disorder", None),
    ("pythtb_tpu.boltzmann — semiclassical transport", "pythtb_tpu.boltzmann", None),
    ("pythtb_tpu.fermisurface — Fermi-surface tools", "pythtb_tpu.fermisurface", None),
    ("pythtb_tpu.localization — Anderson / quasiperiodic localization", "pythtb_tpu.localization", None),
    ("pythtb_tpu.phonon — lattice dynamics", "pythtb_tpu.phonon", None),
    ("pythtb_tpu.eph — electron-phonon coupling", "pythtb_tpu.eph", None),
    ("pythtb_tpu.symmetry — symmetry analysis", "pythtb_tpu.symmetry", None),
    ("pythtb_tpu.negf — Landauer transport", "pythtb_tpu.negf", None),
    ("pythtb_tpu.floquet — time-periodic driving", "pythtb_tpu.floquet", None),
    ("pythtb_tpu.unfold — band unfolding", "pythtb_tpu.unfold", None),
    ("pythtb_tpu.entanglement — entanglement spectra", "pythtb_tpu.entanglement", None),
    ("pythtb_tpu.family — structural parameter sweeps", "pythtb_tpu.family", None),
    ("pythtb_tpu.parallel — device meshes", "pythtb_tpu.parallel.mesh", None),
    ("pythtb_tpu.models — model zoo", "pythtb_tpu.models.library", None),
    ("pythtb_tpu.models.moire — twisted bilayers", "pythtb_tpu.models.moire", None),
    ("pythtb_tpu.models.quasicrystal — aperiodic generators", "pythtb_tpu.models.quasicrystal", None),
    ("pythtb_tpu.utils.serialization — checkpoints", "pythtb_tpu.utils.serialization", None),
    ("pythtb_tpu.utils.profiling — timing helpers", "pythtb_tpu.utils.profiling", None),
]


def _doc(obj):
    d = inspect.getdoc(obj)
    return d if d else "(no docstring)"


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _emit_callable(out, name, obj, level):
    out.write("%s `%s%s`\n\n" % ("#" * level, name, _sig(obj)))
    out.write(_doc(obj) + "\n\n")


def _emit_class(out, name, cls, level):
    out.write("%s class `%s%s`\n\n" % ("#" * level, name, _sig(cls.__init__)))
    out.write(_doc(cls) + "\n\n")
    members = []
    for mname, m in vars(cls).items():
        if mname.startswith("_") and mname != "__getitem__":
            continue
        if isinstance(m, property):
            members.append((mname, m.fget, "property"))
        elif callable(m):
            members.append((mname, m, "method"))
        elif isinstance(m, (staticmethod, classmethod)):
            members.append((mname, m.__func__, "method"))
    for mname, m, kind in sorted(members):
        if kind == "property":
            out.write("%s property `%s.%s`\n\n" % ("#" * (level + 1), name, mname))
        else:
            out.write("%s `%s.%s%s`\n\n" % ("#" * (level + 1), name, mname, _sig(m)))
        out.write(_doc(m) + "\n\n")


def generate_api():
    import importlib

    out = io.StringIO()
    out.write(
        "# pythtb_tpu API reference\n\n"
        "GENERATED from the live docstrings by `tools/gen_api_docs.py` --\n"
        "do not edit by hand (the test suite regenerates and diffs this\n"
        "file).  For the narrative guide see `docs/tutorial.md`; for the\n"
        "physics formulations see `docs/formalism.md`.\n\n"
    )
    for title, modpath, names in SECTIONS:
        mod = importlib.import_module(modpath)
        out.write("## %s\n\n" % title)
        mdoc = inspect.getdoc(mod)
        if mdoc:
            out.write(mdoc + "\n\n")
        if names is None:
            names = list(getattr(mod, "__all__", None) or [
                n for n in vars(mod)
                if not n.startswith("_")
                and getattr(getattr(mod, n), "__module__", None) == modpath
            ])
        for name in names:
            obj = getattr(mod, name)
            if inspect.isclass(obj):
                _emit_class(out, name, obj, 3)
            elif callable(obj):
                _emit_callable(out, name, obj, 3)
            else:
                out.write("### `%s`\n\n%s\n\n" % (name, repr(obj)))
    return out.getvalue()


def generate_gallery():
    examples = pathlib.Path(__file__).resolve().parents[1] / "examples"
    out = io.StringIO()
    out.write(
        "# Example gallery\n\n"
        "GENERATED from the example module docstrings by\n"
        "`tools/gen_api_docs.py`.  Every script below runs in the test\n"
        "suite (`tests/test_examples_run.py`) and saves its figure(s) to\n"
        "the working directory; run any of them directly:\n"
        "`python examples/<name>.py`.\n\n"
    )
    import ast

    for path in sorted(examples.glob("*.py")):
        tree = ast.parse(path.read_text())
        doc = ast.get_docstring(tree) or "(no docstring)"
        out.write("## `%s`\n\n%s\n\n" % (path.name, doc))
    return out.getvalue()


def main():
    docs = pathlib.Path(__file__).resolve().parents[1] / "docs"
    (docs / "API_REFERENCE.md").write_text(generate_api())
    (docs / "GALLERY.md").write_text(generate_gallery())
    print("wrote docs/API_REFERENCE.md and docs/GALLERY.md")


if __name__ == "__main__":
    main()
