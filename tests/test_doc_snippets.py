"""Every ```python block in docs/API.md must run (they share one
namespace, in document order) -- the API reference stays honest."""

import io
import pathlib
import re
from contextlib import redirect_stdout

import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "API.md"


def _blocks():
    text = DOC.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.mark.slow
def test_api_doc_snippets_run(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # snippets may write files (model.pdf)
    blocks = _blocks()
    assert len(blocks) >= 10, "expected a snippet-rich API doc"
    # file paths in snippets are repo-relative
    repo = str(DOC.parents[1])
    ns = {}
    for i, code in enumerate(blocks):
        code = code.replace('"tests/data/w90_synthetic"',
                            '"%s/tests/data/w90_synthetic"' % repo)
        try:
            with redirect_stdout(io.StringIO()):
                exec(compile(code, "API.md block %d" % i, "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            pytest.fail("API.md snippet %d failed: %s\n---\n%s" % (i, e, code))
