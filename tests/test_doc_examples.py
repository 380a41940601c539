"""Every ```python block in docs/reference/*.md must execute cleanly.

The reference ships Sphinx examples that are not doctested; here the
worked examples ARE tests, so the docs cannot rot.
"""

import pathlib
import re

import pytest

DOCS = sorted((pathlib.Path(__file__).resolve().parent.parent
               / "docs" / "reference").glob("*.md"))

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return _BLOCK.findall(path.read_text())


@pytest.mark.parametrize("path", DOCS, ids=lambda p: p.name)
def test_doc_examples_run(path):
    blocks = _blocks(path)
    if not blocks:
        pytest.skip("no python blocks")
    for code in blocks:
        exec(compile(code, str(path), "exec"), {"__name__": "__doc_ex__"})
