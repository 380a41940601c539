"""Every ```python block in docs/reference/ and docs/user_guide/ must
execute cleanly.

The reference ships Sphinx examples and notebooks that are not
doctested; here the worked examples ARE tests, so the docs cannot rot.
Blocks within one file share a namespace (like notebook cells).
"""

import pathlib
import re

import pytest

_DOCS_ROOT = pathlib.Path(__file__).resolve().parent.parent / "docs"
DOCS = sorted(_DOCS_ROOT.glob("reference/*.md")) + \
    sorted(_DOCS_ROOT.glob("user_guide/*.md"))

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return _BLOCK.findall(path.read_text())


@pytest.mark.parametrize("path", DOCS,
                         ids=lambda p: f"{p.parent.name}/{p.name}")
def test_doc_examples_run(path):
    blocks = _blocks(path)
    if not blocks:
        pytest.skip("no python blocks")
    ns = {"__name__": "__doc_ex__"}
    for code in blocks:
        exec(compile(code, str(path), "exec"), ns)
