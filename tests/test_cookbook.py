"""Execute every python block in docs/cookbook.md.

The cookbook is the user-facing API tour; running its blocks verbatim
(in order, in one shared namespace, like a reader pasting them into a
session) keeps the recipes from rotting as the API moves."""

import re
from pathlib import Path

COOKBOOK = Path(__file__).resolve().parents[1] / "docs" / "cookbook.md"


def test_cookbook_blocks_execute(tmp_path, monkeypatch):
    text = COOKBOOK.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert len(blocks) >= 7, "cookbook lost blocks?"
    # recipes write demo captures under /tmp/cookbook_*; isolate them
    src = "\n\n".join(blocks).replace("/tmp/cookbook_", str(tmp_path) + "/")
    ns = {}
    exec(compile(src, str(COOKBOOK), "exec"), ns)  # noqa: S102
    assert ns["res"].sxx_dbfs is not None
    assert len(ns["results"]) == 2
