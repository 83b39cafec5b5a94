"""Structural checks on the sphinx doc tree (docs/conf.py + index.rst).

Sphinx itself is not installed in this image (docs/BUILDING.md), so this
validates what a build would consume: conf.py executes, every toctree entry
resolves to a real page, and every autosummary'd module imports.
"""

import importlib
import re
from pathlib import Path

DOCS = Path(__file__).resolve().parent.parent / "docs"


def test_conf_executes_and_declares_markdown_support():
    ns = {"__file__": str(DOCS / "conf.py")}
    exec(compile((DOCS / "conf.py").read_text(), "conf.py", "exec"), ns)
    assert ns["project"] == "bayesgm-tpu"
    assert "myst_parser" in ns["extensions"]
    assert "sphinx.ext.autodoc" in ns["extensions"]
    assert ns["source_suffix"][".md"] == "markdown"


def _toctree_entries(rst_text):
    entries = []
    in_toctree = False
    for line in rst_text.splitlines():
        if line.strip().startswith(".. toctree::"):
            in_toctree = True
            continue
        if in_toctree:
            s = line.strip()
            if not s:
                continue
            if s.startswith(":"):
                continue
            if line.startswith((" ", "\t")):
                entries.append(s)
            else:
                in_toctree = False
    return entries


def test_index_toctree_pages_exist():
    entries = _toctree_entries((DOCS / "index.rst").read_text())
    assert len(entries) >= 10
    for e in entries:
        assert (DOCS / f"{e}.md").exists() or (DOCS / f"{e}.rst").exists(), e


def test_apidoc_modules_import():
    text = (DOCS / "apidoc" / "index.rst").read_text()
    mods = re.findall(r"^   (bayesgm_tpu[\w.]*)$", text, re.M)
    assert len(mods) >= 15
    for m in mods:
        importlib.import_module(m)
