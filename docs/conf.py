"""Sphinx configuration for the bayesgm-tpu documentation site.

Mirrors the reference's doc-site structure (/root/reference/docs/source/
conf.py: autodoc + autosummary + napoleon over the package, markdown
support, mocked heavyweight backends) re-targeted at this repo's layout:
the markdown pages in docs/ ARE the content, parsed via myst_parser.

Build (requires sphinx + myst-parser, not shipped in the dev image —
see docs/BUILDING.md):

    sphinx-build -b html docs docs/_build/html
"""

import os
import sys
from datetime import datetime
from pathlib import Path

HERE = Path(__file__).parent.resolve()
REPO_ROOT = HERE.parent
sys.path.insert(0, str(REPO_ROOT))

project = "bayesgm-tpu"
author = "bayesgm-tpu developers"
copyright = f"{datetime.now():%Y}, {author}"
html_title = "bayesgm-tpu Documentation"
master_doc = "index"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

autosummary_generate = True
autodoc_member_order = "bysource"
napoleon_google_docstring = False
napoleon_numpy_docstring = True
napoleon_use_param = True

# Keep autodoc importable on doc builders without a TPU/JAX runtime.
if os.environ.get("READTHEDOCS") == "True" or os.environ.get("BAYESGM_DOCS_MOCK"):
    autodoc_mock_imports = ["jax", "jaxlib", "numpy", "yaml", "tqdm"]

exclude_patterns = ["_build", "tutorials/executed/*"]

html_theme = os.environ.get("BAYESGM_DOCS_THEME", "alabaster")
