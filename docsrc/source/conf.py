# Sphinx configuration for gpyreg_tpu.
#
# Mirrors the reference's docs pipeline in spirit
# (/root/reference/docsrc/source/conf.py): autodoc over the public
# modules, napoleon for numpy-style docstrings, built by CI
# (.github/workflows/docs.yml) and published to gh-pages.

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "gpyreg_tpu"
copyright = "2026, gpyreg_tpu developers"
author = "gpyreg_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

# The heavy runtime deps aren't needed to render signatures.
autodoc_mock_imports = ["jax", "jaxlib", "optax", "matplotlib"]

templates_path = ["_templates"]
exclude_patterns = []

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "scipy": ("https://docs.scipy.org/doc/scipy/", None),
}

html_theme = "alabaster"
html_static_path = []
