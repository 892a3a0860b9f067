# Sphinx configuration for litcoder-core-tpu documentation.
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "litcoder-core-tpu"
author = "litcoder-core-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
napoleon_google_docstring = True

templates_path = ["_templates"]
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_static_path = []
