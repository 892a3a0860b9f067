"""Documentation drift guard: every documented symbol must resolve.

The reference's docs name classes that don't exist (RidgeRegressionModel,
docs/models.rst:7; NarrativesAssembly, docs/assemblies.rst:22 — SURVEY.md
§2.1 flags the drift). Sphinx isn't installed here, so instead of building
the site this test imports every dotted litcoder_core_tpu.* name mentioned
anywhere in docs/ and README.md (autosummary entries included)."""

import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_NAME_RE = re.compile(r"\blitcoder_core_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+")
# `from litcoder_core_tpu.x import a, b` / `from litcoder_core_tpu import (
#     a, b)` in doc code blocks — the names most README/tutorial snippets
# actually use. The import list may span lines inside parentheses.
_FROM_RE = re.compile(
    r"from\s+(litcoder_core_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s+import\s+"
    r"(\([^)]*\)|[^\n]+)"
)


def _documented_names():
    names = set()
    doc_files = [os.path.join(REPO, "README.md")]
    docs_dir = os.path.join(REPO, "docs")
    doc_files += [
        os.path.join(docs_dir, f) for f in os.listdir(docs_dir)
        if f.endswith(".rst")
    ]
    for path in doc_files:
        with open(path) as f:
            text = f.read()
        for m in _NAME_RE.finditer(text):
            names.add(m.group(0))
        for m in _FROM_RE.finditer(text):
            module, imports = m.group(1), m.group(2)
            imports = imports.strip("()")
            for item in imports.split(","):
                item = item.strip().split(" as ")[0].strip()
                if item and item.isidentifier():
                    names.add(f"{module}.{item}")
    assert len(names) > 60  # the docs really do name the API surface
    return sorted(names)


def _resolve(dotted: str):
    parts = dotted.split(".")
    # Longest importable module prefix, then getattr the rest.
    for split in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        for attr in parts[split:]:
            obj = getattr(obj, attr)  # AttributeError = drift
        return obj
    raise ImportError(dotted)


@pytest.mark.parametrize("name", _documented_names())
def test_documented_symbol_resolves(name):
    assert _resolve(name) is not None
