"""Plumbing tests for scripts/validate_lm_parity.py with stub models (the
real run needs a TransformerLens install + local GPT-2 checkpoint; see the
script docstring and PARITY.md)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "validate_lm_parity.py")

spec = importlib.util.spec_from_file_location("validate_lm_parity", SCRIPT)
vlp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vlp)


class SpaceTokenizer:
    """Whitespace 'tokenizer' whose decode inverts encode exactly."""

    def __init__(self):
        self.vocab = {}
        self.rev = {}

    def encode(self, text, add_special_tokens=False):
        ids = []
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab)
                self.rev[self.vocab[w]] = w
            ids.append(self.vocab[w])
        return ids

    def decode(self, ids):
        return " ".join(self.rev[i] for i in ids)


def test_tokenizer_roundtrip_matches_reference_recipe():
    words = [f"w{i % 7}" for i in range(50)] + ["", "w1"]
    ok, n_bad, first = vlp.check_tokenizer_roundtrip(
        SpaceTokenizer(), words, lookback=8
    )
    assert ok, first
    assert n_bad == 0


def test_reference_recipe_truncates_to_lookback():
    tok = SpaceTokenizer()
    words = [f"u{i}" for i in range(30)]
    windows = vlp.reference_context_windows(words, 5, tok)
    # Every window holds at most lookback tokens after truncation.
    assert all(len(tok.encode(w)) <= 5 for w in windows)
    assert windows[0] == "u0"
    assert windows[29].split() == words[25:30]


def test_check_resid_pre_detects_divergence():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    layers = [0, 1]
    d = 4

    def make_states(ids, jitter=0.0):
        base = rng.normal(size=(3, 1, len(ids), d)).astype(np.float32)
        return base + jitter

    states = {}

    class StubTL:
        def run_with_cache(self, tokens):
            ids = tuple(tokens[0].tolist())
            cache = {
                f"blocks.{i}.hook_resid_pre":
                    torch.tensor(states[ids][i])
                for i in layers
            }
            return None, cache

    class StubTok:
        def encode(self, text):
            return [hashable % 11 for hashable in map(len, text.split())]

    tok = StubTok()
    for text in vlp.TEXTS:
        states[tuple(tok.encode(text))] = make_states(tok.encode(text))

    def hf_fn(ids):
        return list(states[tuple(ids)])

    ok, report = vlp.check_resid_pre(StubTL(), hf_fn, tok, vlp.TEXTS,
                                     layers, atol=1e-6)
    assert ok and all(v == 0.0 for v in report.values())

    # Perturb one layer -> must be caught.
    def hf_fn_bad(ids):
        hs = [h.copy() for h in states[tuple(ids)]]
        hs[1] = hs[1] + 1e-2
        return hs

    ok_bad, report_bad = vlp.check_resid_pre(StubTL(), hf_fn_bad, tok,
                                             vlp.TEXTS, layers, atol=1e-4)
    assert not ok_bad
    assert max(report_bad.values()) > 1e-3


def test_cli_exits_2_without_checkpoint(tmp_path):
    import subprocess

    proc = subprocess.run(
        [sys.executable, SCRIPT, "--hf_path", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
