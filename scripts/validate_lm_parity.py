#!/usr/bin/env python3
"""TransformerLens-parity contingency harness (runnable when checkpoints
exist).

The reference extracts ``blocks.{i}.hook_resid_pre`` from a real pretrained
GPT-2 via TransformerLens (reference
encoding/features/language_model.py:32,145) and builds context windows with
a real GPT-2 tokenizer's encode/truncate/decode round-trip (reference
encoding/assembly/base_processor.py:119-148). This environment has no
network egress and no local checkpoints, so the rebuild's parity claims are
structural (resid_pre of block i == hidden_states[i]) plus flax<->torch on
random weights (tests/test_cross_backend_parity.py). This script closes the
gap THE MOMENT real artifacts are available — mirror of
validate_realdata.py for data parity.

Checks:
  1. resid_pre parity: for each requested layer i, TransformerLens
     ``run_with_cache``'s ``blocks.{i}.hook_resid_pre`` must equal the
     hidden_states[i] our extractor reads from the HF model (same
     checkpoint), per token, within --atol.
  2. tokenizer round-trip: the reference's context-window construction
     (join last `lookback` words -> encode -> keep LAST `lookback` tokens
     -> decode, base_processor.py:119-148) must produce IDENTICAL strings
     to our BaseAssemblyGenerator._process_fullcontext given the same
     tokenizer and word stream.

Usage:
  python scripts/validate_lm_parity.py --hf_path /path/to/gpt2 \
      [--tl_name gpt2] [--layers 0 5 9] [--atol 1e-4] [--lookback 256]

Exit codes: 0 = parity holds; 1 = MISMATCH; 2 = dependencies or
checkpoints unavailable (instructions printed).
"""

import argparse
import json
import os
import sys

# Run straight from a checkout even when the package isn't pip-installed.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "I think therefore I am",
    "once upon a time in a galaxy far far away",
]


def reference_context_windows(words, lookback, tokenizer):
    """The reference's fullcontext recipe, restated from its spec
    (base_processor.py:119-148): per non-empty word, join the preceding
    `lookback` words, tokenizer.encode, keep the LAST `lookback` tokens on
    overflow, decode, strip; empty words yield empty stimuli."""
    words = [str(w) for w in words]
    out = []
    for i, w in enumerate(words):
        if w == "":
            out.append("")
            continue
        text = " ".join(words[max(0, i - lookback):i + 1])
        tokens = tokenizer.encode(text, add_special_tokens=False)
        if len(tokens) > lookback:
            tokens = tokens[-lookback:]
            text = tokenizer.decode(tokens)
        out.append(text.strip())
    return out


def check_tokenizer_roundtrip(tokenizer, words, lookback):
    """Compare the reference recipe against OUR context builder on the same
    word stream. Returns (ok, n_mismatch, first_mismatch_or_None)."""
    import pandas as pd

    from litcoder_core_tpu.assembly.base_processor import (
        BaseAssemblyGenerator,
    )

    class _Probe(BaseAssemblyGenerator):
        def __init__(self, tok):
            self._tok = tok
            self.context_type = "fullcontext"
            self.lookback = lookback

        @property
        def tokenizer(self):  # bypass the from_pretrained download
            return self._tok

        def _discover_stories(self, subject_dir):
            return []

        def generate_assembly(self, *a, **kw):
            raise NotImplementedError  # probe only builds stimuli

    transcript = pd.DataFrame({"word_orig": list(words)})
    ours = _Probe(tokenizer).generate_stimuli_with_context(
        transcript, lookback
    )
    ref = reference_context_windows(list(words), lookback, tokenizer)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(ours, ref))
                  if a != b]
    if len(ours) != len(ref):
        return False, abs(len(ours) - len(ref)), ("length", len(ours),
                                                  len(ref))
    return (not mismatches, len(mismatches),
            mismatches[0] if mismatches else None)


def check_resid_pre(tl_model, hf_hidden_states_fn, tokenizer, texts, layers,
                    atol):
    """For each text and layer i: TransformerLens hook_resid_pre[i] vs the
    HF hidden_states[i] our extractor consumes.

    Args:
        tl_model: object with ``run_with_cache(tokens)`` returning
            (logits, cache) where cache["blocks.{i}.hook_resid_pre"] is
            (1, T, d).
        hf_hidden_states_fn: callable(token_id_list) -> list/tuple of
            (1, T, d) hidden states (index i == resid_pre of block i).
        tokenizer: .encode(text) -> ids.
    Returns (ok, report dict).
    """
    import numpy as np

    report = {}
    ok = True
    for text in texts:
        ids = tokenizer.encode(text)
        hs = hf_hidden_states_fn(ids)
        import torch

        _, cache = tl_model.run_with_cache(
            torch.tensor([ids], dtype=torch.long)
        )
        for i in layers:
            tl = np.asarray(
                cache[f"blocks.{i}.hook_resid_pre"].detach().cpu()
            ).astype(np.float32)
            our = np.asarray(hs[i], np.float32)
            d = float(np.max(np.abs(tl - our)))
            report[f"layer{i}/{text[:20]}"] = d
            if d > atol:
                ok = False
    return ok, report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf_path", required=True,
                        help="local HF GPT-2 checkpoint dir (flax or torch "
                             "weights + tokenizer files)")
    parser.add_argument("--tl_name", default="gpt2",
                        help="TransformerLens model name; weights load from "
                             "--hf_path via hf_model=")
    parser.add_argument("--layers", type=int, nargs="+", default=[0, 5, 9])
    parser.add_argument("--atol", type=float, default=1e-4)
    parser.add_argument("--lookback", type=int, default=256)
    args = parser.parse_args()

    try:
        import transformer_lens  # noqa: F401
    except ImportError:
        print(
            "transformer_lens is not installed in this environment "
            "(no network egress). Install it plus a local GPT-2 checkpoint "
            "and re-run.",
            file=sys.stderr,
        )
        return 2
    if not os.path.isdir(args.hf_path):
        print(f"checkpoint dir {args.hf_path} not found", file=sys.stderr)
        return 2

    import numpy as np
    import torch
    from transformer_lens import HookedTransformer
    from transformers import AutoTokenizer, GPT2Model

    tokenizer = AutoTokenizer.from_pretrained(args.hf_path)
    hf_torch = GPT2Model.from_pretrained(args.hf_path)
    hf_torch.eval()
    tl_model = HookedTransformer.from_pretrained(
        args.tl_name, hf_model=hf_torch, tokenizer=tokenizer
    )

    def hf_hidden_states(ids):
        with torch.no_grad():
            out = hf_torch(torch.tensor([ids]), output_hidden_states=True)
        return [np.asarray(h) for h in out.hidden_states]

    ok_resid, report = check_resid_pre(
        tl_model, hf_hidden_states, tokenizer, TEXTS, args.layers, args.atol
    )
    words = " ".join(TEXTS).split() * 40  # long enough to overflow lookback
    ok_tok, n_bad, first = check_tokenizer_roundtrip(
        tokenizer, words, args.lookback
    )

    print(json.dumps({
        "resid_pre_max_abs_diff": report,
        "tokenizer_roundtrip_mismatches": n_bad,
        "tokenizer_first_mismatch": repr(first) if first else None,
    }, indent=2))
    status = "PASS" if (ok_resid and ok_tok) else "MISMATCH"
    print(f"{status}: resid_pre={'ok' if ok_resid else 'DIVERGED'} "
          f"(atol {args.atol}), tokenizer_roundtrip="
          f"{'ok' if ok_tok else f'{n_bad} mismatches'}")
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
