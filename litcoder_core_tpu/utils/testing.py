"""Offline test/benchmark doubles.

This environment has no network egress, so examples, benchmarks, and the
driver dry run exercise the LM pipeline with randomly initialized Flax
models and this stub tokenizer instead of downloaded checkpoints (tests
use the same pattern; cf. CLAUDE.md environment notes).
"""


import hashlib


class HashStubTokenizer:
    """Deterministic whitespace tokenizer: stable ids via md5(word).

    Implements exactly the tokenizer surface the LM extractor touches
    (encode + the three special-token ids). Ids come from a stable digest,
    not Python's salted str hash(), so disk-cached features and benchmark
    numbers reproduce across processes regardless of PYTHONHASHSEED.
    """

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def encode(self, text):
        return [
            3 + int(hashlib.md5(w.encode()).hexdigest(), 16) % 500
            for w in text.split()
        ]
