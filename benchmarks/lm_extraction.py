"""LM feature-extraction throughput: batched + prefix-chain vs per-text loop.

The reference extracts features ONE TEXT AT A TIME, recomputing the full
prefix for every word (reference encoding/features/language_model.py:103-118)
— O(n_words^2) token work on fullcontext stimuli. Ours batches
length-bucketed windows through jitted Flax forwards and serves every
member of a prefix chain from one causal forward
(features/language_model.py). This benchmark measures both on the SAME
model and stimuli and reports window throughput.

Run: python benchmarks/lm_extraction.py [--n_words 512] [--d_model 256]
Prints one JSON line.
"""

import argparse
import json
import time

import numpy as np


from litcoder_core_tpu.utils.testing import HashStubTokenizer


def build_fullcontext_stimuli(n_words: int, lookback_words: int = 128):
    """Growing-prefix context windows like base_processor fullcontext."""
    rng = np.random.default_rng(0)
    words = [f"w{rng.integers(0, 400)}" for _ in range(n_words)]
    return [" ".join(words[max(0, i + 1 - lookback_words): i + 1])
            for i in range(n_words)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_words", type=int, default=512)
    parser.add_argument("--d_model", type=int, default=256)
    parser.add_argument("--n_layer", type=int, default=4)
    parser.add_argument("--n_head", type=int, default=4)
    parser.add_argument("--gpt2_small", action="store_true",
                        help="GPT-2-small shape (768/12/12, random "
                             "weights) — the north-star extraction config")
    parser.add_argument("--out", default=None,
                        help="append the JSON record to this artifact file")
    args = parser.parse_args()
    if args.gpt2_small:
        args.d_model, args.n_layer, args.n_head = 768, 12, 12

    from transformers import FlaxGPT2Model, GPT2Config

    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model = FlaxGPT2Model(
        GPT2Config(vocab_size=600, n_positions=256, n_embd=args.d_model,
                   n_layer=args.n_layer, n_head=args.n_head),
        seed=0,
    )
    stimuli = build_fullcontext_stimuli(args.n_words)

    def make(prefix_sharing, batch_size, dtype="float32", depth=4):
        return LanguageModelFeatureExtractor({
            "model_name": "bench-gpt2", "model": model,
            "tokenizer": HashStubTokenizer(), "batch_size": batch_size,
            "prefix_sharing": prefix_sharing, "dtype": dtype,
            "pipeline_depth": depth,
        })

    def timed(ex, tag):
        # Warm on the FULL stimuli set: prefix chains length-bucket their
        # windows, so a short warm run leaves the large buckets' programs
        # uncompiled and the timed region pays tunnel compiles — this put
        # a spurious 9x slowdown on the bf16 row once (fp32 rows had
        # round-old cache hits; bf16/batch-256 signatures did not).
        ex.extract_all_layers(stimuli)
        t0 = time.perf_counter()
        out = ex.extract_all_layers(stimuli)
        np.asarray(out[0]).sum()  # force
        return time.perf_counter() - t0, out, dict(ex.last_stage_seconds)

    # Reference style: one window per forward, no sharing.
    t_loop, _, _ = timed(make(False, 1, depth=1), "per-text loop")
    # Batched, no prefix sharing.
    t_batch, _, _ = timed(make(False, 64), "batched")
    # Batched + prefix chains, fully synchronous dispatch (the round-4
    # behavior): isolates what the pipelining alone buys.
    t_sync, _, _ = timed(make(True, 64, depth=1), "chains sync")
    # Batched + prefix chains (the default for causal models).
    t_chain, out32, stages32 = timed(make(True, 64), "prefix chains")
    # bf16 forward compute (dtype='bfloat16'): the opt-in extraction fast
    # path — 2x MXU throughput + half the weight/activation HBM traffic.
    t_bf16, out16, _ = timed(make(True, 64, "bfloat16"), "bf16 chains")
    # Everything on: bf16 + wide batch + deep pipeline (per-layer pooling
    # keeps peak HBM flat, so the batch can grow).
    t_best, _, stages_best = timed(
        make(True, 256, "bfloat16", depth=8), "bf16 wide deep")
    last = max(out32)
    a, b = np.asarray(out32[last]), np.asarray(out16[last])
    bf16_rel_err = float(np.linalg.norm(a - b)
                         / max(np.linalg.norm(a), 1e-6))

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax

    n = args.n_words
    rec = {
        "metric": "lm_extraction_windows_per_sec",
        "n_windows": n,
        "d_model": args.d_model, "n_layer": args.n_layer,
        "platform": jax.devices()[0].platform,
        "per_text_loop_sec": round(t_loop, 2),
        "batched_sec": round(t_batch, 2),
        "prefix_chain_sec": round(t_chain, 2),
        "batched_speedup": round(t_loop / t_batch, 1),
        "prefix_chain_speedup": round(t_loop / t_chain, 1),
        "windows_per_sec": round(n / t_chain, 1),
        "sync_dispatch_sec": round(t_sync, 2),
        "pipeline_speedup_vs_sync": round(t_sync / t_chain, 2),
        "bf16_sec": round(t_bf16, 2),
        "bf16_windows_per_sec": round(n / t_bf16, 1),
        "bf16_speedup_vs_fp32": round(t_chain / t_bf16, 2),
        "bf16_final_layer_rel_err": round(bf16_rel_err, 4),
        # bf16 + batch 256 + pipeline depth 8: the sweep configuration.
        "best_sec": round(t_best, 2),
        "best_windows_per_sec": round(n / t_best, 1),
        # Host-side split of the default run: time blocked on the device
        # (fetch_wait) vs host work overlapped with it (prep/tokenize).
        "stage_breakdown": stages32,
        "stage_breakdown_best": stages_best,
    }
    print(json.dumps(rec))
    if args.out:
        from _artifacts import append_records

        append_records(args.out, [rec])


if __name__ == "__main__":
    main()
