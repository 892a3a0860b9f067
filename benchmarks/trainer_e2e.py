"""End-to-end trainer wall on TPU: the pipeline number a user experiences.

Component benchmarks (northstar.py = fit only, lm_extraction.py =
extraction only, fused_lanczos_fir.py = one stage) can hide inter-stage
host round trips; nothing before this measured the composed
`AbstractTrainer.train()` wall (VERDICT r4 weak #3). This runs the
reference's primary call stack (SURVEY §3.1,
/root/reference/encoding/trainer.py:284-320) at LeBel scale — 25 train
stories + 1 held-out test story, V=20484 fsaverage5 — with a random
tiny-GPT-2 LM extractor + wordrate through fused downsample-FIR,
device-resident structuring, and the nested-CV ridge fit, and records the
trainer's own stage split (extract / structure / fit / log+save).

Stimuli are LeBel-style fullcontext windows (growing word prefixes,
host-truncated to `--lookback_words`, the token-budget analogue of the
reference's lookback=256); brain data carries word-rate-driven signal so
the fit produces a meaningful median r.

Run: python benchmarks/trainer_e2e.py [--tiny] [--stories N] [--v V]
Appends a row to benchmarks/trainer_e2e_tpu.json (unless --tiny).
"""

import argparse
import json
import os
import tempfile
import time
import zlib

import numpy as np

from litcoder_core_tpu.utils.testing import HashStubTokenizer


def make_story(name, n_trs, n_vox, words_per_tr, rng_global):
    """Synthetic story: word times over TRs, brain = delayed word-rate
    signal + noise (same construction as the e2e tests, LeBel shapes)."""
    from litcoder_core_tpu.assembly.story_data import StoryData

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    n_words = int(n_trs * words_per_tr)
    tr = 2.0
    tr_times = np.arange(n_trs) * tr + tr / 2
    data_times = np.sort(rng.uniform(0, n_trs * tr, n_words))
    split_indices = np.clip((data_times // tr).astype(int), 0, n_trs - 1)
    word_rates = np.bincount(split_indices,
                             minlength=n_trs).astype(np.float32)
    delayed = np.stack([np.roll(word_rates, d) for d in [1, 2, 3, 4]],
                       axis=1).astype(np.float32)
    brain = (delayed @ rng_global["wt"]
             + rng.normal(size=(n_trs, n_vox))).astype(np.float32)
    words = [f"w{rng.integers(0, 400)}" for _ in range(n_words)]
    return StoryData(
        name=name, brain_data=brain, stimuli=words,
        split_indices=split_indices.tolist(), tr_times=tr_times,
        data_times=data_times, word_rates=word_rates, words=words,
    )


def add_fullcontext_stimuli(story, lookback_words):
    """Replace per-word stimuli with LeBel-style growing context windows."""
    words = story.words
    story.stimuli = [
        " ".join(words[max(0, i + 1 - lookback_words): i + 1])
        for i in range(len(words))
    ]
    return story


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="smoke shapes on the current backend; no "
                             "artifact write")
    parser.add_argument("--stories", type=int, default=26,
                        help="total stories (last one is the test story)")
    parser.add_argument("--trs", type=int, default=1075)
    parser.add_argument("--v", type=int, default=20484)
    parser.add_argument("--words_per_tr", type=float, default=3.2)
    parser.add_argument("--lookback_words", type=int, default=64)
    parser.add_argument("--d_model", type=int, default=256)
    parser.add_argument("--n_layer", type=int, default=4)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "trainer_e2e_tpu.json"))
    args = parser.parse_args()
    if args.tiny:
        args.stories, args.trs, args.v = 3, 60, 32
        args.d_model, args.n_layer = 32, 2
        args.words_per_tr = 2.0

    if args.tiny:
        # Smoke mode runs anywhere, instantly: force the CPU backend (the
        # env var would be ignored by the tunneled TPU plugin — CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from _artifacts import ensure_backend

        ensure_backend()  # fail fast on a down tunnel

    from transformers import FlaxGPT2Model, GPT2Config

    from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
    from litcoder_core_tpu.downsample.downsampling import Downsampler
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )
    from litcoder_core_tpu.models.nested_cv import NestedCVModel
    from litcoder_core_tpu.trainer import AbstractTrainer

    print("building assembly...", flush=True)
    shared = {"wt": np.random.default_rng(99).normal(
        size=(4, args.v)).astype(np.float32)}
    stories = [
        add_fullcontext_stimuli(
            make_story(f"story{i:02d}", args.trs, args.v,
                       args.words_per_tr, shared),
            args.lookback_words)
        for i in range(args.stories)
    ]
    assembly = SimpleNeuroidAssembly(stories, validation_method="outer")
    n_windows = sum(len(s.stimuli) for s in stories)

    lm = FlaxGPT2Model(
        GPT2Config(vocab_size=600, n_positions=256, n_embd=args.d_model,
                   n_layer=args.n_layer, n_head=4),
        seed=0,
    )
    with tempfile.TemporaryDirectory() as tmp:
        lm_extractor = FeatureExtractorFactory.create_extractor(
            modality="language_model", model_name="tiny-gpt2-random",
            config={
                "model": lm, "tokenizer": HashStubTokenizer(),
                "batch_size": 64, "last_token": True,
            },
            cache_dir=os.path.join(tmp, "cache"),
        )
        wordrate = FeatureExtractorFactory.create_extractor(
            modality="wordrate", model_name="wordrate", config={},
            cache_dir=os.path.join(tmp, "cache"),
        )
        trainer = AbstractTrainer(
            assembly=assembly,
            feature_extractors=[lm_extractor, wordrate],
            downsampler=Downsampler(),
            model=NestedCVModel(model_name="ridge_regression", seed=0),
            fir_delays=[1, 2, 3, 4],
            # Symmetric trimming: synthetic stories have features ==
            # targets rows (the real LeBel constants assume the pickle's
            # 10/5-TR feature padding; cf. tests/test_trainer_e2e.py).
            trimming_config={
                "train_features_start": 10, "train_features_end": -5,
                "train_targets_start": 10, "train_targets_end": -5,
                "test_features_start": 10, "test_features_end": -5,
                "test_targets_start": 10, "test_targets_end": -5,
            },
            use_train_test_split=True,
            layer_idx=args.n_layer - 1,
            dataset_type="lebel",
            logger_backend="none",
            results_dir=os.path.join(tmp, "results"),
            downsample_config={"method": "lanczos", "window": 3,
                               "cutoff_mult": 1.0},
        )
        print(f"training: {args.stories} stories, {n_windows} LM windows, "
              f"V={args.v}...", flush=True)
        t0 = time.perf_counter()
        metrics = trainer.train(chunk_length=20)
        wall = time.perf_counter() - t0

    import jax

    stages = {k: round(v, 2)
              for k, v in metrics.get("trainer_stage_seconds", {}).items()}
    row = {
        "metric": "trainer_e2e_wall_seconds",
        "stories": args.stories, "trs_per_story": args.trs, "V": args.v,
        "lm_windows": n_windows, "d_model": args.d_model,
        "n_layer": args.n_layer, "lookback_words": args.lookback_words,
        "platform": jax.devices()[0].platform,
        "wall_s": round(wall, 2),
        "stages_s": stages,
        "lm_windows_per_sec": round(
            n_windows / stages.get("extract_downsample_fir_fused", wall), 1),
        "median_r": round(float(metrics["median_score"]), 4),
        "n_significant": int(metrics.get("n_significant", -1)),
        "solver_paths": metrics.get("solver_paths"),
    }
    print(json.dumps(row), flush=True)
    if not args.tiny:
        from _artifacts import append_records

        append_records(args.out, [row])


if __name__ == "__main__":
    main()
