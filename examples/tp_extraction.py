"""Tensor-parallel feature extraction + fully device-resident training.

Demonstrates the two round-2 multi-chip/TPU features end to end on
synthetic data (no downloads, runs on the virtual CPU mesh too):

1. an LM whose parameters are sharded Megatron-style over a 2-D
   ('data', 'model') mesh (`parallel.tp`) — the route to extracting
   features from models larger than one chip's HBM;
2. a trainer pipeline where the fused Lanczos+FIR kernel output stays on
   device through z-score/trim/stack (`device_resident='auto'`).

Run on an 8-device virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/tp_extraction.py
"""

import os

import numpy as np

import jax

# The tunneled TPU plugin ignores the JAX_PLATFORMS env var; only
# jax.config reliably selects the CPU backend for the virtual mesh.
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def make_assembly(n_stories=3, n_trs=80, n_vox=64, seed=0):
    from litcoder_core_tpu import SimpleNeuroidAssembly, StoryData

    rng = np.random.default_rng(seed)
    weights = rng.normal(size=(4, n_vox)).astype(np.float32)
    stories = []
    for i in range(n_stories):
        n_words = n_trs * 3
        tr_times = np.arange(n_trs) * 2.0 + 1.0
        data_times = np.sort(rng.uniform(0, n_trs * 2.0, n_words))
        split = np.clip((data_times // 2.0).astype(int), 0, n_trs - 1)
        rates = np.bincount(split, minlength=n_trs).astype(np.float32)
        delayed = np.stack([np.roll(rates, d) for d in (1, 2, 3, 4)], 1)
        brain = (delayed.astype(np.float32) @ weights
                 + rng.normal(size=(n_trs, n_vox)).astype(np.float32))
        words = [f"w{rng.integers(0, 400)}" for _ in range(n_words)]
        stories.append(StoryData(
            name=f"story{i}", brain_data=brain,
            stimuli=[" ".join(words[max(0, j - 8):j + 1])
                     for j in range(n_words)],
            split_indices=split.tolist(), tr_times=tr_times,
            data_times=data_times, word_rates=rates, words=words,
        ))
    return SimpleNeuroidAssembly(stories, validation_method="outer")


def main():
    from transformers import FlaxGPT2Model, GPT2Config

    from litcoder_core_tpu import AbstractTrainer, Downsampler, NestedCVModel
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.parallel.tp import make_lm_mesh
    from litcoder_core_tpu.utils.testing import HashStubTokenizer

    n = len(jax.devices())
    n_data = 2 if n % 2 == 0 and n >= 2 else 1
    mesh = make_lm_mesh(n_data, n // n_data)
    print(f"extraction mesh: {dict(mesh.shape)} on "
          f"{jax.devices()[0].platform}")

    # A tiny random-init GPT-2 stands in for a large checkpoint; with real
    # weights this is `{"model_name": "gpt2-xl", "mesh": mesh}`.
    model = FlaxGPT2Model(
        GPT2Config(vocab_size=600, n_positions=128, n_embd=32, n_layer=2,
                   n_head=2),
        seed=0,
    )
    extractor = FeatureExtractorFactory.create_extractor(
        modality="language_model", model_name="demo-gpt2",
        config={"model": model, "tokenizer": HashStubTokenizer(), "mesh": mesh,
                "layer_idx": 1},
        cache_dir="cache_demo",
    )

    trainer = AbstractTrainer(
        assembly=make_assembly(),
        feature_extractors=[extractor],
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2, 3, 4],
        trimming_config={"train_features_start": 3, "train_targets_start": 3,
                         "test_features_start": 2, "test_targets_start": 2},
        use_train_test_split=True,
        layer_idx=1,
        logger_backend="none",
        results_dir="results",
        downsample_config={"method": "lanczos", "window": 3,
                           "cutoff_mult": 1.0},
        # Defaults shown explicitly: fused downsample+FIR device kernel,
        # device-resident structuring.
        fused_downsample_fir="auto",
        device_resident="auto",
    )
    metrics = trainer.train(chunk_length=10, n_inner_folds=3)
    print(f"median r = {metrics['median_score']:.3f}, "
          f"significant voxels = {metrics['n_significant']}")


if __name__ == "__main__":
    main()
