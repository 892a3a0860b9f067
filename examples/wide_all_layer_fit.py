"""All-layer JOINT fit — a wide design (D > T) through the dual solver.

The reference sweeps layers one at a time (one fit per layer, cf.
litcoder_core_tpu.sweeps.run_layer_sweep); concatenating EVERY layer into
one design asks a different question — "what does the whole network
predict jointly?" — and makes the design WIDE: n_layers * d_model *
n_delays features against a few thousand training TRs. `method='auto'`
detects the shape and runs the dual (kernel-ridge) Cholesky search
(K = X X^T factored instead of the (D, D) Gram; see docs/performance.rst
"Dual (kernel-ridge) search for WIDE designs").

Offline end to end: a tiny randomly initialized Flax GPT-2 and the stub
tokenizer stand in for real checkpoints (no network egress), exactly like
the test suite.

Run: python examples/wide_all_layer_fit.py          # TPU or CPU
     JAX_PLATFORMS=cpu python examples/wide_all_layer_fit.py
"""

import logging
import os

import numpy as np

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

logging.basicConfig(level=logging.INFO)


def main():
    from transformers import FlaxGPT2Model, GPT2Config

    from litcoder_core_tpu import FIR, fit_nested_cv
    from litcoder_core_tpu.downsample import Downsampler
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )
    from litcoder_core_tpu.utils.testing import HashStubTokenizer

    rng = np.random.default_rng(0)

    # --- extract EVERY layer in one batched forward pass -------------------
    model = FlaxGPT2Model(
        GPT2Config(vocab_size=600, n_positions=128, n_embd=64,
                   n_layer=8, n_head=4),
        seed=0,
    )
    extractor = LanguageModelFeatureExtractor({
        "model_name": "tiny-gpt2", "model": model,
        "tokenizer": HashStubTokenizer(), "last_token": True,
    })
    words = [f"word{i}" for i in range(900)]
    contexts = [" ".join(words[max(0, i - 16):i + 1])
                for i in range(len(words))]
    per_layer = extractor.extract_all_layers(contexts)
    layers = sorted(per_layer)
    feats = np.concatenate([per_layer[i] for i in layers], axis=1)
    print(f"{len(layers)} layers concatenated -> {feats.shape[1]} dims")

    # --- downsample to TRs, FIR-expand: the design goes WIDE ---------------
    data_times = np.cumsum(rng.uniform(0.2, 0.5, len(words))).astype(
        np.float32
    )
    tr = 2.0
    n_trs = int(data_times[-1] / tr)
    tr_times = (np.arange(n_trs, dtype=np.float32) * tr + tr / 2)
    X = Downsampler().downsample(feats.astype(np.float32), data_times,
                                 tr_times, method="lanczos", window=3,
                                 cutoff_mult=1.0)
    X = FIR.make_delayed(X, [1, 2, 3, 4])
    T, D = X.shape
    print(f"design: T={T} TRs x D={D} features (wide: D > T = {D > T})")

    # --- synthetic responses + the dual fit ---------------------------------
    V = 512
    wt = (rng.normal(size=(D, V)) / np.sqrt(D)).astype(np.float32)
    Y = (X @ wt + 0.2 * rng.normal(size=(T, V))).astype(np.float32)
    split = int(T * 0.8)
    metrics, _, best_alphas = fit_nested_cv(
        X[:split], Y[:split], X_test=X[split:], y_test=Y[split:],
        alphas=np.logspace(-1, 6, 8), n_inner_folds=4, chunk_length=5,
        seed=0, return_weights=False,
    )
    # INFO log shows: "alpha search path: dual cholesky (kernel-ridge; ...)"
    print(f"median r = {metrics['median_score']:.3f}, "
          f"{metrics['n_significant']}/{V} significant, "
          f"{np.unique(best_alphas).size} distinct alphas selected")


if __name__ == "__main__":
    main()
