"""Speech feature-extraction throughput: batched windows vs per-window loop.

The reference runs one full encoder forward per 0.1 s stride window
(reference encoding/features/speech_model.py:208-245); ours materializes
all sliding windows as one strided batch and runs jitted Flax forwards
(features/speech_model.py). This measures both on the same model/audio.

Run: python benchmarks/speech_extraction.py [--seconds 30] [--out PATH]
Prints one JSON line; --out appends it to an artifact file.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=int, default=30)
    parser.add_argument("--context_size", type=float, default=4.0)
    parser.add_argument("--chunk_size", type=float, default=0.25)
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import tempfile

    from scipy.io import wavfile
    from transformers import (
        FlaxWav2Vec2Model,
        Wav2Vec2Config,
        Wav2Vec2FeatureExtractor,
    )

    from litcoder_core_tpu.features.speech_model import SpeechFeatureExtractor

    cfg = Wav2Vec2Config(
        hidden_size=args.hidden, num_hidden_layers=args.layers,
        num_attention_heads=8, intermediate_size=4 * args.hidden,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    model = FlaxWav2Vec2Model(cfg, seed=0)
    fe = Wav2Vec2FeatureExtractor()

    sr = 16000
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.normal(size=args.seconds * sr)).astype(np.float32)
    tmp = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
    wavfile.write(tmp.name, sr, wav)

    def make(batch_size, dtype="float32"):
        return SpeechFeatureExtractor(
            model_name="bench-w2v2", chunk_size=args.chunk_size,
            context_size=args.context_size, pool="last",
            target_sample_rate=sr, batch_size=batch_size, model=model,
            feature_extractor=fe, disable_tqdm=True, dtype=dtype,
        )

    def timed(ex):
        feats, times = ex.extract_features(tmp.name, layer="last")
        n = feats.shape[0]
        t0 = time.perf_counter()
        feats, _ = ex.extract_features(tmp.name, layer="last")
        np.asarray(feats).sum()  # force
        return time.perf_counter() - t0, n

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax

    t_loop, n = timed(make(1))     # reference style: one window per forward
    t_batch, _ = timed(make(args.batch_size))
    # bf16 encoder compute: the opt-in extraction fast path.
    t_bf16, _ = timed(make(args.batch_size, "bfloat16"))

    rec = {
        "metric": "speech_extraction_windows_per_sec",
        "n_windows": n,
        "hidden": args.hidden, "layers": args.layers,
        "context_s": args.context_size, "stride_s": args.chunk_size,
        "platform": jax.devices()[0].platform,
        "per_window_loop_sec": round(t_loop, 2),
        "batched_sec": round(t_batch, 2),
        "batched_speedup": round(t_loop / t_batch, 1),
        "windows_per_sec": round(n / t_batch, 1),
        "bf16_sec": round(t_bf16, 2),
        "bf16_windows_per_sec": round(n / t_bf16, 1),
        "bf16_speedup_vs_fp32": round(t_batch / t_bf16, 2),
    }
    print(json.dumps(rec))
    os.unlink(tmp.name)
    if args.out:
        from _artifacts import append_records

        append_records(args.out, [rec])


if __name__ == "__main__":
    main()
