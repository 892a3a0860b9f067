"""Stacked-regression benchmark: blend overhead on top of per-space fits.

Stacking (models/stacking.py) costs S alpha searches + F x S grouped
refits + the per-voxel simplex QPs. This records the end-to-end wall at
north-star-like shapes and how it splits between the per-space machinery
(which any per-space analysis pays anyway) and the blend itself (QP
accumulation + FISTA), so PARITY can state what the interpretable simplex
weights cost over fitting the spaces separately.

Run: python benchmarks/stacking_bench.py [--surface|--whole_brain]
Writes benchmarks/stacking_tpu.json.
"""

import argparse
import json
import logging
import os
import time

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--whole_brain", action="store_true",
                        help="V=95556 instead of fsaverage5 20484")
    parser.add_argument("--t", type=int, default=26880)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "stacking_tpu.json"))
    args = parser.parse_args()

    # 3 spaces: LM (GPT-2 768 x 4 delays), speech-ish (512 x 4), wordrate
    # (1 x 4) — the driver's banded config shape, blended instead.
    T, TP, A, F, CHUNK = args.t, 2048, 10, 5, 20
    BAND_DIMS = [3072, 2048, 4]
    V = 95556 if args.whole_brain else 20484

    from _artifacts import ensure_backend

    # Probe BEFORE the data build: a retry loop on a flapping tunnel must
    # fail in seconds, not after the build.
    ensure_backend()  # fail fast instead of hanging on a down tunnel

    rng = np.random.default_rng(0)
    print("building data...", flush=True)
    Xs = [rng.normal(size=(T, d)).astype(np.float32) / np.sqrt(d)
          for d in BAND_DIMS]
    X_tests = [rng.normal(size=(TP, d)).astype(np.float32) / np.sqrt(d)
               for d in BAND_DIMS]
    mix = [(rng.normal(size=(d, V)) / np.sqrt(d)).astype(np.float32) * w
           for d, w in zip(BAND_DIMS, (1.0, 0.5, 0.1))]
    Y = sum(X @ m for X, m in zip(Xs, mix))
    Y = (Y + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    y_test = sum(X @ m for X, m in zip(X_tests, mix))
    y_test = (y_test + 0.5 * rng.normal(size=(TP, V))).astype(np.float32)
    alphas = np.logspace(-1, 8, A)

    import jax

    from litcoder_core_tpu.models.stacking import fit_stacked_ridge

    Xs = list(jax.device_put(tuple(Xs)))
    X_tests = list(jax.device_put(tuple(X_tests)))
    Y, y_test = jax.device_put((Y, y_test))
    jax.block_until_ready((Y, y_test))

    def fit():
        return fit_stacked_ridge(
            Xs, Y, X_tests=X_tests, y_test=y_test, alphas=alphas,
            n_inner_folds=F, chunk_length=CHUNK, seed=0,
        )

    print("stacked fit (cold: compile + compute)...", flush=True)
    t0 = time.perf_counter()
    m, w, _ = fit()
    cold = time.perf_counter() - t0
    print("stacked fit (warm)...", flush=True)
    t0 = time.perf_counter()
    m, w, _ = fit()
    warm = time.perf_counter() - t0

    results = {
        "T": T, "V": V, "band_dims": BAND_DIMS, "alphas": A,
        "inner_folds": F, "platform": jax.devices()[0].platform,
        "cold_s": round(cold, 2), "warm_s": round(warm, 2),
        "median_r": round(m["median_score"], 4),
        "per_space_median_r": [
            round(float(np.median(p)), 4) for p in m["per_space_test_r"]
        ],
        "median_weight_per_space": [
            round(float(np.median(w[:, s])), 3) for s in range(len(Xs))
        ],
        # The promised cost split: per-space machinery (any per-space
        # analysis pays it anyway) vs the blend itself (QP + FISTA).
        "stages_warm": {k: round(v, 2)
                        for k, v in m.get("stage_seconds", {}).items()},
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
