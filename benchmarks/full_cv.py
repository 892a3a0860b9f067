"""Full nested-CV benchmark: fused outer-fold streaming vs per-fold path.

Full-CV (validation_method='inner') is the reference default for
Narratives/LPP (SURVEY.md §2.1); the reference recomputes every
cross-product per outer fold (encoding/models/nested_cv.py:173-331). The
fused path computes one union Gram/XtY and downdates per fold
(models/nested_cv.py:_full_cv_fused_eligible and friends).

Run: python benchmarks/full_cv.py [--whole_brain] [--fast_scan]
Writes benchmarks/full_cv_tpu.json (the PARITY.md artifact).

Memory note (v5e 16 GB): whole-brain full-CV holds Y (~10 GB) plus two
(D, V) XtY buffers; the UNFUSED path additionally gathers y_train copies
(~8 GB) per fold, which does not fit — whole-brain runs measure the fused
path only and that is the honest comparison: fused is what makes
whole-brain full-CV fit on one chip at all.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--whole_brain", action="store_true",
                        help="V=95556 (fused path only; see memory note)")
    parser.add_argument("--fast_scan", action="store_true")
    parser.add_argument("--d", type=int, default=3072)
    parser.add_argument("--voxel_chunk", type=int, default=None,
                        help="stream voxel chunks through the fused "
                             "kernels (whole-brain default: 8192)")
    args = parser.parse_args()
    if args.whole_brain and args.voxel_chunk is None:
        args.voxel_chunk = 8192  # unchunked (., V) transients exceed HBM

    T, A, F_OUT, F_IN, CHUNK = 26880, 10, 5, 5, 20
    D = args.d
    V = 95556 if args.whole_brain else 20484

    rng = np.random.default_rng(0)
    print("building data...", flush=True)
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = (rng.normal(size=(D, 256)) / np.sqrt(D)).astype(np.float32)
    mix = rng.normal(size=(256, V)).astype(np.float32) / 16
    Y = (X @ wt @ mix
         + rng.normal(size=(T, V)).astype(np.float32)).astype(np.float32)
    alphas = np.logspace(-1, 8, A)

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax

    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    def fit(Xd, Yd, method):
        return fit_nested_cv(
            Xd, Yd, chunk_length=CHUNK, n_outer_folds=F_OUT,
            n_inner_folds=F_IN, alphas=alphas, seed=0, method=method,
            fast_scan=args.fast_scan, return_weights=False,
            voxel_chunk_size=args.voxel_chunk,
        )

    Xd, Yd = jax.device_put((X, Y))
    jax.block_until_ready((Xd, Yd))

    results = {"T": T, "D": D, "V": V, "alphas": A,
               "outer_folds": F_OUT, "inner_folds": F_IN,
               "fast_scan": args.fast_scan,
               "voxel_chunk": args.voxel_chunk,
               "platform": jax.devices()[0].platform}

    print("fused full-CV (cold: compile + compute)...", flush=True)
    t0 = time.perf_counter()
    m_fused, _, _ = fit(Xd, Yd, "auto")
    results["fused_cold_s"] = round(time.perf_counter() - t0, 2)
    print("fused full-CV (warm)...", flush=True)
    t0 = time.perf_counter()
    m_fused, _, _ = fit(Xd, Yd, "auto")
    results["fused_warm_s"] = round(time.perf_counter() - t0, 2)
    results["fused_median_r"] = round(float(m_fused["median_score"]), 4)
    print(f"fused: cold={results['fused_cold_s']}s "
          f"warm={results['fused_warm_s']}s "
          f"median r={results['fused_median_r']}", flush=True)

    if not args.whole_brain:
        print("per-fold full-CV (method='eigh', cold)...", flush=True)
        t0 = time.perf_counter()
        m_ref, _, _ = fit(Xd, Yd, "eigh")
        results["perfold_cold_s"] = round(time.perf_counter() - t0, 2)
        print("per-fold full-CV (warm)...", flush=True)
        t0 = time.perf_counter()
        m_ref, _, _ = fit(Xd, Yd, "eigh")
        results["perfold_warm_s"] = round(time.perf_counter() - t0, 2)
        results["perfold_median_r"] = round(float(m_ref["median_score"]), 4)
        results["speedup_warm"] = round(
            results["perfold_warm_s"] / results["fused_warm_s"], 2
        )
        results["median_r_abs_diff"] = round(abs(
            results["fused_median_r"] - results["perfold_median_r"]), 6)
        print(f"per-fold: warm={results['perfold_warm_s']}s; "
              f"fused speedup {results['speedup_warm']}x", flush=True)

    from _artifacts import append_records, artifact_path

    append_records(artifact_path(__file__, "full_cv_tpu.json"), [results])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
