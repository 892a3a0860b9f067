"""North-star benchmark: LeBel-UTS03-GPT-2-shaped whole-brain nested-CV fit.

Shapes per BASELINE.md: ~27k train TRs, 2k test TRs, D=3072 (GPT-2-small
768 x 4 FIR delays), V=95556 whole-brain voxels, 10 alphas, 5 inner folds.
Reports cold (transfers + compile + compute) and warm (device-resident,
compiled) wall times for the target "full fit < 2 min on one v5e".

Run: python benchmarks/northstar.py [--surface]  (--surface: V=20484)
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--surface", action="store_true",
                        help="fsaverage5 V=20484 instead of whole-brain")
    parser.add_argument("--voxel_chunk", type=int, default=4096)
    parser.add_argument("--fast_scan", action="store_true",
                        help="alpha-scan prediction matmuls at default MXU "
                             "precision (bf16 passes, fp32 accumulate) — "
                             "alpha SELECTION tolerates this; refit and "
                             "final scoring stay full precision")
    parser.add_argument("--significance", default="parametric",
                        choices=["parametric", "permutation"],
                        help="'permutation' = on-device circular-shift "
                             "nulls (the north-star's 'permutation "
                             "significance on-device')")
    parser.add_argument("--n_permutations", type=int, default=1000)
    parser.add_argument("--out", default=None,
                        help="append the JSON record to this artifact file")
    args = parser.parse_args()

    T, TP, D, A, F, CHUNK = 26880, 2048, 3072, 10, 5, 20
    V = 20484 if args.surface else 95556

    rng = np.random.default_rng(0)
    print("building data...", flush=True)
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = (rng.normal(size=(D, 256)) / np.sqrt(D)).astype(np.float32)
    mix = rng.normal(size=(256, V)).astype(np.float32) / 16
    Y = (X @ wt @ mix
         + rng.normal(size=(T, V)).astype(np.float32)).astype(np.float32)
    X_test = rng.normal(size=(TP, D)).astype(np.float32)
    Y_test = (X_test @ wt @ mix
              + rng.normal(size=(TP, V)).astype(np.float32)
              ).astype(np.float32)
    alphas = np.logspace(-1, 8, A)

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax

    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    def fit(Xd, Yd, Xtd, Ytd):
        return fit_nested_cv(
            Xd, Yd, X_test=Xtd, y_test=Ytd, chunk_length=CHUNK,
            n_inner_folds=F, alphas=alphas, seed=0,
            voxel_chunk_size=args.voxel_chunk, method="auto",
            fast_scan=args.fast_scan,
            # Metrics-only (the reference's ModelSaver likewise defaults to
            # save_weights=False) — skips the GB-scale weight fetch.
            return_weights=False,
            significance=args.significance,
            n_permutations=args.n_permutations,
        )

    print("cold fit (transfers + compile + compute)...", flush=True)
    t0 = time.perf_counter()
    metrics, _, _ = fit(X, Y, X_test, Y_test)
    cold = time.perf_counter() - t0
    print(f"cold: {cold:.1f}s  median r={metrics['median_score']:.3f} "
          f"n_sig={metrics['n_significant']}/{V}", flush=True)

    print("warm fit (device-resident, compiled)...", flush=True)
    Xd, Yd, Xtd, Ytd = jax.device_put((X, Y, X_test, Y_test))
    jax.block_until_ready((Xd, Yd, Xtd, Ytd))
    t0 = time.perf_counter()
    metrics, _, _ = fit(Xd, Yd, Xtd, Ytd)
    warm = time.perf_counter() - t0
    print(f"warm: {warm:.1f}s  median r={metrics['median_score']:.3f}",
          flush=True)
    print(f"NORTHSTAR cold={cold:.1f}s warm={warm:.1f}s V={V}", flush=True)
    if args.out:
        import json
        import os

        rec = {
            "metric": "northstar_fit_wall_seconds",
            "T": T, "TP": TP, "D": D, "V": V, "alphas": A,
            "inner_folds": F, "fast_scan": args.fast_scan,
            "significance": args.significance,
            "n_permutations": (args.n_permutations
                               if args.significance == "permutation"
                               else None),
            "platform": jax.devices()[0].platform,
            "cold_s": round(cold, 1), "warm_s": round(warm, 1),
            "median_r": round(float(metrics["median_score"]), 4),
            "n_significant": int(metrics["n_significant"]),
        }
        from _artifacts import append_records

        append_records(args.out, [rec])


if __name__ == "__main__":
    main()
