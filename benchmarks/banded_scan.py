"""Banded-ridge benchmark: (gamma x alpha) scan cost at north-star scale.

Banded ridge multiplies the alpha scan by n_gammas candidate band-variance
vectors (models/banded.py:fit_banded_ridge); this records where that leaves
the 2-minute north-star envelope for 3 bands at LeBel-like shapes, across
n_gammas in {5, 10, 20}.

Run: python benchmarks/banded_scan.py [--surface|--whole_brain]
Writes benchmarks/banded_scan_tpu.json (the PARITY.md / docs artifact).
"""

import argparse
import json
import logging
import os
import time

import numpy as np


def fit_scaling_law(results):
    """Fit warm_s = intercept + slope * n_gammas over THIS run's rows, with
    sanity guards (VERDICT r3 weak #3: a degraded-tunnel run once published
    a negative-slope law fitted over non-monotonic garbage).

    Refuses to publish when (a) the rows mix configurations (fast_scan /
    voxel_chunk / V / T must match — a law over mixed configs is
    meaningless), (b) warm_s is not non-decreasing in n_gammas (the scan
    term is linear in G; non-monotonic walls mean the measurement, not the
    model, is wrong), or (c) the fitted slope is not positive. Returns a
    record with either warm_s_model/gammas_at_2min or law_rejected."""
    rows = sorted(
        (r for r in results if r.get("metric") ==
         "banded_ridge_fit_wall_seconds"),
        key=lambda r: r["n_gammas"],
    )
    if len(rows) < 2:
        return None
    configs = {(str(r.get("fast_scan")), r.get("voxel_chunk"),
                r["V"], r["T"]) for r in rows}
    if len(configs) > 1:
        return {"metric": "banded_scan_scaling_law",
                "law_rejected": f"mixed configurations: {sorted(configs)}"}
    g = np.array([r["n_gammas"] for r in rows], float)
    w = np.array([r["warm_s"] for r in rows], float)
    if not np.all(np.diff(w) >= 0):
        return {"metric": "banded_scan_scaling_law",
                "law_rejected": "warm_s not monotonic in n_gammas "
                                f"(walls {w.tolist()} at gammas "
                                f"{g.tolist()}); re-measure"}
    slope, intercept = np.polyfit(g, w, 1)
    if slope <= 0:
        return {"metric": "banded_scan_scaling_law",
                "law_rejected": f"non-positive slope {slope:.2f}"}
    return {
        "metric": "banded_scan_scaling_law",
        "warm_s_model": f"{intercept:.1f} + {slope:.2f} * n_gammas",
        "gammas_at_2min": int((120.0 - intercept) / slope),
    }


def main():
    logging.basicConfig(level=logging.INFO)  # solver path + stage reports
    from litcoder_core_tpu.cli import _fast_scan_arg  # shared value parser

    parser = argparse.ArgumentParser()
    parser.add_argument("--whole_brain", action="store_true",
                        help="V=95556 instead of fsaverage5 20484")
    parser.add_argument("--n_gammas", type=int, nargs="+",
                        default=[5, 10, 20])
    parser.add_argument("--t", type=int, default=26880)
    parser.add_argument("--fast_scan", nargs="?", const=True, default=False,
                        type=_fast_scan_arg,
                        help="bf16 scan matmuls (bare flag, 'true'/'false',"
                             " or 'auto' for the guarded calibration mode)")
    parser.add_argument("--voxel_chunk", type=int, default=None,
                        help="stream the scan's voxel work through chunks "
                             "(whole-brain default: 8192)")
    args = parser.parse_args()
    if args.whole_brain and args.voxel_chunk is None:
        args.voxel_chunk = 8192
    fast_scan = args.fast_scan  # already True | False | 'auto'

    # 3 bands: LM (GPT-2 768 x 4 delays), speech-ish (512 x 4), wordrate
    # (1 x 4) — the driver's banded config shape.
    T, TP, A, F, CHUNK = args.t, 2048, 10, 5, 20
    BAND_DIMS = [3072, 2048, 4]
    V = 95556 if args.whole_brain else 20484

    from _artifacts import ensure_backend

    # Probe BEFORE the ~25-min whole-brain data build: a retry loop on a
    # flapping tunnel must fail in seconds, not after the build.
    ensure_backend()  # fail fast instead of hanging on a down tunnel

    rng = np.random.default_rng(0)
    print("building data...", flush=True)
    Xs = [rng.normal(size=(T, d)).astype(np.float32) for d in BAND_DIMS]
    X_tests = [rng.normal(size=(TP, d)).astype(np.float32)
               for d in BAND_DIMS]
    wt = [(rng.normal(size=(d, 128)) / np.sqrt(d)).astype(np.float32)
          for d in BAND_DIMS]
    mix = rng.normal(size=(128, V)).astype(np.float32) / 12
    Y = sum(X @ w for X, w in zip(Xs, wt)) @ mix
    Y = (Y + rng.normal(size=(T, V))).astype(np.float32)
    y_test = sum(X @ w for X, w in zip(X_tests, wt)) @ mix
    y_test = (y_test + rng.normal(size=(TP, V))).astype(np.float32)
    alphas = np.logspace(-1, 8, A)

    import jax

    from litcoder_core_tpu.models.banded import fit_banded_ridge

    if args.whole_brain:
        # Whole-brain HBM budget: the 10 GB response stays HOST-side —
        # fit_banded_ridge's host-streaming mode uploads it as a one-pass
        # (D, V) cross-product plus per-fold val rows (~4 GB resident
        # products), because the device-resident variant peaked within
        # ~1 GB of usable HBM and RESOURCE_EXHAUSTED mid-fit (round-5
        # capture attempts). Features/test arrays also stay host-side.
        # Warm walls therefore include Y crossing the link twice
        # (~20 GB H2D) and the ~1.4 GB feature/test H2D.
        pass
    else:
        Xs = jax.device_put(Xs)
        X_tests = jax.device_put(X_tests)
        Y, y_test = jax.device_put((Y, y_test))
        jax.block_until_ready((Xs, X_tests, Y, y_test))

    results = []
    for n_gammas in args.n_gammas:
        print(f"n_gammas={n_gammas} (cold)...", flush=True)
        t0 = time.perf_counter()
        metrics, _, _, _ = fit_banded_ridge(
            Xs, Y, X_tests=X_tests, y_test=y_test, alphas=alphas,
            n_gammas=n_gammas, n_inner_folds=F, chunk_length=CHUNK, seed=0,
            fast_scan=fast_scan, voxel_chunk_size=args.voxel_chunk,
            # Metrics-only, like northstar.py (the reference's ModelSaver
            # defaults to save_weights=False) — skips the (D, V) fetch.
            return_weights=False,
        )
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        metrics, _, _, _ = fit_banded_ridge(
            Xs, Y, X_tests=X_tests, y_test=y_test, alphas=alphas,
            n_gammas=n_gammas, n_inner_folds=F, chunk_length=CHUNK, seed=0,
            fast_scan=fast_scan, voxel_chunk_size=args.voxel_chunk,
            return_weights=False,
        )
        warm = time.perf_counter() - t0
        rec = {
            "metric": "banded_ridge_fit_wall_seconds",
            "n_gammas": n_gammas, "bands": BAND_DIMS, "T": T, "V": V,
            "alphas": A, "inner_folds": F, "fast_scan": str(fast_scan),
            "voxel_chunk": args.voxel_chunk,
            "platform": jax.devices()[0].platform,
            "cold_s": round(cold, 2), "warm_s": round(warm, 2),
            "median_r": round(float(metrics["median_score"]), 4),
            "within_2min_envelope": warm < 120.0,
            "stages_warm": {k: round(v, 2)
                            for k, v in metrics.get("stage_seconds",
                                                    {}).items()},
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # Scaling law: warm wall vs n_gammas (the scan term is linear in G; the
    # fixed term is folds' factorization + refit). Guarded — see
    # fit_scaling_law.
    law = fit_scaling_law(results)
    if law is not None:
        results.append(law)
        print(json.dumps(law), flush=True)

    from _artifacts import append_records, artifact_path

    append_records(artifact_path(__file__, "banded_scan_tpu.json"), results)


if __name__ == "__main__":
    main()
