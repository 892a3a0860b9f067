"""Wide-design (D > T) nested-CV benchmark: dual kernel-ridge vs wide SVD.

Wide designs are the all-layer / large-model regime: concatenating every
GPT-2 layer after FIR expansion gives D = n_layers * d_model * n_delays
(e.g. 12 * 768 * 4 = 36,864) against ~4-27k training TRs. The reference
runs these through one torch SVD of the wide matrix per inner fold
(encoding/models/ridge_utils.py:34-67 inside ridge_corr_torch,
encoding/models/ridge_regression.py:94); the TPU-native dual path factors
the (T, T) kernel matrix instead — one K = X X^T matmul per search plus
per-(fold, alpha) Cholesky solves, zero eigendecompositions
(models/nested_cv.py:_find_best_alphas_dual).

Run: python benchmarks/wide_design.py [--t 4096] [--d 12288] [--v 20484]
Writes benchmarks/wide_design_tpu.json (the PARITY.md artifact).
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--t", type=int, default=4096)
    parser.add_argument("--d", type=int, default=12288)
    parser.add_argument("--v", type=int, default=20484)
    parser.add_argument("--t_test", type=int, default=1024)
    parser.add_argument("--skip_svd", action="store_true",
                        help="measure only the dual path (the wide-SVD "
                             "reference path is minutes-slow at scale)")
    parser.add_argument("--banded", action="store_true",
                        help="wide BANDED scan instead: two bands of d/2, "
                             "dual kernel scan (K_gamma = weighted kernel "
                             "sum) vs the per-(gamma, fold) svd fallback")
    parser.add_argument("--n_gammas", type=int, default=5)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "wide_design_tpu.json"))
    args = parser.parse_args()

    T, D, V, Tp, A, F = args.t, args.d, args.v, args.t_test, 10, 5
    rng = np.random.default_rng(0)
    print("building data...", flush=True)
    X = rng.normal(size=(T, D)).astype(np.float32) / np.sqrt(D)
    wt = (rng.normal(size=(D, 128)) / np.sqrt(D)).astype(np.float32)
    mix = rng.normal(size=(128, V)).astype(np.float32) / 8
    Y = (X @ wt @ mix
         + 0.05 * rng.normal(size=(T, V)).astype(np.float32))
    X_test = rng.normal(size=(Tp, D)).astype(np.float32) / np.sqrt(D)
    Y_test = (X_test @ wt @ mix
              + 0.05 * rng.normal(size=(Tp, V)).astype(np.float32))
    alphas = np.logspace(-1, 8, A)

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax

    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    Xd, Yd, Xtd, Ytd = jax.device_put((X, Y, X_test, Y_test))
    jax.block_until_ready((Xd, Yd, Xtd, Ytd))

    if args.banded:
        from litcoder_core_tpu.models.banded import fit_banded_ridge

        half = D // 2
        Xbs = [Xd[:, :half], Xd[:, half:]]
        Xtbs = [Xtd[:, :half], Xtd[:, half:]]

        def fit(method):
            m, _, a, _g = fit_banded_ridge(
                Xbs, Yd, X_tests=Xtbs, y_test=Ytd, alphas=alphas, seed=0,
                chunk_length=20, n_inner_folds=F, method=method,
                n_gammas=args.n_gammas, return_weights=False,
            )
            return m, a
    else:
        def fit(method):
            m, _, a = fit_nested_cv(
                Xd, Yd, X_test=Xtd, y_test=Ytd, alphas=alphas, seed=0,
                chunk_length=20, n_inner_folds=F, method=method,
                return_weights=False,
            )
            return m, a

    results = {"T": T, "D": D, "V": V, "T_test": Tp, "alphas": A,
               "inner_folds": F,
               "platform": jax.devices()[0].platform}
    if args.banded:
        results["banded"] = True
        results["n_gammas"] = args.n_gammas
        if args.out.endswith("wide_design_tpu.json"):  # default out
            args.out = args.out.replace(".json", "_banded.json")

    print("dual (cold: compile + compute)...", flush=True)
    t0 = time.perf_counter()
    m_dual, a_dual = fit("dual")
    results["dual_cold_s"] = round(time.perf_counter() - t0, 2)
    print("dual (warm)...", flush=True)
    t0 = time.perf_counter()
    m_dual, a_dual = fit("dual")
    results["dual_warm_s"] = round(time.perf_counter() - t0, 2)
    results["dual_median_r"] = round(m_dual["median_score"], 4)
    print(json.dumps({k: results[k] for k in
                      ("dual_cold_s", "dual_warm_s", "dual_median_r")}),
          flush=True)

    if not args.skip_svd:
        print("wide SVD (cold)...", flush=True)
        t0 = time.perf_counter()
        m_svd, a_svd = fit("svd")
        results["svd_cold_s"] = round(time.perf_counter() - t0, 2)
        print("wide SVD (warm)...", flush=True)
        t0 = time.perf_counter()
        m_svd, a_svd = fit("svd")
        results["svd_warm_s"] = round(time.perf_counter() - t0, 2)
        results["svd_median_r"] = round(m_svd["median_score"], 4)
        results["speedup_warm"] = round(
            results["svd_warm_s"] / results["dual_warm_s"], 2)
        results["alpha_agreement"] = round(
            float(np.mean(np.asarray(a_svd) == np.asarray(a_dual))), 4)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
