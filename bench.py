"""Benchmark: nested-CV ridge fit throughput (voxels*alphas/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Problem: a LeBel-UTS03-shaped train/test nested-CV ridge fit
(BASELINE.md: 10-alpha grid x 5 inner folds + per-voxel refit, fsaverage5
voxel count). Ours runs as the fused jitted step (litcoder_core_tpu.parallel
.step.nested_cv_step) on the default JAX device (TPU under the driver).

Baseline: the reference's algorithm (encoding/models/ridge_regression.py +
nested_cv.py: fresh torch SVD per fold, per-alpha Python loop, per-voxel
scipy pearsonr) re-implemented faithfully in torch-CPU, measured ONCE by
benchmarks/measure_baseline.py and PINNED in
benchmarks/baseline_torch_cpu.json so vs_baseline is comparable across
rounds (re-measuring each run swung the ratio 78x-172x in round 1). If the
pinned record is missing it is re-measured live as a fallback.

Extra keys: achieved_tflops (analytic FLOP count / wall) and
mfu_vs_bf16_peak (fraction of the chip's bf16 matmul peak — the fit runs
float32 Precision.HIGHEST, which costs multiple bf16 passes per matmul, so
this is a conservative utilization floor).

Outage resilience: the default invocation probes the backend in a FRESH
subprocess (JAX caches init failure in-process; CLAUDE.md), runs the
measurement as a bounded subprocess (`bench.py --live`), refreshes
benchmarks/bench_snapshot.json on success, and on persistent backend
unavailability emits the committed snapshot as a valid JSON line with
explicit `"stale": true` markers instead of crashing — BENCH_r03.json was
an rc=1 tunnel-outage traceback; this makes that mode impossible
(utils/benchguard.py; locked by tests/test_bench_guard.py).
"""

import json
import os
import sys
import time

import numpy as np

# Bench problem scale (LeBel-ish: T ~ thousands of TRs, D = FIR-expanded LM
# features, V = fsaverage5 vertex count). Must match measure_baseline.py.
T, TP, D, V, A, F, CHUNK = 4096, 512, 1536, 20484, 10, 5, 20
SEED = 0

_BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_torch_cpu.json")

# bf16 MXU peak per chip (TFLOP/s) for MFU accounting. The parity-default
# fit runs fp32 Precision.HIGHEST, which the MXU executes as ~6 bf16
# passes per matmul — so the honest roofline for the default path is
# peak/6 (mfu_vs_fp32_highest_peak); mfu_vs_bf16_peak is kept as the
# conservative floor against raw silicon.
_BF16_PEAK_TFLOPS = {"tpu": 197.0}
_FP32_HIGHEST_PASSES = 6.0


def _problem(v):
    rng = np.random.default_rng(SEED)
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = (rng.normal(size=(D, v)) / np.sqrt(D)).astype(np.float32)
    Y = (X @ wt + rng.normal(size=(T, v))).astype(np.float32)
    X_test = rng.normal(size=(TP, D)).astype(np.float32)
    Y_test = (X_test @ wt + rng.normal(size=(TP, v))).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    return X, Y, X_test, Y_test, alphas


def flops_estimate(t_union: int, t_val: int) -> float:
    """Analytic FLOPs of the complement-Gram nested-CV step
    (parallel/step.py 'auto' = Woodbury scan): ONE union eigensolve, per-
    fold rotations + Lanczos normalpha, per-(fold, alpha) Cholesky
    downdates, the (F, A)-deep alpha-scan matmuls, the refit and the
    held-out scoring. Matmul = 2mnk; eigh ~ 10 n^3; chol ~ n^3/3."""
    f = 0.0
    f += 2.0 * t_union * D * D          # union Gram
    f += 2.0 * t_union * D * V          # union X^T Y
    f += 10.0 * D**3                    # ONE union eigh (shared by folds)
    lanczos_m = 24
    per_fold = (
        2.0 * t_val * D * D             # val-block Gram (P = Xva Q)
        + 2.0 * t_val * D * V           # val X^T Y
        + 2.0 * D * D * V               # UR0 rotation
        + lanczos_m * 4.0 * t_val * D   # normalpha Lanczos matvecs
        + A * (
            2.0 * t_val * t_val * D     # K_a = P~ P^T
            + t_val**3 / 3.0 * 2.0      # chol(I - K_a)
            + 4.0 * t_val * t_val * D   # two triangular solves (D RHS)
            + 2.0 * t_val * D * V       # prediction matmul
            + 6.0 * t_val * V           # correlation
        )
    )
    f += F * per_fold
    # Fused refit: reuses the scan's union eigendecomposition + XtY_u and
    # corrects for the k = T - t_union rows outside the fold union
    # (parallel/step._refit_union_woodbury) — no second Gram/eigh/XtY.
    k = T - t_union
    f += 2.0 * k * D * D                # Pr = X_rem Q
    f += 2.0 * D * D * V                # q rotation (Q^T XtY)
    f += 4.0 * k * D * V                # u = Pr t1; correction Pr^T z
    f += 2.0 * D * D * V                # weights rotation Q w_tilde
    f += 2.0 * TP * D * V + 6.0 * TP * V  # predict + pearson
    return f


def stage_breakdown(X, Y, X_test, Y_test, alphas, train_idx, val_idx):
    """Per-stage device time of the warm fused step (VERDICT r3 weak #6:
    one wall number gave no basis to decide whether the solver is done).
    Times the step's three independently-jitted pieces — scan (fold search
    + argmax), refit (rank-k-corrected reuse of the scan's union
    eigendecomposition), score (prediction + Pearson) — plus the scan at
    A=1 to split the alpha grid's marginal cost (batched per-(fold, alpha)
    Cholesky downdates + scan matmuls) from the fold-fixed spectral
    prologue (union Gram/XtY/eigh + Lanczos). Stage sums can exceed the
    fused wall slightly (the fused program overlaps stage boundaries and
    computes the shared union products once)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from litcoder_core_tpu.parallel.step import (
        _predict_and_score,
        _refit_union_woodbury,
        _scan_best_alphas,
    )

    kw = dict(normalpha=True, use_corr=True, single_alpha=False,
              singcutoff=1e-10, method="auto", complement=True,
              scan="woodbury", fast_scan=False)

    def timed(fn, iters=3):
        out = fn()  # compile + warm
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn())
        return (_time.perf_counter() - t0) / iters, out

    scan_s, best = timed(
        lambda: _scan_best_alphas(X, Y, alphas, train_idx, val_idx, **kw))
    a1 = alphas[:1]
    scan_a1_s, _ = timed(
        lambda: _scan_best_alphas(X, Y, a1, train_idx, val_idx, **kw))

    # The fused step's refit consumes the SCAN's union eigendecomposition
    # (rank-k corrected; parallel/step._refit_union_woodbury). Rebuild
    # those products once untimed, then time the refit alone — so the
    # refit stage number matches what the fused program actually runs
    # (stage sums still overstate slightly: the fused program computes
    # the shared products once, and overlaps stage boundaries).
    @jax.jit
    def _union_products(X, Y, val_idx):
        H = jax.lax.Precision.HIGHEST
        union = jnp.sort(val_idx.ravel())
        Xu = X[union]
        Yu = Y[union]
        G_union = jnp.dot(Xu.T, Xu, precision=H)
        lam_u, Q = jnp.linalg.eigh(G_union)
        XtY_u = jnp.dot(Xu.T, Yu, precision=H)
        return lam_u, Q, XtY_u, union

    lam_u, Q, XtY_u, union = jax.block_until_ready(
        _union_products(X, Y, val_idx))
    # The fused step runs the union refit only under its gate
    # (_nested_cv_step_impl: singcutoff <= 1e-10 and
    # 0 <= k_rem <= max(256, T//8)); assert it holds for the bench
    # problem so this stage times the refit the fused program actually
    # runs (and flops_estimate credits the right refit).
    k_rem = X.shape[0] - union.shape[0]
    assert kw["singcutoff"] <= 1e-10 and \
        0 <= k_rem <= max(256, X.shape[0] // 8), (
            "bench problem no longer takes the union-woodbury refit path; "
            "update stage_breakdown/flops_estimate to match the fused gate"
        )
    refit_s, weights = timed(
        lambda: _refit_union_woodbury(X, Y, lam_u, Q, XtY_u, union, best,
                                      alphas, kw["normalpha"]))
    score_s, _ = timed(lambda: _predict_and_score(X_test, Y_test, weights))
    a_n = int(alphas.shape[0])
    per_alpha = max(scan_s - scan_a1_s, 0.0) / max(a_n - 1, 1)
    grid_s = min(per_alpha * a_n, scan_s)  # clamp extrapolation noise
    return {
        "stage_scan_s": round(scan_s, 4),
        "stage_refit_s": round(refit_s, 4),
        "stage_predict_score_s": round(score_s, 4),
        "scan_alpha_grid_s": round(grid_s, 4),
        "scan_fold_fixed_s": round(scan_s - grid_s, 4),
    }


def time_ours():
    import jax
    import jax.numpy as jnp

    from litcoder_core_tpu.parallel.step import (
        equal_size_folds,
        nested_cv_step,
    )

    X, Y, X_test, Y_test, alphas = _problem(V)
    train_idx, val_idx = equal_size_folds(T, F, CHUNK, seed=SEED)
    t_union = train_idx.shape[1] + val_idx.shape[1]
    t_val = val_idx.shape[1]
    # Device-resident inputs: measure the fit, not host->device transfer.
    X, Y, X_test, Y_test, alphas, train_idx, val_idx = jax.device_put(
        (X, Y, X_test, Y_test, alphas, train_idx, val_idx)
    )

    def run(fast_scan):
        out = nested_cv_step(X, Y, X_test, Y_test, alphas, train_idx,
                             val_idx, method="auto", fast_scan=fast_scan)
        # Force execution with a scalar fetch: on the experimental tunneled
        # backend block_until_ready alone does not guarantee the dispatched
        # computation ran (observed wall=0.00s without this).
        return float(jnp.sum(out.correlations)), out

    def timed(fast_scan):
        s0, out = run(fast_scan)  # compile + first run
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            s, out = run(fast_scan)
            assert s == s0  # same inputs -> same result; forces the compute
        wall = (time.perf_counter() - t0) / iters
        med = float(np.median(np.asarray(out.correlations)))
        assert np.isfinite(med)
        return wall, out

    wall, out = timed(fast_scan=False)       # parity default: fp32-HIGHEST
    wall_fast, out_fast = timed(fast_scan=True)  # opt-in bf16 alpha scan
    # fast_scan must not change alpha SELECTION on the bench problem
    # (locked more broadly in tests/test_woodbury_scan.py).
    alpha_agree = float(np.mean(
        np.asarray(out.best_alphas) == np.asarray(out_fast.best_alphas)
    ))
    stages = stage_breakdown(X, Y, X_test, Y_test, alphas, train_idx,
                             val_idx)
    return (wall, wall_fast, alpha_agree, flops_estimate(t_union, t_val),
            jax.devices()[0].platform, stages)


def load_or_measure_baseline() -> float:
    """Pinned reference wall (seconds); live re-measure only as fallback."""
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            record = json.load(f)
        assert record["problem"] == {
            "T": T, "TP": TP, "D": D, "V": V, "A": A, "F": F,
            "chunk": CHUNK, "seed": SEED,
        }, "pinned baseline measured a different problem; re-run " \
           "benchmarks/measure_baseline.py"
        return float(record["wall_seconds_extrapolated_full_v"])

    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"
    ))
    from measure_baseline import time_reference_torch_cpu

    v1, v2 = 256, 1024
    w1 = time_reference_torch_cpu(v1)
    w2 = time_reference_torch_cpu(v2)
    c1 = (w2 - w1) / (v2 - v1)
    return (w1 - c1 * v1) + c1 * V


def main():
    (wall_ours, wall_fast, alpha_agree, flops, platform_name,
     stages) = time_ours()

    try:
        vs_baseline = load_or_measure_baseline() / wall_ours
    except AssertionError:
        raise  # stale pinned baseline: fail loudly, don't report null
    except Exception:
        vs_baseline = None

    achieved_tflops = flops / wall_ours / 1e12
    peak = _BF16_PEAK_TFLOPS.get(platform_name)
    result = {
        "metric": "nested_cv_ridge_fit_voxels_alphas_per_sec",
        "value": round(V * A / wall_ours, 1),
        "unit": f"voxels*alphas/sec (T={T}, D={D}, V={V}, A={A}, F={F}; "
                f"wall={wall_ours:.2f}s; fp32-HIGHEST)",
        "vs_baseline": (round(vs_baseline, 1)
                        if vs_baseline is not None else None),
        "achieved_tflops": round(achieved_tflops, 2),
        "wall_fast_scan_s": round(wall_fast, 3),
        "fast_scan_speedup": round(wall_ours / wall_fast, 2),
        "fast_scan_alpha_agreement": round(alpha_agree, 4),
        "stages": stages,
    }
    if peak:
        result["mfu_vs_bf16_peak"] = round(achieved_tflops / peak, 4)
        # The honest roofline for the parity-default path: fp32 HIGHEST
        # matmuls cost ~6 bf16 MXU passes each (VERDICT r2 weak #1).
        result["mfu_vs_fp32_highest_peak"] = round(
            achieved_tflops / (peak / _FP32_HIGHEST_PASSES), 4
        )
    print(json.dumps(result))


_SNAPSHOT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "bench_snapshot.json")


if __name__ == "__main__":
    if "--live" in sys.argv:
        main()  # the actual measurement (runs in the guard's subprocess)
    else:
        from litcoder_core_tpu.utils.benchguard import run_guarded

        sys.exit(run_guarded(
            [sys.executable, os.path.abspath(__file__), "--live"],
            _SNAPSHOT_PATH,
        ))
