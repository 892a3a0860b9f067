"""Benchmark: nested-CV ridge fit throughput (voxels*alphas/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Problem: a LeBel-UTS03-shaped train/test nested-CV ridge fit
(BASELINE.md: 10-alpha grid x 5 inner folds + per-voxel refit, fsaverage5
voxel count). Ours runs as the fused jitted step (litcoder_core_tpu.parallel
.step.nested_cv_step) on the default JAX device (TPU under the driver).

Baseline: the reference's algorithm (encoding/models/ridge_regression.py +
nested_cv.py: fresh torch SVD per fold, per-alpha Python loop, per-voxel
scipy pearsonr) re-implemented faithfully in torch-CPU and timed at two
reduced voxel counts, then extrapolated linearly in V to the full problem
(the reference publishes no numbers — BASELINE.md requires self-measuring
its torch-CPU path).
"""

import json
import time

import numpy as np

# Bench problem scale (LeBel-ish: T ~ thousands of TRs, D = FIR-expanded LM
# features, V = fsaverage5 vertex count).
T, TP, D, V, A, F, CHUNK = 4096, 512, 1536, 20484, 10, 5, 20
SEED = 0


def _problem(v):
    rng = np.random.default_rng(SEED)
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = (rng.normal(size=(D, v)) / np.sqrt(D)).astype(np.float32)
    Y = (X @ wt + rng.normal(size=(T, v))).astype(np.float32)
    X_test = rng.normal(size=(TP, D)).astype(np.float32)
    Y_test = (X_test @ wt + rng.normal(size=(TP, v))).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    return X, Y, X_test, Y_test, alphas


def time_ours() -> float:
    import jax

    from litcoder_core_tpu.parallel.step import (
        equal_size_folds,
        nested_cv_step,
    )

    X, Y, X_test, Y_test, alphas = _problem(V)
    train_idx, val_idx = equal_size_folds(T, F, CHUNK, seed=SEED)
    # Device-resident inputs: measure the fit, not host->device transfer.
    X, Y, X_test, Y_test, alphas, train_idx, val_idx = jax.device_put(
        (X, Y, X_test, Y_test, alphas, train_idx, val_idx)
    )

    def run():
        out = nested_cv_step(X, Y, X_test, Y_test, alphas, train_idx,
                             val_idx, method="eigh")
        # Force execution with a scalar fetch: on the experimental tunneled
        # backend block_until_ready alone does not guarantee the dispatched
        # computation ran (observed wall=0.00s without this).
        return float(jnp.sum(out.correlations)), out

    import jax.numpy as jnp

    s0, out = run()  # compile + first run
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        s, out = run()
        assert s == s0  # same inputs -> same result, and forces the compute
    wall = (time.perf_counter() - t0) / iters
    med = float(np.median(np.asarray(out.correlations)))
    assert np.isfinite(med)
    return wall


def time_reference_torch_cpu(v: int) -> float:
    """Reference algorithm, faithfully: per-fold torch SVD, per-alpha loop,
    per-voxel scipy pearsonr on host (nested_cv.py:334-438)."""
    import torch
    from scipy.stats import pearsonr

    X, Y, X_test, Y_test, alphas = _problem(v)
    Xt = torch.tensor(X)
    Yt = torch.tensor(Y)
    Xte = torch.tensor(X_test)

    from litcoder_core_tpu.parallel.step import equal_size_folds

    train_idx, val_idx = equal_size_folds(T, F, CHUNK, seed=SEED)

    t0 = time.perf_counter()
    fold_corrs = []
    for f in range(F):
        tr = torch.tensor(train_idx[f], dtype=torch.long)
        va = torch.tensor(val_idx[f], dtype=torch.long)
        Rstim, Pstim = Xt[tr], Xt[va]
        Rresp, Presp = Yt[tr], Yt[va]
        U, S, Vh = torch.linalg.svd(Rstim, full_matrices=False)
        UR = U.T @ Rresp
        PVh = Pstim @ Vh.T
        zP = (Presp - Presp.mean(0)) / (Presp.std(0) + 1e-8)
        rcorrs = []
        for a in alphas:
            na = float(a) * S[0].item()
            Dd = S / (S**2 + na**2)
            pred = (PVh * Dd[None, :]) @ UR
            zpred = (pred - pred.mean(0)) / (pred.std(0) + 1e-8)
            rcorrs.append(torch.nan_to_num((zP * zpred).mean(0)))
        fold_corrs.append(torch.stack(rcorrs))
    mean_corrs = torch.stack(fold_corrs).mean(0)
    best = torch.tensor(alphas)[mean_corrs.argmax(0)]

    # Refit grouped by unique alpha (ridge_regression.py:49-62).
    U, S, Vh = torch.linalg.svd(Xt, full_matrices=False)
    UR = U.T @ Yt
    nalphas = best * S[0]
    wt = torch.zeros((D, v))
    for ua in torch.unique(nalphas):
        sel = torch.nonzero(nalphas == ua).squeeze(-1)
        Dd = S / (S**2 + ua**2)
        wt[:, sel] = (Vh.T @ torch.diag(Dd)) @ UR[:, sel]
    y_pred = (Xte @ wt).numpy()

    # Serial host-side per-voxel pearsonr (nested_cv.py:418-438).
    for i in range(v):
        pearsonr(Y_test[:, i], y_pred[:, i])
    return time.perf_counter() - t0


def main():
    wall_ours = time_ours()

    try:
        v1, v2 = 256, 1024
        w1 = time_reference_torch_cpu(v1)
        w2 = time_reference_torch_cpu(v2)
        # Linear model wall(V) = c0 + c1 V, extrapolated to the full V.
        c1 = (w2 - w1) / (v2 - v1)
        c0 = w1 - c1 * v1
        wall_ref = c0 + c1 * V
        vs_baseline = wall_ref / wall_ours
    except Exception:
        vs_baseline = None

    print(json.dumps({
        "metric": "nested_cv_ridge_fit_voxels_alphas_per_sec",
        "value": round(V * A / wall_ours, 1),
        "unit": f"voxels*alphas/sec (T={T}, D={D}, V={V}, A={A}, F={F}; "
                f"wall={wall_ours:.2f}s)",
        "vs_baseline": (round(vs_baseline, 1)
                        if vs_baseline is not None else None),
    }))


if __name__ == "__main__":
    main()
