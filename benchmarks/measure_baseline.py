"""One-time measurement of the reference torch-CPU baseline for bench.py.

The reference publishes no benchmark numbers (SURVEY.md §6), so BASELINE.md
requires self-measuring its algorithm: per-fold torch SVD, per-alpha Python
loop, serial per-voxel scipy pearsonr (encoding/models/ridge_regression.py
+ nested_cv.py:334-438), re-implemented faithfully in torch-CPU below.

Wall time is measured at several reduced voxel counts and extrapolated
linearly in V to the full problem (the per-voxel work — alpha scans,
refit groups, pearsonr — is linear in V; the SVDs are V-independent and
land in the intercept). The result is PINNED to
benchmarks/baseline_torch_cpu.json so bench.py's vs_baseline ratio is
comparable across rounds instead of re-measured noise (round-1 runs swung
78x-172x from re-measurement variance).

Run: python benchmarks/measure_baseline.py   (rewrites the JSON)
"""

import json
import os
import platform
import time

import numpy as np

# Must match bench.py's problem exactly.
T, TP, D, V, A, F, CHUNK = 4096, 512, 1536, 20484, 10, 5, 20
SEED = 0
V_POINTS = (256, 512, 1024)
REPEATS = 3

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_torch_cpu.json")


def _problem(v):
    rng = np.random.default_rng(SEED)
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = (rng.normal(size=(D, v)) / np.sqrt(D)).astype(np.float32)
    Y = (X @ wt + rng.normal(size=(T, v))).astype(np.float32)
    X_test = rng.normal(size=(TP, D)).astype(np.float32)
    Y_test = (X_test @ wt + rng.normal(size=(TP, v))).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    return X, Y, X_test, Y_test, alphas


def time_reference_torch_cpu(v: int) -> float:
    """Reference algorithm, faithfully: per-fold torch SVD, per-alpha loop,
    per-voxel scipy pearsonr on host (nested_cv.py:334-438)."""
    import torch
    from scipy.stats import pearsonr

    from litcoder_core_tpu.parallel.step import equal_size_folds

    X, Y, X_test, Y_test, alphas = _problem(v)
    Xt = torch.tensor(X)
    Yt = torch.tensor(Y)
    Xte = torch.tensor(X_test)
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
    import torch

    points = {}
    for v in V_POINTS:
        walls = [time_reference_torch_cpu(v) for _ in range(REPEATS)]
        points[v] = min(walls)  # best-of: least scheduler noise
        print(f"V={v}: {points[v]:.2f}s (runs: "
              f"{', '.join(f'{w:.2f}' for w in walls)})", flush=True)

    vs = np.array(sorted(points), dtype=np.float64)
    ws = np.array([points[int(v)] for v in vs])
    c1, c0 = np.polyfit(vs, ws, 1)  # wall(V) = c0 + c1*V
    wall_full = float(c0 + c1 * V)

    record = {
        "problem": {"T": T, "TP": TP, "D": D, "V": V, "A": A, "F": F,
                    "chunk": CHUNK, "seed": SEED},
        "v_points": {str(int(v)): w for v, w in points.items()},
        "fit": {"c0_seconds": float(c0), "c1_seconds_per_voxel": float(c1)},
        "wall_seconds_extrapolated_full_v": wall_full,
        "repeats": REPEATS,
        "aggregation": "min-of-repeats per V point, linear fit in V",
        "host": {
            "platform": platform.platform(),
            "cpu_count": os.cpu_count(),
            "torch_version": torch.__version__,
            "torch_threads": torch.get_num_threads(),
        },
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(OUT_PATH, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(f"baseline pinned: {wall_full:.1f}s extrapolated at V={V} "
          f"-> {OUT_PATH}")


if __name__ == "__main__":
    main()
