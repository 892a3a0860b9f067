"""Stacked regression across feature spaces — per-voxel convex blending.

Not present in the reference (which concatenates feature spaces with one
shared regularizer, encoding/trainer.py:146-150). Stacking is the standard
companion analysis to banded ridge (cf. la Tour et al. 2022; stacked
regressions for interpretable brain maps): fit one ridge model PER feature
space, collect cross-validated (out-of-fold) predictions on the training
data, and learn, per voxel, the convex combination of space-wise
predictions that best reconstructs the response:

    min_w || y - P w ||^2   s.t.  w >= 0,  sum(w) = 1,

where P (T, S) holds the S spaces' out-of-fold predictions for that voxel.
The simplex constraint makes the weights directly interpretable as each
space's share of the voxel's explained signal (they sum to one), unlike
raw regression coefficients.

TPU formulation: the per-voxel QP is tiny (S = 2-5 spaces), so the data
enters only through A = P^T P (S, S) and b = P^T y (S,) per voxel — MXU
matmuls build every voxel's QP, accumulated FOLD BY FOLD so no (S, T, V)
out-of-fold stack ever exists. At whole-brain V on one chip even a single
fold's (S, Tva, V) predictions (~6 GB) cannot sit next to the 10 GB
device-resident response, so the refit/QP/blend/test stages additionally
stream through voxel chunks (_fit_stacked_chunked — exact, every stage is
columnwise in V; per-(fold, space) Grams are computed once and reused by
all chunks). A fixed-iteration accelerated
projected-gradient loop (FISTA with the exact per-voxel Lipschitz step;
Duchi et al. 2008 simplex projection, a sort over S elements) then runs
vmapped across voxels entirely on device. No per-voxel host loops, no
data-dependent control flow inside the solver.

The out-of-fold refits are eigensolve-free under the standard gates
(normalpha, min(alpha) >= 0.03, singcutoff <= 1e-10, tall spaces): voxels
group by their selected alpha and each group is one Cholesky solve against
a bucket-padded slice of X^T Y (the same trick as the banded grouped
refit) — no per-(fold, space) spectral factorizations on the hot path.
"""

import logging
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from litcoder_core_tpu.models.folding import create_folds
from litcoder_core_tpu.models.nested_cv import (
    _LAST_PATHS,
    _create_metrics_dict,
    _find_best_alphas,
    _record_path,
)
from litcoder_core_tpu.models.ridge import (
    lmax_dense,
    ridge_fit_from_svd,
    ridge_svd,
    predict,
)
from litcoder_core_tpu.ops.stats import (
    bh_fdrcorrection_np,
    pearson_pvalues_f64,
    pearson_r,
)

logger = logging.getLogger(__name__)

_HIGHEST = jax.lax.Precision.HIGHEST


def project_simplex(v):
    """Euclidean projection of v (..., S) onto the probability simplex
    (Duchi et al. 2008): sort, find the largest k with
    u_k - (cumsum(u)_k - 1)/k > 0, clip. S is tiny so the sort is free."""
    s = v.shape[-1]
    u = jnp.sort(v, axis=-1)[..., ::-1]                    # descending
    css = jnp.cumsum(u, axis=-1) - 1.0
    k = jnp.arange(1, s + 1, dtype=v.dtype)
    cond = u - css / k > 0                                  # (..., S) bool
    rho = jnp.sum(cond, axis=-1, keepdims=True)             # last valid k
    theta = jnp.take_along_axis(css, rho - 1, axis=-1) / rho.astype(v.dtype)
    return jnp.maximum(v - theta, 0.0)


@partial(jax.jit, static_argnames=("n_iter",))
def simplex_lsq(A, b, n_iter: int = 1500):
    """Batched min_w ||y - P w||^2 on the simplex from A = P^T P (V, S, S)
    and b = P^T y (V, S): FISTA (Nesterov-accelerated projected gradient)
    with the exact per-voxel Lipschitz step 1/lambda_max(A) — the batched
    (S, S) eigvalsh is negligible for S <= 5.

    Acceleration and the exact step matter here: feature spaces whose
    predictions correlate highly (adjacent LM layers reach r > 0.99) make
    these QPs ill-conditioned, and plain projected gradient with a trace
    step left the WEIGHTS — the feature's headline, interpretable output —
    up to ~0.2 from the optimum at the objective's flat bottom. The
    default iteration count is locked against scipy's SLSQP on exactly
    such correlated problems (tests/test_stacking.py)."""
    s = A.shape[-1]
    lmax = jnp.linalg.eigvalsh(A)[..., -1]                  # (V,)
    step = 1.0 / jnp.maximum(lmax, 1e-12)
    w0 = jnp.full(A.shape[:-1], 1.0 / s, A.dtype)

    def body(_, carry):
        w_prev, z, t = carry
        grad = jnp.einsum("vij,vj->vi", A, z) - b
        w = project_simplex(z - step[:, None] * grad)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z = w + ((t - 1.0) / t_next) * (w - w_prev)
        return (w, z, t_next)

    w, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (w0, w0, jnp.float32(1.0))
    )
    return w


@partial(jax.jit, static_argnames=("normalpha",))
def _chol_pred_pervoxel(G, XtY, Xpred, alphas_grid, best_idx,
                        normalpha: bool):
    """(Tpred, V) ridge predictions with per-voxel alphas, MESH-SAFE: the
    per-alpha solve factors Z_a = (G + nal_a^2 I)^-1 Xpred^T are
    voxel-INDEPENDENT, each alpha's predictions Z_a^T XtY are columnwise
    in V, and the per-voxel selection is an elementwise where() on the
    (V,) best-alpha index — so a voxel-sharded XtY/best_idx propagates
    with zero collectives. The grouped-Cholesky twin (_grouped_chol_pred)
    gathers voxel groups by selected alpha, which the SPMD partitioner
    cannot keep local; this variant trades those gathers for computing
    every alpha's predictions on all voxels (A extra prediction matmuls —
    MXU-cheap next to the factorizations)."""
    eye = jnp.eye(G.shape[0], dtype=jnp.float32)
    s0 = (jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0)) if normalpha
          else jnp.float32(1.0))

    def body(a, pred):
        na = alphas_grid[a] * s0
        L = jnp.linalg.cholesky(G + (na * na) * eye)
        Z = jax.scipy.linalg.solve_triangular(L, Xpred.T, lower=True)
        Z = jax.scipy.linalg.solve_triangular(L.T, Z, lower=False)
        pred_a = jnp.dot(Z.T, XtY, precision=_HIGHEST)  # (Tpred, V)
        return jnp.where(best_idx[None, :] == a, pred_a, pred)

    pred0 = jnp.zeros((Xpred.shape[0], XtY.shape[1]), jnp.float32)
    return jax.lax.fori_loop(0, alphas_grid.shape[0], body, pred0)


def _pervoxel_chol_pred(Xtr, Xpred, Ytr, alphas, best_idx,
                        normalpha: bool):
    """Mesh-safe counterpart of _grouped_chol_pred (see
    _chol_pred_pervoxel): same math, per-voxel alpha selected by index
    into the shared grid instead of host-side voxel grouping."""
    G = jnp.dot(Xtr.T, Xtr, precision=_HIGHEST)
    XtY = jnp.dot(Xtr.T, Ytr, precision=_HIGHEST)
    return _chol_pred_pervoxel(G, XtY, Xpred,
                               jnp.asarray(alphas, jnp.float32),
                               best_idx, normalpha)


@jax.jit
def _chol_pred_group(G, XtY, Xva, idx, na):
    """One (fold, space, alpha-group) out-of-fold prediction (Tva, bucket):
    Xva (G + na^2 I)^-1 (X^T Y)[:, idx] via Cholesky — exact ridge for
    na > 0, no eigendecomposition."""
    eye = jnp.eye(G.shape[0], dtype=jnp.float32)
    L = jnp.linalg.cholesky(G + (na * na) * eye)
    Z = jax.scipy.linalg.solve_triangular(L, XtY[:, idx], lower=True)
    Z = jax.scipy.linalg.solve_triangular(L.T, Z, lower=False)
    return jnp.dot(Xva, Z, precision=_HIGHEST)


def _grouped_chol_pred_cols(G, XtY, Xpred, best: np.ndarray, s0):
    """Grouped-Cholesky predictions from a precomputed Gram/cross-product:
    voxels grouped by selected alpha, one Cholesky per distinct alpha.
    Split out from _grouped_chol_pred so the whole-brain chunked driver
    can reuse a per-(fold, space) G/s0 across every voxel chunk instead
    of re-forming the (D, D) Gram per chunk."""
    from litcoder_core_tpu.models.banded import _bucket_width

    pred = jnp.zeros((Xpred.shape[0], XtY.shape[1]), jnp.float32)
    for a in np.unique(best):
        vox = np.nonzero(best == a)[0]
        bkt = _bucket_width(vox.size)
        idx = np.full(bkt, vox[0], np.int32)
        idx[:vox.size] = vox
        pg = _chol_pred_group(G, XtY, Xpred, jnp.asarray(idx),
                              jnp.float32(a) * s0)
        pred = pred.at[:, vox].set(pg[:, :vox.size])
    return pred


def _grouped_chol_pred(Xtr, Xpred, Ytr, best: np.ndarray,
                       normalpha: bool):
    """(Tpred, V) ridge predictions with per-voxel alphas, voxels grouped
    by selected alpha — one Cholesky per distinct alpha (the
    eigensolve-free twin of the spectral per-voxel-alpha refit; cf.
    CLAUDE.md: eigh is the TPU wall-clock villain). Serves both the
    out-of-fold refits (Xtr = fold train rows, Xpred = fold val rows)
    and the full-train test refit (Xtr = X, Xpred = X_test)."""
    G = jnp.dot(Xtr.T, Xtr, precision=_HIGHEST)
    XtY = jnp.dot(Xtr.T, Ytr, precision=_HIGHEST)
    s0 = (jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0)) if normalpha
          else jnp.float32(1.0))
    return _grouped_chol_pred_cols(G, XtY, Xpred, best, s0)


def _space_alphas_and_test(X_j, Y_j, fold_splits, alphas, normalpha,
                           use_corr, singcutoff, method, X_test,
                           chol_refit: bool, voxel_chunk_size=None,
                           best_idx_fn=None):
    """One feature space's per-voxel alphas (shared inner-CV search — the
    same eigensolve-free paths as fit_nested_cv, incl. the dual kernel
    form for wide spaces) and, optionally, its full-train-refit test
    predictions (Tp, V) — grouped-Cholesky under the standard gates,
    spectral otherwise. With `best_idx_fn` (mesh fits) the chol refit runs
    the per-voxel-index kernel instead of host voxel grouping (see
    _chol_pred_pervoxel)."""
    best = _find_best_alphas(
        X_j, Y_j, fold_splits,
        np.asarray(alphas, np.float32), single_alpha=False,
        normalpha=normalpha, use_corr=use_corr, singcutoff=singcutoff,
        voxel_chunk_size=voxel_chunk_size, method=method,
    )
    best_j = jnp.asarray(best, jnp.float32)
    y_pred_test = None
    if X_test is not None:
        X_test_j = jnp.asarray(X_test, jnp.float32)
        if chol_refit and best_idx_fn is not None:
            y_pred_test = _pervoxel_chol_pred(
                X_j, X_test_j, Y_j, alphas, best_idx_fn(best), normalpha)
        elif chol_refit:
            y_pred_test = _grouped_chol_pred(X_j, X_test_j, Y_j,
                                             np.asarray(best), normalpha)
        else:
            svd_full = ridge_svd(X_j, None, singcutoff=singcutoff,
                                 method="auto" if method in ("chol", "dual")
                                 else method)
            nal = best_j * svd_full.S[0] if normalpha else best_j
            wt = ridge_fit_from_svd(svd_full, Y_j, nal)
            y_pred_test = predict(X_test_j, wt)
    return best_j, y_pred_test, np.asarray(best)


@jax.jit
def _colwise_dot(a, b):
    """(V,) per-voxel dot over time: sum_t a[t, v] * b[t, v]."""
    return jnp.einsum("tv,tv->v", a, b, precision=_HIGHEST)


def _stacked_chunk_cap(t_rows: int, n_vox: int,
                       budget_bytes: int = 1536 * 2**20) -> int:
    """Voxel-chunk cap for the stacked fit's refit/QP/test stages: the
    largest per-chunk transient is the (T, chunk) response column slice
    (plus its train-row gather), so cap the chunk to keep that slice
    under `budget_bytes`. Whole-brain T=26880 lands at 12288; any
    problem whose full (T, V) slice fits the budget comes back >= V
    (no chunking)."""
    cap = max(512, (budget_bytes // (4 * t_rows)) // 512 * 512)
    return cap if cap < n_vox else n_vox


@partial(jax.jit, static_argnames=("width",))
def _cols(M, lo, width: int):
    """(T, width) column slice starting at `lo` — a top-level
    dynamic_slice, never inside a loop (the whole-brain copy rule; cf.
    models/banded.py:_chol_scan_score_chunk). `lo` is traced: tunnel
    compiles cost minutes per signature, so only the tail width may
    trigger a second compile."""
    return jax.lax.dynamic_slice_in_dim(M, lo, width, axis=1)


@jax.jit
def _xty_rows(X, Y_c, rows):
    """X[rows].T @ Y_c[rows] (D, Vc) in one program so the (T_tr, D) and
    (T_tr, Vc) row gathers stay transient inside XLA."""
    return jnp.dot(jnp.take(X, rows, axis=0).T,
                   jnp.take(Y_c, rows, axis=0), precision=_HIGHEST)


def _fit_stacked_chunked(Xs_j, Y_j, X_tests_j, y_test, alphas, fold_splits,
                         normalpha, use_corr, singcutoff, method,
                         n_iter, chunk, alpha_fdr, search_chunk, timer, V):
    """Whole-brain driver for fit_stacked_ridge: every stage after the
    per-space alpha search streams through voxel chunks (all stages are
    columnwise in V, so chunking is exact). Nothing of size (Tva, V) or
    (Tp, V) ever materializes — the round-4 whole-brain fit
    RESOURCE_EXHAUSTED'd the 16 GB chip because the S per-fold (Tva, V)
    prediction buffers (~2 GB each at V=95556) and the test-refit
    (Tp, V) scatter copies sat next to the 10 GB device-resident
    response. Per-(fold, space) Grams/norms are computed once and reused
    by every chunk; requires the grouped-Cholesky gates (the caller
    falls back to the unchunked path otherwise).

    Returns the same (metrics, stack_weights, best_alphas) contract as
    the unchunked path; numerics match it to float-associativity (the
    per-column matmul reductions are identical)."""
    S = len(Xs_j)
    T = int(Y_j.shape[0])
    alphas = np.asarray(alphas, np.float32)
    with timer.stage("per_space_search"):
        all_alphas = [
            _find_best_alphas(
                X_j, Y_j, fold_splits, alphas, single_alpha=False,
                normalpha=normalpha, use_corr=use_corr,
                singcutoff=singcutoff, voxel_chunk_size=search_chunk,
                method=method,
            )
            for X_j in Xs_j
        ]

    with timer.stage("fold_grams_precompute"):
        # (D, D) Grams + spectral norms, once per (fold, space) and per
        # space for the full-train test refit; every chunk reuses them.
        # ~0.6 GB at bench dims — the cache that keeps the chunk loop's
        # FLOPs flat in the number of chunks.
        va_rows = [jnp.asarray(np.asarray(va)) for _, va in fold_splits]
        tr_rows = [jnp.asarray(np.asarray(tr)) for tr, _ in fold_splits]
        G_fold, s0_fold, Xva_fold = [], [], []
        for tr_j in tr_rows:
            Gs, s0s = [], []
            for X_j in Xs_j:
                Xtr = jnp.take(X_j, tr_j, axis=0)
                G = jnp.dot(Xtr.T, Xtr, precision=_HIGHEST)
                Gs.append(G)
                s0s.append(jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0))
                           if normalpha else jnp.float32(1.0))
            G_fold.append(Gs)
            s0_fold.append(s0s)
        for va_j in va_rows:
            Xva_fold.append([jnp.take(X_j, va_j, axis=0) for X_j in Xs_j])
        G_full, s0_full = [], []
        if X_tests_j is not None:
            for X_j in Xs_j:
                G = jnp.dot(X_j.T, X_j, precision=_HIGHEST)
                G_full.append(G)
                s0_full.append(jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0))
                               if normalpha else jnp.float32(1.0))
        jax.block_until_ready(G_fold)

    n_rows_used = sum(len(va) for _, va in fold_splits)
    w_chunks, corr_chunks = [], []
    per_space_chunks = [[] for _ in range(S)]
    for lo in range(0, V, chunk):
        width = min(chunk, V - lo)
        best_c = [b[lo:lo + width] for b in all_alphas]
        timer_cm = timer.stage("oof_refits_and_qp_accumulation")
        timer_cm.__enter__()
        A_sv = jnp.zeros((S, S, width), jnp.float32)
        b_sv = jnp.zeros((S, width), jnp.float32)
        Y_c = _cols(Y_j, lo, width)                      # (T, Vc)
        for f, (tr, va) in enumerate(fold_splits):
            Yva_c = jnp.take(Y_c, va_rows[f], axis=0)
            preds = []
            for s, X_j in enumerate(Xs_j):
                XtY_c = _xty_rows(X_j, Y_c, tr_rows[f])  # (D_s, Vc)
                preds.append(_grouped_chol_pred_cols(
                    G_fold[f][s], XtY_c, Xva_fold[f][s], best_c[s],
                    s0_fold[f][s]))
            for i in range(S):
                b_sv = b_sv.at[i].add(_colwise_dot(preds[i], Yva_c))
                for j in range(i, S):
                    aij = _colwise_dot(preds[i], preds[j])
                    A_sv = A_sv.at[i, j].add(aij)
                    if j > i:
                        A_sv = A_sv.at[j, i].add(aij)
        jax.block_until_ready((A_sv, b_sv))
        timer_cm.__exit__(None, None, None)
        with timer.stage("blend_fista"):
            w_c = simplex_lsq(jnp.moveaxis(A_sv, -1, 0), b_sv.T,
                              n_iter=n_iter)             # (Vc, S)
            w_chunks.append(np.asarray(w_c))
        if X_tests_j is not None:
            with timer.stage("test_refit_and_scoring"):
                tests_c = []
                for s, X_j in enumerate(Xs_j):
                    XtY_c = jnp.dot(X_j.T, Y_c, precision=_HIGHEST)
                    tests_c.append(_grouped_chol_pred_cols(
                        G_full[s], XtY_c, X_tests_j[s], best_c[s],
                        s0_full[s]))                     # (Tp, Vc)
                y_pred_c = sum(w_c[:, s][None, :] * tests_c[s]
                               for s in range(S))
                y_test_c = jnp.asarray(y_test[:, lo:lo + width],
                                       jnp.float32)
                corr_chunks.append(np.asarray(pearson_r(y_test_c,
                                                        y_pred_c)))
                for s in range(S):
                    per_space_chunks[s].append(
                        np.asarray(pearson_r(y_test_c, tests_c[s])))

    if n_rows_used < T:
        logger.info("stacking: %d/%d training rows outside all validation "
                    "folds are excluded from the blend fit",
                    T - n_rows_used, T)
    stack_weights = np.concatenate(w_chunks, axis=0)     # (V, S)
    best_alphas = np.stack(all_alphas)                   # (S, V)
    dominant = np.bincount(np.argmax(stack_weights, axis=1),
                           minlength=S) / max(V, 1)
    _record_path(oof_refit="grouped_chol_chunked")
    metrics: Dict = {
        "solver_paths": dict(_LAST_PATHS),
        "stack_weights_mean": stack_weights.mean(axis=0).tolist(),
        "stack_weights_median": np.median(stack_weights, axis=0).tolist(),
        "stack_dominant_share": dominant.tolist(),
    }
    if X_tests_j is not None:
        corr = np.concatenate(corr_chunks)
        per_space = [np.concatenate(c) for c in per_space_chunks]
        pval = pearson_pvalues_f64(corr, int(np.asarray(y_test).shape[0]))
        significant, corrected = bh_fdrcorrection_np(pval, alpha=alpha_fdr)
        metrics.update(_create_metrics_dict(
            corr, pval, corrected, significant, best_alphas,
            int(significant.sum()),
        ))
        metrics["per_space_test_r"] = [p.tolist() for p in per_space]
        logger.info(
            "stacked ridge (chunked): median r = %.3f (spaces alone: %s), "
            "%d/%d significant", metrics["median_score"],
            ["%.3f" % float(np.median(p)) for p in per_space],
            metrics["n_significant"], V,
        )
    metrics["stage_seconds"] = timer.report()
    return metrics, stack_weights, best_alphas


def fit_stacked_ridge(
    Xs: Sequence[np.ndarray],
    Y: np.ndarray,
    X_tests: Optional[Sequence[np.ndarray]] = None,
    y_test: Optional[np.ndarray] = None,
    alphas: Optional[Sequence[float]] = None,
    folding_type: str = "chunked",
    n_inner_folds: int = 5,
    chunk_length: int = 20,
    alpha_fdr: float = 0.05,
    normalpha: bool = True,
    use_corr: bool = True,
    singcutoff: float = 1e-10,
    seed: int = 0,
    method: str = "auto",
    n_iter: int = 1500,
    voxel_chunk_size: Optional[int] = None,
    mesh=None,
    n_devices: Optional[int] = None,
) -> Tuple[Dict, np.ndarray, np.ndarray]:
    """Stacked ridge across feature spaces with per-voxel simplex weights.

    Args:
        Xs: list of (T, D_s) training feature spaces.
        X_tests / y_test: matching test spaces / (Tp, V) responses.
        voxel_chunk_size: streams each space's alpha SEARCH through voxel
            chunks (same knob as fit_nested_cv); the refits/blend already
            keep per-fold-sized buffers only.
        mesh / n_devices: optional 1-D voxel mesh (or a device count to
            build one) — the same multi-chip knob as fit_nested_cv /
            fit_banded_ridge. Every stage is columnwise in V (per-space
            searches, out-of-fold refits via the per-voxel-index Cholesky
            kernel, the QP accumulation, and the vmapped simplex solver),
            so the whole stacked fit shards over the voxel axis with zero
            tensor collectives.
        Others: same contracts as fit_nested_cv / fit_banded_ridge.

    Returns:
        (metrics, stack_weights (V, S), best_alphas (S, V)).
        metrics mirrors the train/test nested-CV dict (when a test set is
        given; 'best_alphas' holds the per-space (S, V) selections) plus
        per-space weight SUMMARIES ('stack_weights_mean'/'_median',
        'stack_dominant_share' — the full (V, S) array is the returned
        stack_weights, not a metrics payload) and per-space test
        correlations 'per_space_test_r' — so the stacked r is directly
        comparable to each space alone.
    """
    _LAST_PATHS.clear()  # engaged paths -> metrics['solver_paths']
    if method not in ("auto", "chol", "dual", "eigh", "svd"):
        raise ValueError(
            f"method must be one of 'auto', 'chol', 'dual', 'eigh', "
            f"'svd'; got {method!r}"
        )
    if len(Xs) < 2:
        raise ValueError("stacking needs >= 2 feature spaces")
    if (X_tests is None) != (y_test is None):
        raise ValueError("X_tests and y_test must be given together")
    T = Xs[0].shape[0]
    V = Y.shape[1]
    # Mismatched row counts would otherwise be SILENTLY clamped by JAX's
    # out-of-bounds gather semantics inside the fold refits — garbage
    # blends with no error (banded gets this check for free from its
    # concatenate).
    for s, X in enumerate(Xs):
        if X.shape[0] != T or Y.shape[0] != T:
            raise ValueError(
                f"feature space {s} has {X.shape[0]} rows; expected "
                f"{T} (= Y rows {Y.shape[0]})"
            )
    if X_tests is not None:
        if len(X_tests) != len(Xs):
            raise ValueError(
                f"{len(X_tests)} test spaces for {len(Xs)} train spaces"
            )
        for s, Xt in enumerate(X_tests):
            if Xt.shape[0] != y_test.shape[0]:
                raise ValueError(
                    f"test space {s} has {Xt.shape[0]} rows; y_test has "
                    f"{y_test.shape[0]}"
                )
            if Xt.shape[1] != Xs[s].shape[1]:
                raise ValueError(
                    f"test space {s} has {Xt.shape[1]} features; train "
                    f"space has {Xs[s].shape[1]}"
                )
    if alphas is None:
        alphas = np.logspace(-1, 8, 10)
    alphas = np.asarray(alphas, np.float32)
    Y_j = jnp.asarray(Y, jnp.float32)
    # One host->device transfer per space, reused by the search, every
    # fold refit, and the full-train refit (transfers over the tunneled
    # TPU link are slow; cf. CLAUDE.md).
    Xs_j = [jnp.asarray(X, jnp.float32) for X in Xs]

    from litcoder_core_tpu.parallel.mesh import resolve_voxel_mesh
    from litcoder_core_tpu.utils.profiling import StageTimer

    vox_mesh = resolve_voxel_mesh(mesh, n_devices, who="fit_stacked_ridge")

    fold_splits = create_folds(T, folding_type, n_inner_folds,
                               chunk_length, seed=seed)

    # Grouped-Cholesky refits (out-of-fold AND full-train test refit)
    # under the standard exactness gates (see module docstring);
    # per-(fold, space) spectral factorization otherwise.
    min_tr = min(len(tr) for tr, _ in fold_splits)
    a_np = np.asarray(alphas)
    chol_oof = (
        method in ("auto", "chol", "dual") and normalpha
        and singcutoff <= 1e-10 and a_np.size
        and float(a_np.min()) >= 0.03
        and all(X.shape[1] <= min_tr for X in Xs)
    )
    svd_method = "auto" if method in ("chol", "dual") else method

    # Whole-brain single-chip route: stream the refit/QP/blend/test
    # stages through voxel chunks (exact — every stage is columnwise in
    # V). Engages when the (T, chunk) transient budget caps the chunk
    # below V, or when the caller asks for a chunk explicitly; requires
    # the grouped-Cholesky gates (the chunk loop reuses per-(fold,
    # space) Grams; a per-chunk spectral refit would refactorize per
    # chunk). A mesh replaces chunking entirely, as in fit_nested_cv.
    if vox_mesh is None and chol_oof:
        cap = _stacked_chunk_cap(T, V)
        chunk_eff = (min(int(voxel_chunk_size), cap)
                     if voxel_chunk_size else cap)
        if chunk_eff < V:
            logger.info(
                "stacked fit: streaming refit/QP/blend/test through "
                "%d-voxel chunks (%d voxels)", chunk_eff, V)
            X_tests_j = ([jnp.asarray(Xt, jnp.float32) for Xt in X_tests]
                         if X_tests is not None else None)
            return _fit_stacked_chunked(
                Xs_j, Y_j, X_tests_j, y_test, alphas, fold_splits,
                normalpha, use_corr, singcutoff, method, n_iter,
                chunk_eff, alpha_fdr, voxel_chunk_size or chunk_eff,
                StageTimer(), V)

    y_test_j = (jnp.asarray(y_test, jnp.float32)
                if y_test is not None else None)
    X_tests_j = ([jnp.asarray(Xt, jnp.float32) for Xt in X_tests]
                 if X_tests is not None else None)
    if vox_mesh is not None:
        from litcoder_core_tpu.parallel.mesh import replicate, shard_voxels
        from litcoder_core_tpu.parallel.step import pad_voxels

        if voxel_chunk_size is not None:
            logger.info(
                "mesh sharding replaces voxel chunking; ignoring "
                "voxel_chunk_size=%d (each device holds 1/%d of the "
                "voxel axis)", voxel_chunk_size, vox_mesh.devices.size,
            )
            voxel_chunk_size = None
        axis = vox_mesh.axis_names[0]
        Y_j, _ = pad_voxels(Y_j, vox_mesh.devices.size)
        Y_j = shard_voxels(Y_j, vox_mesh, axis=axis)
        Xs_j = [replicate(X_j, vox_mesh) for X_j in Xs_j]
        if y_test_j is not None:
            y_test_j, _ = pad_voxels(y_test_j, vox_mesh.devices.size)
            y_test_j = shard_voxels(y_test_j, vox_mesh, axis=axis)
            X_tests_j = [replicate(Xt, vox_mesh) for Xt in X_tests_j]
        logger.info(
            "stacked voxel-sharded fit: %d voxels (+%d pad) over %d "
            "devices", V, Y_j.shape[1] - V, vox_mesh.devices.size,
        )

    def _best_idx(best_values: jnp.ndarray):
        """(V,) index of each voxel's selected alpha in the shared grid,
        sharded like the responses (the per-voxel-index refit kernel's
        selection input must stay columnwise)."""
        b = np.asarray(best_values)
        idx = np.argmax(alphas[None, :] == b[:, None], axis=1).astype(
            np.int32)
        idx_j = jnp.asarray(idx)
        if vox_mesh is not None:
            idx_j = shard_voxels(idx_j, vox_mesh,
                                 axis=vox_mesh.axis_names[0])
        return idx_j

    timer = StageTimer()
    best_js, tests, all_alphas, best_idxs = [], [], [], []
    with timer.stage("per_space_search_and_test_refit"):
        for s, X_j in enumerate(Xs_j):
            best_j, y_pred_t, best = _space_alphas_and_test(
                X_j, Y_j, fold_splits, alphas, normalpha, use_corr,
                singcutoff, method,
                None if X_tests_j is None else X_tests_j[s], chol_oof,
                voxel_chunk_size,
                best_idx_fn=_best_idx if vox_mesh is not None else None,
            )
            best_js.append(best_j)
            tests.append(y_pred_t)
            all_alphas.append(best)
            best_idxs.append(_best_idx(best) if vox_mesh is not None
                             else None)
        if tests[0] is not None:
            jax.block_until_ready(tests)

    # Per-fold accumulation of the QP terms: each fold refits every space
    # on its train rows (per-voxel alphas fixed by the space's own search)
    # and predicts its validation rows — out-of-fold by construction.
    # The QP terms accumulate FOLD BY FOLD (validation sets are disjoint,
    # so the fold sums equal the concatenated-OOF Grams exactly) and
    # PAIRWISE per space — no (S, Tva, V) stack copy ever exists; peak
    # extra memory is the S per-space (Tva, V) prediction buffers. That
    # is what keeps whole-brain V on one chip.
    S = len(Xs)
    # QP terms accumulate VOXEL-LAST — (S, S, V)/(S, V) — so every update
    # is columnwise in V and a voxel-sharded Y keeps the whole accumulation
    # local; the (V, S, S) layout the solver wants is an axis permutation
    # (no data movement across shards). Created sharded under a mesh so the
    # at[].add updates never mix placements.
    V_pad = Y_j.shape[1]
    A_sv = jnp.zeros((S, S, V_pad), jnp.float32)
    b_sv = jnp.zeros((S, V_pad), jnp.float32)
    if vox_mesh is not None:
        A_sv = shard_voxels(A_sv, vox_mesh, axis=vox_mesh.axis_names[0])
        b_sv = shard_voxels(b_sv, vox_mesh, axis=vox_mesh.axis_names[0])
    n_rows_used = 0
    timer_cm = timer.stage("oof_refits_and_qp_accumulation")
    timer_cm.__enter__()
    for tr, va in fold_splits:
        preds = []
        for s, X_j in enumerate(Xs_j):
            if chol_oof and vox_mesh is not None:
                preds.append(_pervoxel_chol_pred(
                    X_j[tr], X_j[va], Y_j[tr], alphas, best_idxs[s],
                    normalpha))
            elif chol_oof:
                preds.append(_grouped_chol_pred(
                    X_j[tr], X_j[va], Y_j[tr], all_alphas[s], normalpha))
            else:
                svd = ridge_svd(X_j[tr], None, singcutoff=singcutoff,
                                method=svd_method)
                nal = (best_js[s] * svd.S[0] if normalpha else best_js[s])
                wt = ridge_fit_from_svd(svd, Y_j[tr], nal)
                preds.append(predict(X_j[va], wt))
        Yva = Y_j[va]
        for i in range(S):
            b_sv = b_sv.at[i].add(_colwise_dot(preds[i], Yva))
            for j in range(i, S):
                aij = _colwise_dot(preds[i], preds[j])
                A_sv = A_sv.at[i, j].add(aij)
                if j > i:
                    A_sv = A_sv.at[j, i].add(aij)
        n_rows_used += len(va)
    jax.block_until_ready((A_sv, b_sv))
    timer_cm.__exit__(None, None, None)
    if n_rows_used < T:
        # Rows in no validation fold (e.g. chunked remainders) carry no
        # out-of-fold prediction; they simply never enter the QP sums.
        logger.info("stacking: %d/%d training rows outside all validation "
                    "folds are excluded from the blend fit",
                    T - n_rows_used, T)
    with timer.stage("blend_fista"):
        w = simplex_lsq(jnp.moveaxis(A_sv, -1, 0), b_sv.T,
                        n_iter=n_iter)               # (V_pad, S)
        stack_weights = np.asarray(w)[:V]            # pad stripped
    best_alphas = np.stack(all_alphas)[:, :V]        # (S, V)

    # Summary stats only: embedding the full (V, S) list made every
    # metrics JSON tens of MB at whole-brain V (ADVICE r3). The full
    # per-voxel array is the second RETURN value (and is what ModelSaver
    # persists as the model's weights).
    dominant = np.bincount(np.argmax(stack_weights, axis=1),
                           minlength=S) / max(V, 1)
    _record_path(oof_refit=(
        "pervoxel_chol" if chol_oof and vox_mesh is not None
        else ("grouped_chol" if chol_oof else "spectral")))
    metrics: Dict = {
        "solver_paths": dict(_LAST_PATHS),
        "stack_weights_mean": stack_weights.mean(axis=0).tolist(),
        "stack_weights_median": np.median(stack_weights, axis=0).tolist(),
        "stack_dominant_share": dominant.tolist(),
    }
    if X_tests is not None:
        with timer.stage("test_scoring"):
            # Accumulate the blend without stacking (S, Tp, V); everything
            # is columnwise (w and the test preds shard identically under
            # a mesh). Decision statistics strip the sharding pad first.
            y_pred = sum(w[:, s][None, :] * tests[s] for s in range(S))
            corr = np.asarray(pearson_r(y_test_j, y_pred))[:V]
            per_space = [np.asarray(pearson_r(y_test_j, p))[:V]
                         for p in tests]
            pval = pearson_pvalues_f64(corr, y_test.shape[0])
        significant, corrected = bh_fdrcorrection_np(pval, alpha=alpha_fdr)
        metrics.update(_create_metrics_dict(
            corr, pval, corrected, significant, best_alphas,
            int(significant.sum()),
        ))
        metrics["per_space_test_r"] = [p.tolist() for p in per_space]
        logger.info(
            "stacked ridge: median r = %.3f (spaces alone: %s), %d/%d "
            "significant", metrics["median_score"],
            ["%.3f" % float(np.median(p)) for p in per_space],
            metrics["n_significant"], V,
        )
    metrics["stage_seconds"] = timer.report()
    return metrics, stack_weights, best_alphas


class StackedRidgeModel:
    """Object API over fit_stacked_ridge, mirroring BandedRidgeModel:
    fit_predict takes feature SPACES and returns
    (metrics, stack_weights (V, S), best_alphas (S, V)).

    `mesh`/`n_devices` make multi-chip a first-class model option, same as
    NestedCVModel/BandedRidgeModel: every voxel-axis tensor of the stacked
    fit shards over a 1-D device mesh."""

    def __init__(self, model_name: str = "stacked_ridge", seed: int = 0,
                 mesh=None, n_devices: Optional[int] = None):
        self.model_name = model_name
        self.seed = seed
        self.mesh = mesh
        self.n_devices = n_devices

    def fit_predict(self, feature_spaces, targets, X_tests=None,
                    y_test=None, **kwargs):
        kwargs.setdefault("seed", self.seed)
        kwargs.setdefault("mesh", self.mesh)
        kwargs.setdefault("n_devices", self.n_devices)
        return fit_stacked_ridge(feature_spaces, targets, X_tests=X_tests,
                                 y_test=y_test, **kwargs)
