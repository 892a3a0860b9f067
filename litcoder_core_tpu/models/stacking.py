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
out-of-fold stack ever exists (peak extra memory is one fold's (S, Tva, V)
predictions — whole-brain-safe). A fixed-iteration accelerated
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
    _create_metrics_dict,
    _find_best_alphas,
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


def _grouped_chol_pred(Xtr, Xpred, Ytr, best: np.ndarray,
                       normalpha: bool):
    """(Tpred, V) ridge predictions with per-voxel alphas, voxels grouped
    by selected alpha — one Cholesky per distinct alpha (the
    eigensolve-free twin of the spectral per-voxel-alpha refit; cf.
    CLAUDE.md: eigh is the TPU wall-clock villain). Serves both the
    out-of-fold refits (Xtr = fold train rows, Xpred = fold val rows)
    and the full-train test refit (Xtr = X, Xpred = X_test)."""
    from litcoder_core_tpu.models.banded import _bucket_width

    G = jnp.dot(Xtr.T, Xtr, precision=_HIGHEST)
    XtY = jnp.dot(Xtr.T, Ytr, precision=_HIGHEST)
    s0 = (jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0)) if normalpha
          else jnp.float32(1.0))
    pred = jnp.zeros((Xpred.shape[0], Ytr.shape[1]), jnp.float32)
    for a in np.unique(best):
        vox = np.nonzero(best == a)[0]
        bkt = _bucket_width(vox.size)
        idx = np.full(bkt, vox[0], np.int32)
        idx[:vox.size] = vox
        pg = _chol_pred_group(G, XtY, Xpred, jnp.asarray(idx),
                              jnp.float32(a) * s0)
        pred = pred.at[:, vox].set(pg[:, :vox.size])
    return pred


def _space_alphas_and_test(X_j, Y_j, fold_splits, alphas, normalpha,
                           use_corr, singcutoff, method, X_test,
                           chol_refit: bool, voxel_chunk_size=None):
    """One feature space's per-voxel alphas (shared inner-CV search — the
    same eigensolve-free paths as fit_nested_cv, incl. the dual kernel
    form for wide spaces) and, optionally, its full-train-refit test
    predictions (Tp, V) — grouped-Cholesky under the standard gates,
    spectral otherwise."""
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
        if chol_refit:
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
) -> Tuple[Dict, np.ndarray, np.ndarray]:
    """Stacked ridge across feature spaces with per-voxel simplex weights.

    Args:
        Xs: list of (T, D_s) training feature spaces.
        X_tests / y_test: matching test spaces / (Tp, V) responses.
        voxel_chunk_size: streams each space's alpha SEARCH through voxel
            chunks (same knob as fit_nested_cv); the refits/blend already
            keep per-fold-sized buffers only.
        Others: same contracts as fit_nested_cv / fit_banded_ridge.

    Returns:
        (metrics, stack_weights (V, S), best_alphas (S, V)).
        metrics mirrors the train/test nested-CV dict (when a test set is
        given; 'best_alphas' holds the per-space (S, V) selections) plus
        'stack_weights' and per-space test correlations 'per_space_test_r'
        — so the stacked r is directly comparable to each space alone.
    """
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
    Y_j = jnp.asarray(Y, jnp.float32)
    # One host->device transfer per space, reused by the search, every
    # fold refit, and the full-train refit (transfers over the tunneled
    # TPU link are slow; cf. CLAUDE.md).
    Xs_j = [jnp.asarray(X, jnp.float32) for X in Xs]
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

    best_js, tests, all_alphas = [], [], []
    for s, X_j in enumerate(Xs_j):
        best_j, y_pred_t, best = _space_alphas_and_test(
            X_j, Y_j, fold_splits, alphas, normalpha, use_corr, singcutoff,
            method, None if X_tests is None else X_tests[s], chol_oof,
            voxel_chunk_size,
        )
        best_js.append(best_j)
        tests.append(y_pred_t)
        all_alphas.append(best)

    # Per-fold accumulation of the QP terms: each fold refits every space
    # on its train rows (per-voxel alphas fixed by the space's own search)
    # and predicts its validation rows — out-of-fold by construction.
    # The QP terms accumulate FOLD BY FOLD (validation sets are disjoint,
    # so the fold sums equal the concatenated-OOF Grams exactly) and
    # PAIRWISE per space — no (S, Tva, V) stack copy ever exists; peak
    # extra memory is the S per-space (Tva, V) prediction buffers. That
    # is what keeps whole-brain V on one chip.
    S = len(Xs)
    A = jnp.zeros((V, S, S), jnp.float32)
    b = jnp.zeros((V, S), jnp.float32)
    n_rows_used = 0
    for tr, va in fold_splits:
        preds = []
        for s, X_j in enumerate(Xs_j):
            if chol_oof:
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
            b = b.at[:, i].add(_colwise_dot(preds[i], Yva))
            for j in range(i, S):
                aij = _colwise_dot(preds[i], preds[j])
                A = A.at[:, i, j].add(aij)
                if j > i:
                    A = A.at[:, j, i].add(aij)
        n_rows_used += len(va)
    if n_rows_used < T:
        # Rows in no validation fold (e.g. chunked remainders) carry no
        # out-of-fold prediction; they simply never enter the QP sums.
        logger.info("stacking: %d/%d training rows outside all validation "
                    "folds are excluded from the blend fit",
                    T - n_rows_used, T)
    w = simplex_lsq(A, b, n_iter=n_iter)             # (V, S)
    stack_weights = np.asarray(w)
    best_alphas = np.stack(all_alphas)               # (S, V)

    metrics: Dict = {"stack_weights": stack_weights.tolist()}
    if X_tests is not None:
        # Accumulate the blend without stacking (S, Tp, V).
        y_pred = sum(w[:, s][None, :] * tests[s] for s in range(S))
        y_test_j = jnp.asarray(y_test, jnp.float32)
        corr = np.asarray(pearson_r(y_test_j, y_pred))
        per_space = [np.asarray(pearson_r(y_test_j, p)) for p in tests]
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
    return metrics, stack_weights, best_alphas


class StackedRidgeModel:
    """Object API over fit_stacked_ridge, mirroring BandedRidgeModel:
    fit_predict takes feature SPACES and returns
    (metrics, stack_weights (V, S), best_alphas (S, V))."""

    def __init__(self, model_name: str = "stacked_ridge", seed: int = 0):
        self.model_name = model_name
        self.seed = seed

    def fit_predict(self, feature_spaces, targets, X_tests=None,
                    y_test=None, **kwargs):
        kwargs.setdefault("seed", self.seed)
        return fit_stacked_ridge(feature_spaces, targets, X_tests=X_tests,
                                 y_test=y_test, **kwargs)
