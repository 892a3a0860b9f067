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
predictions — whole-brain-safe). A fixed-iteration projected-gradient loop
(Duchi et al. 2008 simplex projection, a sort over S elements) then runs
vmapped across voxels entirely on device. No per-voxel host loops, no
data-dependent control flow.
"""

import logging
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from litcoder_core_tpu.models.folding import create_folds
from litcoder_core_tpu.models.nested_cv import _find_best_alphas
from litcoder_core_tpu.models.ridge import (
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
def simplex_lsq(A, b, n_iter: int = 300):
    """Batched min_w ||y - P w||^2 on the simplex from A = P^T P (V, S, S)
    and b = P^T y (V, S): projected gradient with the per-voxel Lipschitz
    step 1/trace(A) (trace >= lambda_max for PSD A, so the step is always
    stable). Fixed iteration count keeps the program static; for S <= 5
    and correlated predictors PGD converges to float32 tolerance well
    inside 300 steps."""
    s = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    step = 1.0 / jnp.maximum(tr, 1e-12)                     # (V,)
    w0 = jnp.full(A.shape[:-1], 1.0 / s, A.dtype)           # (V, S)

    def body(_, w):
        grad = jnp.einsum("vij,vj->vi", A, w) - b
        return project_simplex(w - step[:, None] * grad)

    return jax.lax.fori_loop(0, n_iter, body, w0)


def _space_alphas_and_test(X, Y_j, fold_splits, alphas, normalpha,
                           use_corr, singcutoff, method, X_test):
    """One feature space's per-voxel alphas (shared inner-CV search — the
    same eigensolve-free paths as fit_nested_cv, incl. the dual kernel
    form for wide spaces) and, optionally, its full-train-refit test
    predictions (Tp, V)."""
    best = _find_best_alphas(
        jnp.asarray(X, jnp.float32), Y_j, fold_splits,
        np.asarray(alphas, np.float32), single_alpha=False,
        normalpha=normalpha, use_corr=use_corr, singcutoff=singcutoff,
        voxel_chunk_size=None, method=method,
    )
    best_j = jnp.asarray(best, jnp.float32)
    y_pred_test = None
    if X_test is not None:
        svd_full = ridge_svd(jnp.asarray(X, jnp.float32), None,
                             singcutoff=singcutoff,
                             method="auto" if method in ("chol", "dual")
                             else method)
        nal = best_j * svd_full.S[0] if normalpha else best_j
        wt = ridge_fit_from_svd(svd_full, Y_j, nal)
        y_pred_test = predict(jnp.asarray(X_test, jnp.float32), wt)
    return best_j, y_pred_test, np.asarray(best)


@jax.jit
def _stack_qp_terms_fold(P_f, Y_f):
    """One fold's contribution to A (V, S, S) and b (V, S) from its
    out-of-fold predictions P_f (S, Tva, V) and responses Y_f (Tva, V).
    Accumulating per fold (the validation sets are disjoint, so the fold
    sums equal the concatenated-OOF Grams exactly) keeps peak memory at
    one fold's (S, Tva, V) predictions instead of an (S, T, V) stack —
    the difference between fitting whole-brain V on one chip and not."""
    A = jnp.einsum("itv,jtv->vij", P_f, P_f, precision=_HIGHEST)
    b = jnp.einsum("itv,tv->vi", P_f, Y_f, precision=_HIGHEST)
    return A, b


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
    n_iter: int = 300,
) -> Tuple[Dict, np.ndarray, np.ndarray]:
    """Stacked ridge across feature spaces with per-voxel simplex weights.

    Args:
        Xs: list of (T, D_s) training feature spaces.
        X_tests / y_test: matching test spaces / (Tp, V) responses.
        Others: same contracts as fit_nested_cv / fit_banded_ridge.

    Returns:
        (metrics, stack_weights (V, S), best_alphas (S, V)).
        metrics mirrors the train/test nested-CV dict (when a test set is
        given) plus 'stack_weights' and per-space test correlations
        'per_space_test_r' — so the stacked r is directly comparable to
        each space alone.
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
    if alphas is None:
        alphas = np.logspace(-1, 8, 10)
    T = Xs[0].shape[0]
    V = Y.shape[1]
    Y_j = jnp.asarray(Y, jnp.float32)
    fold_splits = create_folds(T, folding_type, n_inner_folds,
                               chunk_length, seed=seed)

    best_js, tests, all_alphas = [], [], []
    for s, X in enumerate(Xs):
        best_j, y_pred_t, best = _space_alphas_and_test(
            X, Y_j, fold_splits, alphas, normalpha, use_corr, singcutoff,
            method, None if X_tests is None else X_tests[s],
        )
        best_js.append(best_j)
        tests.append(y_pred_t)
        all_alphas.append(best)

    # Per-fold accumulation of the QP terms: each fold refits every space
    # on its train rows (per-voxel alphas fixed by the space's own search)
    # and predicts its validation rows — out-of-fold by construction.
    S = len(Xs)
    A = jnp.zeros((V, S, S), jnp.float32)
    b = jnp.zeros((V, S), jnp.float32)
    svd_method = "auto" if method in ("chol", "dual") else method
    n_rows_used = 0
    for tr, va in fold_splits:
        preds = []
        for s, X in enumerate(Xs):
            X_j = jnp.asarray(X, jnp.float32)
            svd = ridge_svd(X_j[tr], None, singcutoff=singcutoff,
                            method=svd_method)
            nal = (best_js[s] * svd.S[0] if normalpha else best_js[s])
            wt = ridge_fit_from_svd(svd, Y_j[tr], nal)
            preds.append(predict(X_j[va], wt))
        P_f = jnp.stack(preds)                       # (S, Tva, V)
        dA, db = _stack_qp_terms_fold(P_f, Y_j[va])
        A = A + dA
        b = b + db
        n_rows_used += len(va)
    if n_rows_used < T:
        # Rows in no validation fold (e.g. chunked remainders) carry no
        # out-of-fold prediction; they simply never enter the QP sums.
        logger.info("stacking: %d/%d training rows outside all validation "
                    "folds are excluded from the blend fit",
                    T - n_rows_used, T)
    w = simplex_lsq(A, b, n_iter=n_iter)             # (V, S)
    stack_weights = np.asarray(w)

    metrics: Dict = {"stack_weights": stack_weights.tolist()}
    if X_tests is not None:
        P_test = jnp.stack(tests)                    # (S, Tp, V)
        y_pred = jnp.einsum("stv,vs->tv", P_test, w)
        y_test_j = jnp.asarray(y_test, jnp.float32)
        corr = np.asarray(pearson_r(y_test_j, y_pred))
        per_space = [np.asarray(pearson_r(y_test_j, p)) for p in P_test]
        pval = pearson_pvalues_f64(corr, y_test.shape[0])
        significant, corrected = bh_fdrcorrection_np(pval, alpha=alpha_fdr)
        n_sig = int(significant.sum())
        metrics.update({
            "median_score": float(np.median(corr)),
            "mean_score": float(np.mean(corr)),
            "std_score": float(np.std(corr)),
            "min_score": float(np.min(corr)),
            "max_score": float(np.max(corr)),
            "correlations": corr.tolist(),
            "p_values": pval.tolist(),
            "corrected_p_values": corrected.tolist(),
            "significant_mask": significant.tolist(),
            "n_significant": n_sig,
            "percent_significant": float(n_sig / V * 100),
            "per_space_test_r": [p.tolist() for p in per_space],
        })
        logger.info(
            "stacked ridge: median r = %.3f (spaces alone: %s), %d/%d "
            "significant", metrics["median_score"],
            ["%.3f" % float(np.median(p)) for p in per_space], n_sig, V,
        )
    return metrics, stack_weights, np.stack(all_alphas)


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
