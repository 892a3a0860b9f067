"""Nested cross-validation ridge — the primary encoding model.

Re-implements reference encoding/models/nested_cv.py:18-331 with the same two
modes and the same metrics contract, but as a TPU-resident program:

- the inner alpha search computes ONE SVD per inner fold and scores the whole
  alpha grid on device (reference: fresh SVD + per-alpha Python loop,
  ridge_regression.py:94-141);
- voxelwise Pearson r, p-values, Fisher combination, and BH-FDR are array
  programs (reference: serial host loops over ~95k voxels,
  nested_cv.py:418-477);
- responses stream through the solver in voxel chunks so whole-brain fits
  (~95k voxels x ~27k TRs) never exceed HBM;
- fold shuffling is seeded (`seed` argument) — the reference's unseeded
  random.shuffle (folding.py:86) made runs irreproducible.

Metrics dict keys match the reference exactly
(nested_cv.py:_create_metrics_dict:480-530, _create_full_cv_metrics_dict:533-616).
"""

import logging
from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from litcoder_core_tpu.models.base import BasePredictivityModel
from litcoder_core_tpu.models.folding import create_folds
from litcoder_core_tpu.models.normalizer import DataNormalizer
from litcoder_core_tpu.models.ridge import (
    ridge_corr_from_svd,
    ridge_fit_from_svd,
    ridge_svd,
    predict,
)
from litcoder_core_tpu.ops.stats import (
    bh_fdrcorrection_np,
    fisher_combine_pvalues_f64,
    pearson_pvalues_f64,
    zscore,
)

logger = logging.getLogger(__name__)

Metrics = Dict[str, Union[float, List[float], List[bool]]]


def _voxel_chunks(n_voxels: int, chunk: Optional[int]):
    if chunk is None or chunk >= n_voxels:
        return [(0, n_voxels)]
    return [(lo, min(lo + chunk, n_voxels)) for lo in range(0, n_voxels, chunk)]


from functools import partial

import jax


@partial(jax.jit, static_argnames=("singcutoff", "method"))
def _fold_spectral_states(X, train_idx, val_idx, singcutoff: float,
                          method: str):
    """Batched RidgeSVD over equal-shape folds — computed ONCE per fit and
    reused by every voxel chunk (the factorization depends only on X)."""

    def one_fold(tr, va):
        return ridge_svd(X[tr], X[va], singcutoff=singcutoff, method=method)

    return jax.vmap(one_fold)(train_idx, val_idx)


@partial(jax.jit, static_argnames=("normalpha", "use_corr"))
def _score_chunk_with_states(states, Y_chunk, train_idx, val_idx, alphas,
                             normalpha: bool, use_corr: bool):
    """(A, Vc) mean inner-fold scores for one voxel chunk, reusing the
    precomputed fold spectral states."""

    def one_fold(state, tr, va):
        nal = alphas * state.S[0] if normalpha else alphas
        return ridge_corr_from_svd(state, Y_chunk[tr], Y_chunk[va], nal,
                                   use_corr=use_corr)

    return jax.vmap(one_fold)(states, train_idx, val_idx).mean(axis=0)


# --- complement-Gram fast path (eigh, equal-shape folds) ---------------------
#
# For chunked CV each fold's training rows are "everything except the val
# rows" (up to dropped remainder samples), but even when they aren't, the
# identities below only use the rows actually indexed, so they hold exactly:
#   G_tr    = X_tr^T X_tr = X_all_tr^T X_all_tr computed directly, or
#             equivalently from the union gram minus the val gram when the
#             fold partitions the sample set.
# We exploit the partition structure of chunked folds: every sample row used
# by ANY fold appears in exactly one val fold, so with U = union of fold
# rows, G_tr(f) = G_U - X_va(f)^T X_va(f) and X_tr(f)^T Y = X_U^T Y -
# X_va(f)^T Y_va(f). This removes all (F, T_tr, .) gathers and shrinks the
# dominant matmuls from F*T_tr to T_U + F*T_va rows.


@partial(jax.jit, static_argnames=("singcutoff",))
def _fold_states_complement(X, union_idx, val_idx, singcutoff: float):
    """Per-fold (S, Vh, good, PVh, Xva) via the complement-Gram identity."""
    X = jnp.asarray(X, jnp.float32)
    Xu = X[union_idx]  # (Tu, D) rows used by the fold scheme
    G_union = jnp.dot(Xu.T, Xu, precision=jax.lax.Precision.HIGHEST)

    def one_fold(va):
        Xva = X[va]
        G = G_union - jnp.dot(Xva.T, Xva,
                              precision=jax.lax.Precision.HIGHEST)
        evals, evecs = jnp.linalg.eigh(G)
        evals = jnp.flip(evals)
        evecs = jnp.flip(evecs, axis=1)
        S = jnp.sqrt(jnp.maximum(evals, 0.0))
        Vh = evecs.T
        good = S > singcutoff
        PVh = jnp.dot(Xva, Vh.T, precision=jax.lax.Precision.HIGHEST)
        return S, Vh, good, PVh, Xva

    return jax.vmap(one_fold)(val_idx)


def _score_chunk_complement_body(states, X_union, Y_union_chunk, val_pos,
                                 alphas, normalpha: bool, use_corr: bool,
                                 fast_scan: bool = False):
    """(A, Vc) mean fold scores with UR built by complement products.

    Args:
        states: (S, Vh, good, PVh, Xva) batched over folds.
        X_union/Y_union_chunk: rows restricted to the fold-scheme union.
        val_pos: (F, Tva) positions of each fold's val rows WITHIN the union.
    """
    from litcoder_core_tpu.models.ridge import score_alpha_grid

    S_all, Vh_all, good_all, PVh_all, Xva_all = states
    XtY = jnp.dot(X_union.T, Y_union_chunk,
                  precision=jax.lax.Precision.HIGHEST)  # (D, Vc), shared

    def one_fold(S, Vh, good, PVh, Xva, vp):
        Yva = Y_union_chunk[vp]
        XtY_tr = XtY - jnp.dot(Xva.T, Yva,
                               precision=jax.lax.Precision.HIGHEST)
        inv_s = jnp.where(good, 1.0 / jnp.where(good, S, 1.0), 0.0)
        UR = inv_s[:, None] * jnp.dot(Vh, XtY_tr,
                                      precision=jax.lax.Precision.HIGHEST)
        nal = alphas * S[0] if normalpha else alphas
        return score_alpha_grid(S, good, PVh, UR, Yva, nal,
                                use_corr=use_corr, fast_scan=fast_scan)

    return jax.vmap(one_fold)(
        S_all, Vh_all, good_all, PVh_all, Xva_all, val_pos
    ).mean(axis=0)


@partial(jax.jit, static_argnames=("normalpha", "use_corr", "fast_scan"))
def _score_whole_complement(states, X_union, Y, union_idx, val_pos, alphas,
                            normalpha: bool, use_corr: bool,
                            fast_scan: bool = False):
    """(A, V) scores for ALL voxels in one program with NO voxel slicing.

    Chunking relies on lax.dynamic_slice with a traced start, which the
    SPMD partitioner cannot keep local when the voxel axis is sharded over
    a mesh (it inserts gathers). This whole-array variant keeps every op
    columnwise, so a voxel-sharded Y propagates through with ZERO
    collectives — it is the kernel the mesh path of fit_nested_cv uses
    (sharding replaces chunking: per-device memory is V/n_devices)."""
    return _score_chunk_complement_body(
        states, X_union, Y[union_idx], val_pos, alphas, normalpha,
        use_corr, fast_scan,
    )


@partial(jax.jit,
         static_argnames=("normalpha", "use_corr", "chunk", "n_chunks",
                          "offset", "fast_scan"))
def _score_all_complement(states, X_union, Y, union_idx, val_pos, alphas,
                          normalpha: bool, use_corr: bool, chunk: int,
                          n_chunks: int, offset: int = 0,
                          fast_scan: bool = False):
    """(A, n_chunks*chunk) scores for voxels [offset, offset+n_chunks*chunk)
    — ALL chunks inside one XLA program.

    The chunk loop runs as lax.map (sequential, bounded memory) so the whole
    alpha search is one dispatch — per-chunk host round trips were the
    dominant cost on high-latency device links. Y is passed WHOLE (static
    offset selects the region): eager slicing or padding of the response
    matrix would duplicate ~10 GB on device at whole-brain scale. The
    union-row gather also happens per chunk inside the loop for the same
    reason.
    """
    t = Y.shape[0]

    def body(c):
        Yc = jax.lax.dynamic_slice(Y, (0, offset + c * chunk), (t, chunk))
        return _score_chunk_complement_body(
            states, X_union, Yc[union_idx], val_pos, alphas, normalpha,
            use_corr, fast_scan,
        )

    out = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, A, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(alphas.shape[0], n_chunks * chunk)


# --- Cholesky fold-streaming path (no per-fold eigendecompositions) ----------
#
# TPU profiling shows symmetric eigensolves run far off the MXU roofline
# (~65% of the fused step's wall clock at bench shapes; worse at D=3072).
# For the alpha SEARCH no eigenbasis is needed at all: each fold's scores
# only require pred_a = Xva (G_tr + nal_a^2 I)^-1 X_tr^T Y, and G + a^2 I
# is positive definite for every a > 0 regardless of G's rank, so a
# Cholesky factorization per (fold, alpha) — blocked matmuls, MXU-friendly
# — replaces the fold eigensolve exactly (XtY lies in range(G_tr), so even
# rank-deficient folds match the masked-spectrum formula). The `normalpha`
# scale S[0] comes from a Lanczos lambda-max (models.ridge.lmax_dense).
# Works for ARBITRARY fold shapes (no equal-shape vmap or partition-union
# requirement), streaming one fold at a time so the (A, D, Tva) solve
# factors never coexist across folds.


def _chol_factors_from_gram(G, Xva, alphas, normalpha: bool):
    """(Z_all (A, D, Tva), nal (A,)): per-alpha solve factors for one fold,
    Z_a = (G_tr + nal_a^2 I)^-1 Xva^T, from the fold's training Gram."""
    from litcoder_core_tpu.models.ridge import lmax_dense

    alphas = jnp.asarray(alphas, jnp.float32)
    if normalpha:
        s0 = jnp.sqrt(jnp.maximum(lmax_dense(G), 0.0))
        nal = alphas * s0
    else:
        nal = alphas
    eye = jnp.eye(G.shape[0], dtype=jnp.float32)
    XvaT = jnp.asarray(Xva, jnp.float32).T

    def one_alpha(na):
        L = jnp.linalg.cholesky(G + (na * na) * eye)
        Z = jax.scipy.linalg.solve_triangular(L, XvaT, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, Z, lower=False)

    return jax.lax.map(one_alpha, nal), nal


@partial(jax.jit, static_argnames=("normalpha",))
def _fold_chol_factors(Xtr, Xva, alphas, normalpha: bool):
    """Gather-form factors (arbitrary fold structure)."""
    H = jax.lax.Precision.HIGHEST
    Xtr = jnp.asarray(Xtr, jnp.float32)
    G = jnp.dot(Xtr.T, Xtr, precision=H)
    return _chol_factors_from_gram(G, Xva, alphas, normalpha)


def _score_alphas_from_factors(Z_all, XtY, Yva_c, use_corr: bool,
                               scan_precision):
    """(A, Vc) scores shared by the gather/complement chol scorers: per
    alpha, pred = Z_a^T XtY scored against the val responses."""
    from litcoder_core_tpu.models.ridge import _score_predictions

    zP = zscore(Yva_c, axis=0)
    Pvar = jnp.var(Yva_c, axis=0, ddof=1)

    def one_alpha(Z):
        pred = jnp.dot(Z.T, XtY, precision=scan_precision)  # (Tva, Vc)
        return _score_predictions(pred, Yva_c, zP, Pvar, use_corr)

    return jax.lax.map(one_alpha, Z_all)


@partial(jax.jit, static_argnames=("use_corr", "fast_scan"))
def _score_chunk_chol(Z_all, Xtr, Ytr_c, Yva_c, use_corr: bool,
                      fast_scan: bool = False):
    """(A, Vc) fold scores from precomputed solve factors: the only
    V-dependent work is one X^T Y and the per-alpha prediction matmul.
    fast_scan runs the prediction matmuls at default MXU precision (same
    opt-in contract as models.ridge.score_alpha_grid)."""
    H = jax.lax.Precision.HIGHEST
    scan_precision = jax.lax.Precision.DEFAULT if fast_scan else H
    Ytr_c = jnp.asarray(Ytr_c, jnp.float32)
    Yva_c = jnp.asarray(Yva_c, jnp.float32)
    # Search-side X^T Y feeds only the alpha argmax -> joins fast_scan
    # (the refit recomputes its own cross-products at full precision).
    XtY = jnp.dot(Xtr.T, Ytr_c, precision=scan_precision)  # (D, Vc)
    return _score_alphas_from_factors(Z_all, XtY, Yva_c, use_corr,
                                      scan_precision)


@partial(jax.jit, static_argnames=("normalpha",))
def _complement_fold_factors(X, G_all, va, alphas, normalpha: bool):
    """Complement-form factors: G_tr = G_all - Xva^T Xva; no train gather."""
    H = jax.lax.Precision.HIGHEST
    X = jnp.asarray(X, jnp.float32)
    Xva = X[va]
    G_tr = G_all - jnp.dot(Xva.T, Xva, precision=H)
    Z_all, _ = _chol_factors_from_gram(G_tr, Xva, alphas, normalpha)
    return Z_all


@partial(jax.jit,
         static_argnames=("use_corr", "chunk", "n_chunks", "offset",
                          "fast_scan"))
def _score_fold_chol_all(X, Y, tr, va, Z_all, use_corr: bool,
                         chunk: int, n_chunks: int,
                         offset: int = 0, fast_scan: bool = False):
    """One fold's (A, n_chunks*chunk) scores in ONE XLA program from the
    fold's PRECOMPUTED solve factors (factored once per fold, shared by
    the full-chunk and tail dispatches), lax.map over voxel chunks
    (per-chunk host dispatches were the dominant cost on the tunneled
    link — cf. _score_all_complement). Y is passed whole; a static offset
    selects the chunk region so the response matrix is never duplicated
    on device. Gather form: used when the fold's rows do NOT cover all of
    X (see the complement variant)."""
    X = jnp.asarray(X, jnp.float32)
    Xtr = X[tr]
    t = Y.shape[0]

    def body(c):
        Yc = jax.lax.dynamic_slice(Y, (0, offset + c * chunk), (t, chunk))
        return _score_chunk_chol(Z_all, Xtr, Yc[tr], Yc[va], use_corr,
                                 fast_scan)

    out = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, A, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(Z_all.shape[0],
                                           n_chunks * chunk)


@partial(jax.jit, static_argnames=("use_corr", "fast_scan"))
def _score_fold_chol_whole_complement(X, Y, va, Z_all, use_corr: bool,
                                      fast_scan: bool = False):
    """Whole-array twin of _score_fold_chol_all_complement (no voxel
    slicing) — the mesh path's kernel: with Y voxel-sharded, X^T Y
    partitions on the output columns and every downstream op stays local
    (see _score_whole_complement for why dynamic_slice is avoided)."""
    H = jax.lax.Precision.HIGHEST
    scan_precision = jax.lax.Precision.DEFAULT if fast_scan else H
    X = jnp.asarray(X, jnp.float32)
    Xva = X[va]
    Y = jnp.asarray(Y, jnp.float32)
    Yva = Y[va]
    XtY = (jnp.dot(X.T, Y, precision=scan_precision)
           - jnp.dot(Xva.T, Yva, precision=scan_precision))  # (D, V)
    return _score_alphas_from_factors(Z_all, XtY, Yva, use_corr,
                                      scan_precision)


@partial(jax.jit,
         static_argnames=("use_corr", "chunk", "n_chunks", "offset",
                          "fast_scan"))
def _score_fold_chol_all_complement(X, Y, va, Z_all, use_corr: bool,
                                    chunk: int, n_chunks: int,
                                    offset: int = 0,
                                    fast_scan: bool = False):
    """Complement variant for folds whose train rows = all rows minus the
    val rows: X_tr^T Yc = X^T Yc - Xva^T Yva, so NO (T_tr, .) gather is
    ever materialized — at whole-brain scale the gather buffers (hundreds
    of MB per chunk next to a ~10 GB response matrix) were the difference
    between fitting in HBM and thrashing. Factors come precomputed from
    _complement_fold_factors (shared by the full-chunk and tail calls)."""
    H = jax.lax.Precision.HIGHEST
    scan_precision = jax.lax.Precision.DEFAULT if fast_scan else H
    X = jnp.asarray(X, jnp.float32)
    Xva = X[va]
    t = Y.shape[0]

    def body(c):
        Yc = jax.lax.dynamic_slice(Y, (0, offset + c * chunk), (t, chunk))
        Yva_c = Yc[va]
        # Search-side X^T Y feeds only the alpha argmax -> joins fast_scan.
        XtY = (jnp.dot(X.T, Yc, precision=scan_precision)
               - jnp.dot(Xva.T, Yva_c, precision=scan_precision))  # (D, Vc)
        return _score_alphas_from_factors(Z_all, XtY, Yva_c, use_corr,
                                          scan_precision)

    out = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, A, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(Z_all.shape[0],
                                           n_chunks * chunk)


@jax.jit
def _full_gram(X):
    return jnp.dot(X.T, X, precision=jax.lax.Precision.HIGHEST)


def _folds_cover_all_rows(fold_splits, n_rows: int) -> bool:
    """True iff every fold's train + val rows are exactly range(n_rows)."""
    for tr, va in fold_splits:
        both = np.concatenate([np.asarray(tr), np.asarray(va)])
        if both.size != n_rows:
            return False
        if not np.array_equal(np.sort(both), np.arange(n_rows)):
            return False
    return True


def _find_best_alphas_chol(X, Y, fold_splits, alphas, normalpha: bool,
                           use_corr: bool,
                           voxel_chunk_size: Optional[int],
                           fast_scan: bool = False):
    """Fold-streaming alpha search: zero eigendecompositions, two XLA
    dispatches per fold (full chunks + the non-divisible tail)."""
    n_alphas, n_voxels = len(alphas), Y.shape[1]
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    chunk = (voxel_chunk_size if voxel_chunk_size is not None else n_voxels)
    full = (n_voxels // chunk) * chunk
    complement = _folds_cover_all_rows(fold_splits, X.shape[0])
    G_all = _full_gram(X) if complement else None

    corr_sum = jnp.zeros((n_alphas, n_voxels), jnp.float32)
    for train_idx, val_idx in fold_splits:
        tr = jnp.asarray(train_idx)
        va = jnp.asarray(val_idx)
        # Factor ONCE per fold; both the full-chunk and tail dispatches
        # reuse Z_all (refactorizing for the tail would double the
        # A-Cholesky + Lanczos cost per fold).
        if complement:
            Z_all = _complement_fold_factors(X, G_all, va, alphas,
                                             normalpha)
        else:
            Z_all, _ = _fold_chol_factors(X[tr], X[va], alphas, normalpha)

        def score_fold(c, n_c, off):
            if complement:
                return _score_fold_chol_all_complement(
                    X, Y, va, Z_all, use_corr, c, n_c, off, fast_scan,
                )
            return _score_fold_chol_all(
                X, Y, tr, va, Z_all, use_corr, c, n_c, off, fast_scan,
            )

        if chunk >= n_voxels:
            # No chunking: use the slice-free whole-array kernels (required
            # for mesh-sharded Y; also the cleanest single-chip program).
            if complement:
                fold_scores = _score_fold_chol_whole_complement(
                    X, Y, va, Z_all, use_corr, fast_scan,
                )
            else:
                fold_scores = _score_chunk_chol(Z_all, X[tr], Y[tr], Y[va],
                                                use_corr, fast_scan)
        else:
            parts = []
            if full:
                parts.append(score_fold(chunk, full // chunk, 0))
            if n_voxels > full:
                parts.append(score_fold(n_voxels - full, 1, full))
            fold_scores = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                           else parts[0])
        corr_sum = corr_sum + fold_scores
    return corr_sum / len(fold_splits)


def _chol_search_eligible(method: str, normalpha: bool, alphas,
                          fold_splits, n_features: int,
                          singcutoff: float = 1e-10) -> bool:
    """Gate for the Cholesky search: explicit 'chol', or 'auto' when every
    fold is tall (cost: the D x D Gram must be the small object), the
    alpha grid keeps kappa(G + nal^2 I) ~ 1/min(alpha)^2 f32-safe
    (>= 0.03 -> kappa <~ 1e3; the reference grid starts at 0.1), and
    singcutoff is negligible (the spectral paths MASK directions with
    S <= singcutoff; the Cholesky solve keeps the full spectrum, which is
    only identical when the cutoff sits below f32 noise)."""
    if method == "chol":
        return True
    if method != "auto" or not normalpha or singcutoff > 1e-10:
        return False
    a = np.asarray(alphas)
    if not (a.size and np.all(a >= 0.03)):
        return False
    return all(len(tr) >= n_features for tr, _ in fold_splits)


def _folds_partition_union(fold_splits) -> bool:
    """True iff each fold's train rows = union rows minus its val rows (the
    chunked-fold structure the complement identity requires)."""
    union = np.unique(np.concatenate(
        [np.concatenate([tr, va]) for tr, va in fold_splits]
    ))
    union_set = set(union.tolist())
    for tr, va in fold_splits:
        if set(tr.tolist()) != union_set - set(va.tolist()):
            return False
    return True


def _find_best_alphas(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    fold_splits,
    alphas: np.ndarray,
    single_alpha: bool,
    normalpha: bool,
    use_corr: bool,
    singcutoff: float,
    voxel_chunk_size: Optional[int],
    method: str = "auto",
    fast_scan: bool = False,
) -> np.ndarray:
    """Inner-CV alpha search: mean fold score per (alpha, voxel), then argmax.

    Mirrors nested_cv.py:_find_best_alphas:334-415 — ties break to the first
    (smallest-index) alpha like torch.argmax. When every fold has the same
    shape (chunked folding with n_chunks divisible by n_folds), the folds are
    vmapped into ONE jitted program — identical numerics, one dispatch.

    Search-path order: Cholesky fold-streaming (no eigendecompositions at
    all; any fold shapes) when `_chol_search_eligible`, else the
    complement-Gram eigh path (equal partition-union folds), else batched
    per-fold spectral states, else the per-fold Python loop.
    """
    n_alphas, n_voxels = len(alphas), Y.shape[1]
    alphas_j = jnp.asarray(alphas, jnp.float32)

    shapes = {(len(tr), len(va)) for tr, va in fold_splits}
    ttr, _tva = next(iter(shapes)) if len(shapes) == 1 else (0, 0)
    resolved = method
    if resolved == "auto":
        resolved = "eigh" if ttr >= X.shape[1] else "svd"

    if _chol_search_eligible(method, normalpha, alphas, fold_splits,
                             X.shape[1], singcutoff):
        logger.info(
            "alpha search path: cholesky (eigensolve-free fold streaming)"
        )
        mean_corrs = _find_best_alphas_chol(
            X, Y, fold_splits, alphas_j, normalpha, use_corr,
            voxel_chunk_size, fast_scan,
        )
    elif (len(shapes) == 1 and resolved == "eigh"
            and _folds_partition_union(fold_splits)):
        logger.info(
            "alpha search path: complement-gram eigh (per-fold eigensolves;"
            " the faster cholesky path needs normalpha=True, min(alpha) >="
            " 0.03, singcutoff <= 1e-10, tall folds)"
        )
        # Complement-Gram fast path: no (F, Ttr, .) gathers at all. The
        # union must cover every row any fold touches (train rows outside
        # all val folds included), matching _folds_partition_union.
        union = np.unique(np.concatenate(
            [np.concatenate([tr, va]) for tr, va in fold_splits]
        ))
        val_pos = jnp.asarray(np.stack([
            np.searchsorted(union, va) for _, va in fold_splits
        ]))
        va_idx = jnp.asarray(np.stack([va for _, va in fold_splits]))
        union_j = jnp.asarray(union)
        states = _fold_states_complement(X, union_j, va_idx, singcutoff)
        X_union = jnp.asarray(X, jnp.float32)[union_j]
        Y_j2 = jnp.asarray(Y, jnp.float32)
        chunk = (voxel_chunk_size if voxel_chunk_size is not None
                 else n_voxels)
        # Never pad or duplicate the big response matrix: full chunks run in
        # one lax.map dispatch, the non-divisible tail separately. With
        # chunking off, the slice-free whole-array kernel runs instead
        # (required for mesh-sharded Y).
        if chunk >= n_voxels:
            mean_corrs = _score_whole_complement(
                states, X_union, Y_j2, union_j, val_pos, alphas_j,
                normalpha, use_corr, fast_scan,
            )  # (A, V)
        else:
            full = (n_voxels // chunk) * chunk
            parts = []
            if full:
                parts.append(_score_all_complement(
                    states, X_union, Y_j2, union_j, val_pos, alphas_j,
                    normalpha, use_corr, chunk, full // chunk, 0, fast_scan,
                ))
            if n_voxels > full:
                parts.append(_score_all_complement(
                    states, X_union, Y_j2, union_j, val_pos, alphas_j,
                    normalpha, use_corr, n_voxels - full, 1, full, fast_scan,
                ))
            mean_corrs = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                          else parts[0])  # (A, V)
    elif len(shapes) == 1:
        logger.info("alpha search path: batched per-fold spectral (%s)",
                    resolved)
        tr_idx = jnp.asarray(np.stack([tr for tr, _ in fold_splits]))
        va_idx = jnp.asarray(np.stack([va for _, va in fold_splits]))
        states = _fold_spectral_states(X, tr_idx, va_idx, singcutoff,
                                       resolved)
        chunks = []
        for lo, hi in _voxel_chunks(n_voxels, voxel_chunk_size):
            chunks.append(_score_chunk_with_states(
                states, Y[:, lo:hi], tr_idx, va_idx, alphas_j, normalpha,
                use_corr,
            ))
        mean_corrs = jnp.concatenate(chunks, axis=1)  # (A, V)
    else:
        logger.info(
            "alpha search path: per-fold python loop (unequal fold shapes)"
        )
        corr_sum = jnp.zeros((n_alphas, n_voxels), jnp.float32)
        for train_idx, val_idx in fold_splits:
            tr = jnp.asarray(train_idx)
            va = jnp.asarray(val_idx)
            svd = ridge_svd(X[tr], X[va], singcutoff=singcutoff,
                            method=method)
            nalphas = alphas_j * svd.S[0] if normalpha else alphas_j
            chunks = []
            for lo, hi in _voxel_chunks(n_voxels, voxel_chunk_size):
                Yc = Y[:, lo:hi]
                chunks.append(
                    ridge_corr_from_svd(svd, Yc[tr], Yc[va], nalphas,
                                        use_corr=use_corr)
                )
            corr_sum = corr_sum + jnp.concatenate(chunks, axis=1)
        mean_corrs = corr_sum / len(fold_splits)  # (A, V)

    if single_alpha:
        best_idx = int(jnp.argmax(jnp.mean(mean_corrs, axis=1)))
        best = np.full(n_voxels, float(alphas[best_idx]), dtype=np.float32)
        logger.info("Best single alpha = %.3f for all voxels", alphas[best_idx])
        return best
    best_idx = np.asarray(jnp.argmax(mean_corrs, axis=0))
    return np.asarray(alphas, np.float32)[best_idx]


def _fit_and_score(
    X_train: jnp.ndarray,
    Y_train: jnp.ndarray,
    X_test: jnp.ndarray,
    Y_test: jnp.ndarray,
    valphas: np.ndarray,
    normalpha: bool,
    singcutoff: float,
    voxel_chunk_size: Optional[int],
    method: str = "auto",
    return_weights: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray]:
    """Refit with per-voxel alphas, predict held-out, return
    (weights (D,V) or None, correlations (V,), pvalues (V,)) as numpy.

    return_weights=False skips materializing the (D, V) weight matrix on
    host — for whole-brain fits that's a GB-scale transfer the common
    metrics-only workflow never uses (the reference's ModelSaver likewise
    defaults to save_weights=False, utils.py:330)."""
    n_voxels = Y_train.shape[1]
    # 'chol' is an alpha-SEARCH method; the per-voxel-alpha refit needs a
    # spectral basis (one elementwise (D, V) shrinkage vs A dense solves).
    svd_method = "auto" if method == "chol" else method
    svd = ridge_svd(X_train, None, singcutoff=singcutoff, method=svd_method)
    valphas_j = jnp.asarray(valphas, jnp.float32)
    nalphas = valphas_j * svd.S[0] if normalpha else valphas_j

    if not return_weights:
        # Metrics-only: the whole refit+score runs as ONE dispatch
        # (lax.map over voxel chunks inside jit); the non-divisible tail is
        # a second small dispatch (padding the big matrices would double
        # device memory). Chunking off -> the slice-free whole-array kernel
        # (required for mesh-sharded Y).
        chunk = (voxel_chunk_size if voxel_chunk_size is not None
                 else n_voxels)
        Y_tr = jnp.asarray(Y_train, jnp.float32)
        Y_te = jnp.asarray(Y_test, jnp.float32)
        Xte = jnp.asarray(X_test, jnp.float32)
        if chunk >= n_voxels:
            correlations = np.asarray(
                _refit_score_whole(svd, Y_tr, Y_te, Xte, nalphas)
            )
            return (None, correlations,
                    pearson_pvalues_f64(correlations, Y_test.shape[0]))
        full = (n_voxels // chunk) * chunk
        corr_parts = []
        if full:
            corr_parts.append(_refit_score_all(svd, Y_tr, Y_te, Xte,
                                               nalphas, chunk,
                                               full // chunk, 0))
        if n_voxels > full:
            corr_parts.append(_refit_score_all(svd, Y_tr, Y_te, Xte,
                                               nalphas, n_voxels - full,
                                               1, full))
        correlations = np.asarray(jnp.concatenate(corr_parts))
        return (None, correlations,
                pearson_pvalues_f64(correlations, Y_test.shape[0]))

    # Dispatch every chunk asynchronously; fetch results ONCE at the end
    # (per-chunk np.asarray would serialize on host round trips). p-values
    # come from the float64 host tail, not the device float32 betainc.
    from litcoder_core_tpu.ops.stats import pearson_r

    wt_parts, corr_parts = [], []
    for lo, hi in _voxel_chunks(n_voxels, voxel_chunk_size):
        wt = ridge_fit_from_svd(svd, Y_train[:, lo:hi], nalphas[lo:hi])
        y_pred = predict(X_test, wt)
        wt_parts.append(wt)
        corr_parts.append(pearson_r(Y_test[:, lo:hi], y_pred))
    correlations = np.asarray(jnp.concatenate(corr_parts))
    return (
        np.asarray(jnp.concatenate(wt_parts, axis=1)),
        correlations,
        pearson_pvalues_f64(correlations, Y_test.shape[0]),
    )


@jax.jit
def _refit_score_whole(svd, Y_train, Y_test, X_test, nalphas):
    """Slice-free twin of _refit_score_all for the no-chunking case: with Y
    voxel-sharded over a mesh, the refit weights, predictions, and
    correlations all partition columnwise with zero collectives."""
    from litcoder_core_tpu.ops.stats import pearson_r

    wt = ridge_fit_from_svd(svd, Y_train, nalphas)
    y_pred = predict(X_test, wt)
    return pearson_r(Y_test, y_pred)


@partial(jax.jit, static_argnames=("chunk", "n_chunks", "offset"))
def _refit_score_all(svd, Y_train, Y_test, X_test, nalphas, chunk: int,
                     n_chunks: int, offset: int = 0):
    """(corr,) for voxels [offset, offset+n_chunks*chunk) in one XLA
    program (Y passed whole — see _score_all_complement). Correlations
    only: the model layer recomputes p-values in float64 on host
    (decision-grade tails), so device p-values here would be computed,
    transferred, and thrown away."""
    from litcoder_core_tpu.ops.stats import pearson_r

    tu = Y_train.shape[0]
    tp = Y_test.shape[0]

    def body(c):
        start = offset + c * chunk
        Yc = jax.lax.dynamic_slice(Y_train, (0, start), (tu, chunk))
        Ytc = jax.lax.dynamic_slice(Y_test, (0, start), (tp, chunk))
        nac = jax.lax.dynamic_slice(nalphas, (start,), (chunk,))
        wt = ridge_fit_from_svd(svd, Yc, nac)
        y_pred = predict(X_test, wt)
        return pearson_r(Ytc, y_pred)

    corr = jax.lax.map(body, jnp.arange(n_chunks))
    return corr.reshape(n_chunks * chunk)


def _resolve_mesh(mesh, n_devices: Optional[int]):
    """Resolve the user-facing mesh knobs into a 1-D voxel mesh (or None).

    This is the TPU-native analogue of the reference's in-fit device knob
    (use_gpu + device selection, encoding/models/nested_cv.py:84-95): the
    mesh is an argument of the FIT, not a separate power-user API.
    """
    if mesh is None and n_devices is None:
        return None
    if mesh is None:
        from litcoder_core_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices)
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"fit_nested_cv expects a 1-D (voxel) mesh; got axes "
            f"{mesh.axis_names}"
        )
    if n_devices is not None and mesh.devices.size != n_devices:
        raise ValueError(
            f"mesh has {mesh.devices.size} devices but n_devices="
            f"{n_devices} was requested; pass one or the other"
        )
    return mesh


def fit_nested_cv(
    features: np.ndarray,
    targets: np.ndarray,
    X_test: Optional[np.ndarray] = None,
    y_test: Optional[np.ndarray] = None,
    groups: Optional[np.ndarray] = None,
    folding_type: str = "chunked",
    n_outer_folds: int = 5,
    n_inner_folds: int = 5,
    chunk_length: int = 20,
    alphas: Optional[List[float]] = None,
    alpha_fdr: float = 0.05,
    use_gpu: bool = True,  # accepted for API parity; device = JAX default
    single_alpha: bool = False,
    normalpha: bool = True,
    use_corr: bool = True,
    normalize_features: bool = False,
    normalize_targets: bool = False,
    singcutoff: float = 1e-10,
    seed: int = 0,
    voxel_chunk_size: Optional[int] = None,
    method: str = "auto",
    inner_splits: Optional[List] = None,
    outer_splits: Optional[List] = None,
    return_weights: bool = True,
    fast_scan: bool = False,
    mesh=None,
    n_devices: Optional[int] = None,
) -> Tuple[Metrics, np.ndarray, np.ndarray]:
    """Nested-CV ridge fit. Signature and return contract match
    NestedCVModel.fit_predict (encoding/models/nested_cv.py:18-71), with
    additions: `seed` (reproducible folds), `voxel_chunk_size` (HBM
    streaming; None = all voxels at once), `method`
    ('auto'|'eigh'|'svd' spectral path — eigh of the Gram matrix is the fast
    MXU formulation for tall designs; see models/ridge.py),
    `inner_splits`/`outer_splits` (inject custom CV folds; for full-CV mode
    inner_splits may be a list of per-outer-fold lists), and
    `mesh`/`n_devices` (multi-chip: shard the voxel axis of the responses,
    weights, alphas, and metrics over a 1-D device mesh — the voxelwise
    solve is embarrassingly parallel, so the whole fit runs with zero
    collectives; the TPU-native replacement for the reference's `use_gpu`
    device knob, encoding/models/nested_cv.py:84-95).

    Returns:
        (metrics, weights (n_features, n_voxels), best_alphas (n_voxels,))
    """
    del use_gpu  # JAX places everything on the best available device
    if alphas is None:
        alphas = np.logspace(-1, 8, 10)
    alphas = np.asarray(alphas, np.float32)

    features_j = jnp.asarray(features, jnp.float32)
    targets_j = jnp.asarray(targets, jnp.float32)

    vox_mesh = _resolve_mesh(mesh, n_devices)
    n_voxels_orig = targets_j.shape[1]
    if vox_mesh is not None:
        from litcoder_core_tpu.parallel.mesh import replicate, shard_voxels
        from litcoder_core_tpu.parallel.step import pad_voxels

        if voxel_chunk_size is not None:
            logger.info(
                "mesh sharding replaces voxel chunking (per-device memory "
                "is already V/%d); ignoring voxel_chunk_size=%d",
                vox_mesh.devices.size, voxel_chunk_size,
            )
            voxel_chunk_size = None
        axis = vox_mesh.axis_names[0]
        targets_j, _ = pad_voxels(targets_j, vox_mesh.devices.size)
        targets_j = shard_voxels(targets_j, vox_mesh, axis=axis)
        features_j = replicate(features_j, vox_mesh)
        logger.info(
            "voxel-sharded fit: %d voxels (+%d pad) over %d devices",
            n_voxels_orig, targets_j.shape[1] - n_voxels_orig,
            vox_mesh.devices.size,
        )

    train_test_mode = X_test is not None and y_test is not None

    if train_test_mode:
        logger.info("Running in train-test mode with provided test set")
        X_test_j = jnp.asarray(X_test, jnp.float32)
        y_test_j = jnp.asarray(y_test, jnp.float32)
        if vox_mesh is not None:
            y_test_j, _ = pad_voxels(y_test_j, vox_mesh.devices.size)
            y_test_j = shard_voxels(y_test_j, vox_mesh,
                                    axis=vox_mesh.axis_names[0])
            X_test_j = replicate(X_test_j, vox_mesh)

        if normalize_features or normalize_targets:
            normalizer = DataNormalizer(normalize_features, normalize_targets)
            features_j, targets_j = normalizer.fit_transform(
                features_j, targets_j
            )
            X_test_j, y_test_j = normalizer.transform(X_test_j, y_test_j)

        if inner_splits is None:
            inner_splits = create_folds(
                len(features), folding_type, n_inner_folds, chunk_length,
                None, groups, seed=seed,
            )
        best_valphas = _find_best_alphas(
            features_j, targets_j, inner_splits, alphas, single_alpha,
            normalpha, use_corr, singcutoff, voxel_chunk_size, method,
            fast_scan,
        )
        wt, correlations, pvalues = _fit_and_score(
            features_j, targets_j, X_test_j, y_test_j, best_valphas,
            normalpha, singcutoff, voxel_chunk_size, method,
            return_weights=return_weights,
        )
        if vox_mesh is not None:
            # Strip the sharding pad BEFORE any decision statistic: padded
            # zero-columns carry p=1 and would perturb the BH threshold.
            correlations = correlations[:n_voxels_orig]
            pvalues = pvalues[:n_voxels_orig]
            best_valphas = best_valphas[:n_voxels_orig]
            if wt is not None:
                wt = np.asarray(wt)[:, :n_voxels_orig]
        # pvalues already carry the decision-grade float64 host tail
        # (_fit_and_score computes them from the fetched correlations).
        significant, corrected_pvals = bh_fdrcorrection_np(
            pvalues, alpha=alpha_fdr
        )
        n_significant = int(np.sum(significant))
        metrics = _create_metrics_dict(
            list(correlations), list(pvalues), corrected_pvals, significant,
            best_valphas, n_significant,
        )
        logger.info("Median correlation: %.3f", metrics["median_score"])
        return metrics, wt, best_valphas

    # ---------------- full nested CV mode ----------------
    logger.info("Running in full nested CV mode")
    if outer_splits is None:
        outer_splits = create_folds(
            len(features), folding_type, n_outer_folds, chunk_length, None,
            groups, seed=seed,
        )

    fold_scores, fold_pvalues, fold_valphas = [], [], []
    fold_significant_masks, fold_weights = [], []

    n_outer = len(outer_splits)  # may differ from n_outer_folds if injected
    for fold_idx, (train_idx, test_idx) in enumerate(outer_splits):
        logger.info("Processing fold %d/%d", fold_idx + 1, n_outer)
        tr = jnp.asarray(train_idx)
        te = jnp.asarray(test_idx)
        X_train, X_te = features_j[tr], features_j[te]
        y_train, y_te = targets_j[tr], targets_j[te]

        if normalize_features or normalize_targets:
            normalizer = DataNormalizer(normalize_features, normalize_targets)
            X_train, y_train = normalizer.fit_transform(X_train, y_train)
            X_te, y_te = normalizer.transform(X_te, y_te)

        if inner_splits is not None:
            fold_inner_splits = (inner_splits[fold_idx]
                                 if isinstance(inner_splits[0], list)
                                 else inner_splits)
        elif groups is not None and folding_type == "group":
            inner_groups = np.asarray(groups)[train_idx]
            fold_inner_splits = create_folds(
                len(train_idx), "group", n_inner_folds, groups=inner_groups,
                seed=seed + fold_idx + 1,
            )
        else:
            fold_inner_splits = create_folds(
                len(train_idx), folding_type, n_inner_folds, chunk_length,
                seed=seed + fold_idx + 1,
            )

        best_valphas = _find_best_alphas(
            X_train, y_train, fold_inner_splits, alphas, single_alpha,
            normalpha, use_corr, singcutoff, voxel_chunk_size, method,
            fast_scan,
        )
        fold_valphas.append(best_valphas[:n_voxels_orig])

        wt, correlations, pvalues = _fit_and_score(
            X_train, y_train, X_te, y_te, best_valphas, normalpha, singcutoff,
            voxel_chunk_size, method, return_weights=return_weights,
        )
        if vox_mesh is not None:
            correlations = correlations[:n_voxels_orig]
            pvalues = pvalues[:n_voxels_orig]
            if wt is not None:
                wt = np.asarray(wt)[:, :n_voxels_orig]
        if return_weights:
            fold_weights.append(wt)
        # pvalues are float64 host-tail values from _fit_and_score.
        fold_scores.append(correlations)
        fold_pvalues.append(pvalues)

        significant, _ = bh_fdrcorrection_np(pvalues, alpha=alpha_fdr)
        fold_significant_masks.append(significant)
        logger.info(
            "Fold %d/%d - median r: %.3f, significant: %d/%d",
            fold_idx + 1, n_outer, float(np.median(correlations)),
            int(np.sum(significant)), len(significant),
        )

    all_correlations = np.mean(fold_scores, axis=0)
    all_pvalues = fisher_combine_pvalues_f64(np.stack(fold_pvalues))
    significant_mask, corrected_pvalues = bh_fdrcorrection_np(
        all_pvalues, alpha=alpha_fdr
    )
    n_significant = int(np.sum(significant_mask))

    significance_counts = np.sum(fold_significant_masks, axis=0)
    majority_significant_mask = significance_counts >= (n_outer // 2 + 1)
    n_majority_significant = int(np.sum(majority_significant_mask))

    mean_valphas = np.mean(fold_valphas, axis=0)
    mean_weights = np.mean(fold_weights, axis=0) if return_weights else None

    metrics = _create_full_cv_metrics_dict(
        all_correlations, all_pvalues, corrected_pvalues, significant_mask,
        majority_significant_mask, mean_valphas, n_significant,
        n_majority_significant,
    )
    logger.info("Median correlation: %.3f", metrics["median_score"])
    return metrics, mean_weights, mean_valphas


class NestedCVModel(BasePredictivityModel):
    """Drop-in for the reference NestedCVModel (encoding/models/nested_cv.py:14).

    `mesh`/`n_devices` make multi-chip a first-class model option: the
    voxel axis of every response-side tensor shards over a 1-D device mesh
    for the whole fit (search, refit, scoring) — the TPU-native analogue
    of the reference's in-fit device selection
    (encoding/models/nested_cv.py:84-95)."""

    def __init__(self, model_name: str = "ridge_regression", seed: int = 0,
                 voxel_chunk_size: Optional[int] = None,
                 mesh=None, n_devices: Optional[int] = None):
        super().__init__(model_name)
        self.seed = seed
        self.voxel_chunk_size = voxel_chunk_size
        self.mesh = mesh
        self.n_devices = n_devices

    def fit_predict(self, features, targets, X_test=None, y_test=None,
                    groups=None, **kwargs):
        kwargs.setdefault("seed", self.seed)
        kwargs.setdefault("voxel_chunk_size", self.voxel_chunk_size)
        kwargs.setdefault("mesh", self.mesh)
        kwargs.setdefault("n_devices", self.n_devices)
        return fit_nested_cv(
            features, targets, X_test=X_test, y_test=y_test, groups=groups,
            **kwargs,
        )


def _create_metrics_dict(correlations, pvalues, corrected_pvalues,
                         significant_mask, best_alphas,
                         n_significant) -> Metrics:
    """Train-test metrics, keys identical to nested_cv.py:480-530."""
    correlations_arr = np.asarray(correlations)
    metrics: Metrics = {
        "median_score": float(np.median(correlations_arr)),
        "mean_score": float(np.mean(correlations_arr)),
        "std_score": float(np.std(correlations_arr)),
        "min_score": float(np.min(correlations_arr)),
        "max_score": float(np.max(correlations_arr)),
        "best_alphas": np.asarray(best_alphas).tolist(),
        "correlations": [float(c) for c in correlations],
        "p_values": [float(p) for p in pvalues],
        "corrected_p_values": np.asarray(corrected_pvalues).tolist(),
        "significant_mask": np.asarray(significant_mask).tolist(),
        "n_significant": int(n_significant),
        "percent_significant": float(
            n_significant / len(correlations_arr) * 100
        ),
    }
    if n_significant > 0:
        sig = correlations_arr[np.asarray(significant_mask, bool)]
        metrics.update({
            "median_significant_score": float(np.median(sig)),
            "mean_significant_score": float(np.mean(sig)),
            "min_significant_score": float(np.min(sig)),
            "max_significant_score": float(np.max(sig)),
        })
    return metrics


def _create_full_cv_metrics_dict(all_correlations, all_pvalues,
                                 corrected_pvalues, significant_mask,
                                 majority_significant_mask, mean_valphas,
                                 n_significant,
                                 n_majority_significant) -> Metrics:
    """Full-CV metrics, keys identical to nested_cv.py:533-616."""
    metrics: Metrics = {
        "median_score": float(np.median(all_correlations)),
        "mean_score": float(np.mean(all_correlations)),
        "std_score": float(np.std(all_correlations)),
        "min_score": float(np.min(all_correlations)),
        "max_score": float(np.max(all_correlations)),
        "best_alphas": np.asarray(mean_valphas).tolist(),
        "correlations": np.asarray(all_correlations).tolist(),
        "p_values": np.asarray(all_pvalues).tolist(),
        "corrected_p_values": np.asarray(corrected_pvalues).tolist(),
        "significant_mask": np.asarray(significant_mask).tolist(),
        "majority_significant_mask": np.asarray(
            majority_significant_mask
        ).tolist(),
        "n_significant": int(n_significant),
        "n_majority_significant": int(n_majority_significant),
        "percent_significant": float(
            n_significant / len(all_correlations) * 100
        ),
        "percent_majority_significant": float(
            n_majority_significant / len(all_correlations) * 100
        ),
    }
    if n_significant > 0:
        sig = all_correlations[np.asarray(significant_mask, bool)]
        metrics.update({
            "median_significant_score": float(np.median(sig)),
            "mean_significant_score": float(np.mean(sig)),
            "min_significant_score": float(np.min(sig)),
            "max_significant_score": float(np.max(sig)),
        })
    if n_majority_significant > 0:
        msig = all_correlations[np.asarray(majority_significant_mask, bool)]
        metrics.update({
            "median_majority_significant_score": float(np.median(msig)),
            "mean_majority_significant_score": float(np.mean(msig)),
            "min_majority_significant_score": float(np.min(msig)),
            "max_majority_significant_score": float(np.max(msig)),
        })
    return metrics
