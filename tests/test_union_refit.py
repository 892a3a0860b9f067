"""Round-4 fused-refit + alpha-batching kernels.

The fused step's refit now REUSES the woodbury scan's union
eigendecomposition, rank-k corrected for the training rows outside the
fold union (parallel/step._refit_union_woodbury), instead of paying a
second full-Gram factorization — and the woodbury scan factors/solves/
scores a BATCH of alphas per step (models/ridge.score_alpha_grid_woodbury
alpha_batch=) instead of a sequential lax.map. Both must be numerically
interchangeable with the round-1..3 paths they replace; reference
analogue of the refit they must match: the full-train SVD refit of
/root/reference/encoding/models/ridge_regression.py:104-141.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from litcoder_core_tpu.models.ridge import (
    lmax_update,
    score_alpha_grid_woodbury,
)
from litcoder_core_tpu.parallel.step import (
    _refit_full,
    _refit_union_woodbury,
    equal_size_folds,
    nested_cv_step,
)

rng = np.random.default_rng(41)

D, V, A = 48, 60, 10


def _problem(T):
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32) / np.sqrt(D)
    Y = (X @ wt + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    return X, Y, alphas


def _union_products(X, Y, va):
    union = np.sort(np.asarray(va).ravel())
    Xu = X[union]
    G_u = Xu.T @ Xu
    lam, Q = np.linalg.eigh(G_u)
    XtY_u = Xu.T @ Y[union]
    return (jnp.asarray(lam, jnp.float32), jnp.asarray(Q, jnp.float32),
            jnp.asarray(XtY_u, jnp.float32), jnp.asarray(union, jnp.int32))


@pytest.mark.parametrize("T,ch", [(400, 10), (407, 10)])
@pytest.mark.parametrize("normalpha", [True, False])
def test_refit_union_matches_full(T, ch, normalpha):
    """The union-Woodbury refit equals the standalone spectral refit, for
    both k=0 (folds tile T exactly; T=400) and k>0 (7 remainder rows
    outside every val block; T=407)."""
    X, Y, alphas = _problem(T)
    _, va = equal_size_folds(T, 5, ch, seed=0)
    k = T - va.size
    assert (k > 0) == (T == 407)
    lam, Q, XtY_u, union = _union_products(X, Y, va)
    best = np.asarray(alphas)[rng.integers(0, A, size=V)].astype(np.float32)

    w_ref = np.asarray(_refit_full(X, Y, jnp.asarray(best), normalpha,
                                   1e-10, "auto"))
    w_got = np.asarray(_refit_union_woodbury(
        jnp.asarray(X), jnp.asarray(Y), lam, Q, XtY_u, union,
        jnp.asarray(best), jnp.asarray(alphas), normalpha))
    # Both paths are exact algebra on the same full-train ridge problem;
    # differences are f32 roundoff through different factorizations.
    np.testing.assert_allclose(w_got, w_ref, atol=5e-5, rtol=1e-4)


def test_refit_union_dense_oracle():
    """Against the direct dense solve (G + nal^2 I) w = X^T y per voxel —
    independent of BOTH factorizations under test."""
    T = 407
    X, Y, alphas = _problem(T)
    _, va = equal_size_folds(T, 5, 10, seed=0)
    lam, Q, XtY_u, union = _union_products(X, Y, va)
    best = np.asarray(alphas)[rng.integers(0, A, size=V)].astype(np.float32)

    w = np.asarray(_refit_union_woodbury(
        jnp.asarray(X), jnp.asarray(Y), lam, Q, XtY_u, union,
        jnp.asarray(best), jnp.asarray(alphas), True))

    G = (X.T @ X).astype(np.float64)
    s0 = np.sqrt(np.linalg.eigvalsh(G)[-1])
    XtY = (X.T @ Y).astype(np.float64)
    for v in range(0, V, 17):
        nal = float(best[v]) * s0
        w_ref = np.linalg.solve(G + nal * nal * np.eye(D), XtY[:, v])
        np.testing.assert_allclose(w[:, v], w_ref, atol=1e-4, rtol=1e-3)


def test_lmax_update_accuracy():
    """lmax_update(diag(lam) + P^T P) matches dense eigh to ~f32 (the
    refit's normalpha scale)."""
    T = 407
    X, _, _ = _problem(T)
    _, va = equal_size_folds(T, 5, 10, seed=0)
    union = np.sort(np.asarray(va).ravel())
    rem = np.setdiff1d(np.arange(T), union)
    Xu = X[union]
    lam, Q = np.linalg.eigh(Xu.T @ Xu)
    P = X[rem] @ Q
    got = float(lmax_update(jnp.asarray(lam, jnp.float32),
                            jnp.asarray(P, jnp.float32)))
    want = float(np.linalg.eigvalsh(X.T @ X)[-1])
    assert abs(got - want) / want < 1e-5


@pytest.mark.parametrize("alpha_batch", [1, 3, A, 7])
def test_alpha_batch_invariance(alpha_batch):
    """score_alpha_grid_woodbury returns identical score curves for every
    alpha_batch (1 = the round-3 sequential path; 7 exercises the padded
    chunking; A = one fully batched program). The None reference below is
    the memory-minimal one-alpha-at-a-time default (same as 1)."""
    T = 400
    X, Y, alphas = _problem(T)
    _, va = equal_size_folds(T, 5, 10, seed=0)
    lam, Q, XtY_u, union = _union_products(X, Y, va)
    Xva, Yva = X[va[0]], Y[va[0]]
    lam_np = np.asarray(lam)
    P = jnp.asarray(Xva @ np.asarray(Q), jnp.float32)
    XtY_tr = np.asarray(XtY_u) - Xva.T @ Yva
    UR0 = jnp.asarray(np.asarray(Q).T @ XtY_tr, jnp.float32)
    nal = (alphas * np.sqrt(lam_np.max())).astype(np.float32)

    ref = np.asarray(score_alpha_grid_woodbury(
        lam, P, UR0, jnp.asarray(Yva), jnp.asarray(nal), alpha_batch=None))
    got = np.asarray(score_alpha_grid_woodbury(
        lam, P, UR0, jnp.asarray(Yva), jnp.asarray(nal),
        alpha_batch=alpha_batch))
    assert got.shape == (A, V)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_step_forced_refit_fallback_matches():
    """A fold scheme whose union misses MORE than max(256, T//8) rows must
    fall back to the standalone spectral refit — and still match the eigh
    path end to end (the fallback gate in _nested_cv_step_impl)."""
    T = 640
    X, Y, alphas = _problem(T)
    Xt = rng.normal(size=(80, D)).astype(np.float32)
    Yt = (Xt @ np.linalg.lstsq(X, Y, rcond=None)[0]
          + rng.normal(size=(80, V))).astype(np.float32)
    # Hand-built folds covering only 400 of 640 rows -> k=240 > 256? No:
    # max(256, 640//8)=256, k=240 <= 256 engages the union refit; shrink
    # the union to 320 rows so k=320 > 256 forces the fallback.
    perm = np.random.default_rng(3).permutation(T)[:320]
    va = np.sort(perm.reshape(5, 64), axis=1).astype(np.int32)
    tr = np.stack([np.setdiff1d(perm, v) for v in va]).astype(np.int32)
    r_auto = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="auto")
    r_eigh = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="eigh")
    np.testing.assert_array_equal(np.asarray(r_auto.best_alphas),
                                  np.asarray(r_eigh.best_alphas))
    np.testing.assert_allclose(np.asarray(r_auto.weights),
                               np.asarray(r_eigh.weights),
                               atol=1e-5, rtol=1e-4)
