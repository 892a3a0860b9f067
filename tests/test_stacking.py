"""Stacked regression across feature spaces (models/stacking.py).

Locks: the simplex projection against a brute-force reference, the batched
projected-gradient QP against scipy's SLSQP on the same problems, and the
end-to-end behavior (weights identify the generating space; the stacked
blend does not lose to the best single space)."""

import numpy as np
import pytest

from litcoder_core_tpu.models.stacking import (
    fit_stacked_ridge,
    project_simplex,
    simplex_lsq,
)

rng = np.random.default_rng(21)


def _proj_reference(v):
    """Reference simplex projection (Duchi et al. 2008), plain numpy."""
    u = np.sort(v)[::-1]
    css = np.cumsum(u) - 1.0
    k = np.arange(1, len(v) + 1)
    rho = np.nonzero(u - css / k > 0)[0][-1]
    theta = css[rho] / (rho + 1.0)
    return np.maximum(v - theta, 0.0)


def test_project_simplex_matches_reference():
    for _ in range(50):
        s = rng.integers(2, 6)
        v = rng.normal(scale=3.0, size=s).astype(np.float32)
        got = np.asarray(project_simplex(v))
        want = _proj_reference(v.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert abs(got.sum() - 1.0) < 1e-5 and (got >= 0).all()


def test_project_simplex_already_feasible_is_identity():
    v = np.array([0.2, 0.5, 0.3], np.float32)
    np.testing.assert_allclose(np.asarray(project_simplex(v)), v, atol=1e-6)


def test_simplex_lsq_matches_scipy():
    from scipy.optimize import minimize

    S, V, T = 3, 12, 60
    P = rng.normal(size=(V, T, S))
    y = rng.normal(size=(V, T))
    A = np.einsum("vti,vtj->vij", P, P).astype(np.float32)
    b = np.einsum("vti,vt->vi", P, y).astype(np.float32)
    w = np.asarray(simplex_lsq(A, b, n_iter=2000))
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-4) and (w >= -1e-6).all()

    for v in range(V):
        def obj(x, v=v):
            return 0.5 * x @ A[v] @ x - b[v] @ x

        ref = minimize(
            obj, np.full(S, 1.0 / S), method="SLSQP",
            bounds=[(0, 1)] * S,
            constraints={"type": "eq", "fun": lambda x: x.sum() - 1},
        )
        # Compare objectives (minimizers may be non-unique).
        assert obj(w[v]) <= ref.fun + 1e-3 * max(1.0, abs(ref.fun))


def _two_space_problem(T=300, Tp=80, D1=20, D2=24, V=30, noise=1.0):
    X1 = rng.normal(size=(T, D1)).astype(np.float32)
    X2 = rng.normal(size=(T, D2)).astype(np.float32)
    w1 = rng.normal(size=(D1, V)).astype(np.float32)
    # Space 1 generates the signal; space 2 is pure distractor.
    Y = (X1 @ w1 + noise * rng.normal(size=(T, V))).astype(np.float32)
    X1t = rng.normal(size=(Tp, D1)).astype(np.float32)
    X2t = rng.normal(size=(Tp, D2)).astype(np.float32)
    Yt = (X1t @ w1 + noise * rng.normal(size=(Tp, V))).astype(np.float32)
    return [X1, X2], Y, [X1t, X2t], Yt


def test_stacking_identifies_generating_space():
    Xs, Y, Xts, Yt = _two_space_problem()
    metrics, w, best_alphas = fit_stacked_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, alphas=np.logspace(-1, 5, 6),
        n_inner_folds=4, chunk_length=10, seed=0)
    assert w.shape == (Y.shape[1], 2)
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-4)
    # The generating space should dominate the blend for most voxels.
    assert np.median(w[:, 0]) > 0.8
    assert best_alphas.shape == (2, Y.shape[1])
    # The stacked blend must not lose (beyond noise) to the best space.
    per_space = np.asarray(metrics["per_space_test_r"])
    assert metrics["median_score"] >= np.median(per_space.max(axis=0)) - 0.02
    assert metrics["n_significant"] > 0


def test_stacking_blends_complementary_spaces():
    """When both spaces carry independent signal halves, the blend should
    beat EACH single space (that is stacking's whole point)."""
    T, Tp, D, V = 400, 100, 16, 25
    X1 = rng.normal(size=(T, D)).astype(np.float32)
    X2 = rng.normal(size=(T, D)).astype(np.float32)
    w1 = rng.normal(size=(D, V)).astype(np.float32)
    w2 = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X1 @ w1 + X2 @ w2
         + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    X1t = rng.normal(size=(Tp, D)).astype(np.float32)
    X2t = rng.normal(size=(Tp, D)).astype(np.float32)
    Yt = (X1t @ w1 + X2t @ w2
          + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)
    metrics, w, _ = fit_stacked_ridge(
        [X1, X2], Y, X_tests=[X1t, X2t], y_test=Yt,
        alphas=np.logspace(-1, 5, 6), n_inner_folds=4, chunk_length=10,
        seed=0)
    per_space = np.asarray(metrics["per_space_test_r"])
    assert metrics["median_score"] > np.median(per_space[0]) + 0.05
    assert metrics["median_score"] > np.median(per_space[1]) + 0.05


def test_stacking_validation_errors():
    Xs, Y, Xts, Yt = _two_space_problem(T=60, Tp=20, V=4)
    with pytest.raises(ValueError, match=">= 2 feature spaces"):
        fit_stacked_ridge(Xs[:1], Y)
    with pytest.raises(ValueError, match="given together"):
        fit_stacked_ridge(Xs, Y, X_tests=Xts)
    with pytest.raises(ValueError, match="method must be"):
        fit_stacked_ridge(Xs, Y, method="nope")
