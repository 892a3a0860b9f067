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


def _slsqp_weights(A, b):
    from scipy.optimize import minimize

    S = A.shape[-1]
    out = np.zeros((A.shape[0], S))
    for v in range(A.shape[0]):
        def obj(x, v=v):
            return 0.5 * x @ A[v] @ x - b[v] @ x

        out[v] = minimize(
            obj, np.full(S, 1.0 / S), method="SLSQP",
            bounds=[(0, 1)] * S,
            constraints={"type": "eq", "fun": lambda x: x.sum() - 1},
        ).x
    return out


def test_simplex_lsq_matches_scipy():
    S, V, T = 3, 12, 60
    P = rng.normal(size=(V, T, S))
    y = rng.normal(size=(V, T))
    A = np.einsum("vti,vtj->vij", P, P).astype(np.float32)
    b = np.einsum("vti,vt->vi", P, y).astype(np.float32)
    w = np.asarray(simplex_lsq(A, b))  # DEFAULT iteration budget
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-4) and (w >= -1e-6).all()
    ref = _slsqp_weights(A.astype(np.float64), b.astype(np.float64))
    for v in range(V):
        got = 0.5 * w[v] @ A[v] @ w[v] - b[v] @ w[v]
        want = 0.5 * ref[v] @ A[v] @ ref[v] - b[v] @ ref[v]
        # Compare objectives (minimizers may be non-unique).
        assert got <= want + 1e-3 * max(1.0, abs(want))


def test_simplex_lsq_default_converges_on_correlated_spaces():
    """The WEIGHTS (not just the objective) must be near the QP optimum at
    the DEFAULT iteration budget even when the spaces' predictions are
    highly correlated (adjacent LM layers reach r > 0.99) — the regime
    where plain trace-step PGD demonstrably under-converged."""
    S, V, T = 3, 25, 200
    base = rng.normal(size=(V, T))
    P = np.stack([base + 0.05 * rng.normal(size=(V, T))
                  for _ in range(S)], axis=-1)       # pairwise r ~ 0.999
    y = base + rng.normal(size=(V, T))
    A = np.einsum("vti,vtj->vij", P, P).astype(np.float32)
    b = np.einsum("vti,vt->vi", P, y).astype(np.float32)
    w = np.asarray(simplex_lsq(A, b))  # DEFAULT n_iter
    ref = _slsqp_weights(A.astype(np.float64), b.astype(np.float64))
    assert np.abs(w - ref).max() < 0.03


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
    # Mismatched rows would be SILENTLY clamped by JAX gathers otherwise.
    with pytest.raises(ValueError, match="rows"):
        fit_stacked_ridge([Xs[0], Xs[1][:-5]], Y)
    with pytest.raises(ValueError, match="test space"):
        fit_stacked_ridge(Xs, Y, X_tests=[Xts[0], Xts[1][:-3]], y_test=Yt)
    with pytest.raises(ValueError, match="test spaces"):
        fit_stacked_ridge(Xs, Y, X_tests=Xts[:1], y_test=Yt)


def test_stacking_chol_oof_matches_spectral():
    """The grouped-Cholesky out-of-fold refits (default gates) must
    reproduce the spectral per-(fold, space) path: method='eigh' disables
    the chol gate, everything else identical."""
    Xs, Y, Xts, Yt = _two_space_problem()
    kw = dict(X_tests=Xts, y_test=Yt, alphas=np.logspace(-1, 5, 6),
              n_inner_folds=4, chunk_length=10, seed=0)
    m_a, w_a, a_a = fit_stacked_ridge(Xs, Y, method="auto", **kw)
    m_e, w_e, a_e = fit_stacked_ridge(Xs, Y, method="eigh", **kw)
    assert np.array_equal(a_a, a_e)
    assert np.abs(w_a - w_e).max() < 1e-3
    assert np.allclose(m_a["correlations"], m_e["correlations"], atol=1e-4)


def test_stacking_chunked_matches_unchunked():
    """Round-5 whole-brain route: with voxel_chunk_size set (or the HBM
    cap binding), the refit/QP/blend/test stages stream through voxel
    chunks — exact, because every stage is columnwise in V. Weights,
    alpha selections, and test metrics must reproduce the unchunked fit;
    the engaged path is recorded so a silent fallback fails loudly."""
    Xs, Y, Xts, Yt = _two_space_problem()
    kw = dict(X_tests=Xts, y_test=Yt, alphas=np.logspace(-1, 5, 6),
              n_inner_folds=4, chunk_length=10, seed=0)
    m_u, w_u, a_u = fit_stacked_ridge(Xs, Y, **kw)
    assert m_u["solver_paths"]["oof_refit"] == "grouped_chol"
    for chunk in (7, 16):  # non-divisor (tail) and divisor-with-tail
        m_c, w_c, a_c = fit_stacked_ridge(Xs, Y, voxel_chunk_size=chunk,
                                          **kw)
        assert m_c["solver_paths"]["oof_refit"] == "grouped_chol_chunked"
        np.testing.assert_array_equal(a_u, a_c)
        np.testing.assert_allclose(w_u, w_c, atol=1e-4)
        np.testing.assert_allclose(m_u["correlations"],
                                   m_c["correlations"], atol=1e-5)
        for pu, pc in zip(m_u["per_space_test_r"],
                          m_c["per_space_test_r"]):
            np.testing.assert_allclose(pu, pc, atol=1e-5)
        assert set(m_c["stage_seconds"]) >= {
            "per_space_search", "fold_grams_precompute",
            "oof_refits_and_qp_accumulation", "blend_fista",
            "test_refit_and_scoring"}


def test_stacking_chunked_no_test_set():
    """Chunked driver without a test set: weights/alphas only, and the
    metrics dict carries no test keys (same contract as unchunked)."""
    Xs, Y, _, _ = _two_space_problem()
    kw = dict(alphas=np.logspace(-1, 5, 6), n_inner_folds=4,
              chunk_length=10, seed=0)
    m_u, w_u, a_u = fit_stacked_ridge(Xs, Y, **kw)
    m_c, w_c, a_c = fit_stacked_ridge(Xs, Y, voxel_chunk_size=11, **kw)
    np.testing.assert_array_equal(a_u, a_c)
    np.testing.assert_allclose(w_u, w_c, atol=1e-4)
    assert "median_score" not in m_c and "correlations" not in m_c


def test_stacked_chunk_cap():
    """The cap binds only when the (T, V) slice exceeds the budget:
    whole-brain shapes come back capped (and 512-aligned), small
    problems untouched (cap >= V disables chunking)."""
    from litcoder_core_tpu.models.stacking import _stacked_chunk_cap

    cap = _stacked_chunk_cap(26880, 95556)
    assert 512 <= cap < 95556 and cap % 512 == 0
    assert _stacked_chunk_cap(300, 30) == 30
