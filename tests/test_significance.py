"""Permutation significance as a model-API option (north-star item:
"permutation significance on-device"; the reference is parametric-only,
encoding/models/nested_cv.py:418-477)."""

import numpy as np
import pytest

from litcoder_core_tpu.models.nested_cv import fit_nested_cv

rng = np.random.default_rng(77)


def _problem(T=240, Tp=80, D=8, V=20, noise=0.5):
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + noise * rng.normal(size=(T, V))).astype(np.float32)
    X_test = rng.normal(size=(Tp, D)).astype(np.float32)
    Y_test = (X_test @ wt + noise * rng.normal(size=(Tp, V))).astype(
        np.float32
    )
    return X, Y, X_test, Y_test


KW = dict(alphas=np.logspace(-1, 3, 5), chunk_length=10, n_inner_folds=3,
          seed=0)


def test_permutation_train_test_mode():
    X, Y, X_test, Y_test = _problem()
    n_perm = 200
    m_perm, _, _ = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, significance="permutation",
        n_permutations=n_perm, **KW)
    m_par, _, _ = fit_nested_cv(X, Y, X_test=X_test, y_test=Y_test, **KW)

    # Correlations identical — only the tail changes.
    assert np.allclose(m_perm["correlations"], m_par["correlations"],
                       atol=1e-5)
    p = np.asarray(m_perm["p_values"])
    floor = 1.0 / (n_perm + 1)
    assert np.all(p >= floor - 1e-9) and np.all(p <= 1.0)
    # Strong signal (r ~ 0.97 here): every voxel should hit the floor.
    assert np.allclose(p, floor, atol=1e-6)
    assert m_perm["significance_method"] == "permutation"
    assert "significance_method" not in m_par
    assert m_perm["n_significant"] == Y.shape[1]


def test_permutation_detects_null():
    """Pure-noise targets: permutation p should NOT concentrate at the
    floor, and BH should reject (almost) nothing."""
    X, Y, X_test, Y_test = _problem(noise=1.0)
    Y_null = rng.normal(size=Y.shape).astype(np.float32)
    Yt_null = rng.normal(size=Y_test.shape).astype(np.float32)
    m, _, _ = fit_nested_cv(
        X, Y_null, X_test=X_test, y_test=Yt_null,
        significance="permutation", n_permutations=200, **KW)
    p = np.asarray(m["p_values"])
    assert np.median(p) > 0.05
    assert m["n_significant"] <= 1


def test_permutation_full_cv_mode():
    X, Y, _, _ = _problem(T=300)
    m, _, _ = fit_nested_cv(
        X, Y, significance="permutation", n_permutations=100,
        alphas=np.logspace(-1, 3, 5), chunk_length=10, n_outer_folds=3,
        n_inner_folds=3, seed=0)
    assert m["significance_method"] == "permutation"
    p = np.asarray(m["p_values"])
    assert np.all((p > 0) & (p <= 1))
    # Fisher-combined floor across 3 folds of 1/101 each.
    assert m["median_score"] > 0.5
    assert m["n_significant"] > 0


def test_permutation_seeded_reproducible():
    X, Y, X_test, Y_test = _problem()
    m1, _, _ = fit_nested_cv(X, Y, X_test=X_test, y_test=Y_test,
                             significance="permutation",
                             n_permutations=50, **KW)
    m2, _, _ = fit_nested_cv(X, Y, X_test=X_test, y_test=Y_test,
                             significance="permutation",
                             n_permutations=50, **KW)
    assert m1["p_values"] == m2["p_values"]


def test_invalid_significance_raises():
    X, Y, X_test, Y_test = _problem(T=80, Tp=20, V=4)
    with pytest.raises(ValueError, match="significance"):
        fit_nested_cv(X, Y, X_test=X_test, y_test=Y_test,
                      significance="bootstrap", **KW)


def test_permutation_banded():
    """Banded ridge takes the same significance contract as the plain fit:
    identical correlations, floored permutation p-values, the
    significance_method key, and a ValueError on unknown values."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    X, Y, X_test, Y_test = _problem()
    Xs, X_tests = [X[:, :5], X[:, 5:]], [X_test[:, :5], X_test[:, 5:]]
    kw = dict(alphas=np.logspace(-1, 3, 5), n_gammas=3, chunk_length=10,
              n_inner_folds=3, seed=0)
    n_perm = 200
    m_perm, _, _, _ = fit_banded_ridge(
        Xs, Y, X_tests=X_tests, y_test=Y_test, significance="permutation",
        n_permutations=n_perm, **kw)
    m_par, _, _, _ = fit_banded_ridge(
        Xs, Y, X_tests=X_tests, y_test=Y_test, **kw)

    assert np.allclose(m_perm["correlations"], m_par["correlations"],
                       atol=1e-5)
    p = np.asarray(m_perm["p_values"])
    floor = 1.0 / (n_perm + 1)
    assert np.all(p >= floor - 1e-9) and np.all(p <= 1.0)
    assert m_perm["significance_method"] == "permutation"
    assert "significance_method" not in m_par
    with pytest.raises(ValueError, match="significance"):
        fit_banded_ridge(Xs, Y, X_tests=X_tests, y_test=Y_test,
                         significance="bootstrap", **kw)
