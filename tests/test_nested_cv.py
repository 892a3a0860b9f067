"""Nested-CV solver tests: signal recovery, metric contracts, both modes."""

import numpy as np

from litcoder_core_tpu.models.nested_cv import NestedCVModel, fit_nested_cv

rng = np.random.default_rng(4)


def _synthetic(T=400, D=8, V=30, noise=0.5, n_signal=20):
    """V voxels, first n_signal carry linear signal, rest pure noise."""
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = np.zeros((D, V), np.float32)
    wt[:, :n_signal] = rng.normal(size=(D, n_signal))
    Y = (X @ wt + noise * rng.normal(size=(T, V))).astype(np.float32)
    return X, Y, wt


TRAIN_TEST_KEYS = {
    "median_score", "mean_score", "std_score", "min_score", "max_score",
    "best_alphas", "correlations", "p_values", "corrected_p_values",
    "significant_mask", "n_significant", "percent_significant",
}

FULL_CV_EXTRA_KEYS = {
    "majority_significant_mask", "n_majority_significant",
    "percent_majority_significant",
}


def test_train_test_mode_recovers_signal():
    X, Y, _ = _synthetic()
    Xte = rng.normal(size=(100, 8)).astype(np.float32)
    wt_true = np.linalg.lstsq(X, Y, rcond=None)[0]
    Yte = (Xte @ wt_true + 0.5 * rng.normal(size=(100, 30))).astype(np.float32)

    metrics, weights, best_alphas = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, chunk_length=20, seed=0,
    )
    assert TRAIN_TEST_KEYS <= set(metrics)
    assert weights.shape == (8, 30)
    assert best_alphas.shape == (30,)
    corrs = np.array(metrics["correlations"])
    # Signal voxels predicted well, noise voxels not.
    assert np.median(corrs[:20]) > 0.6
    assert np.median(np.abs(corrs[20:])) < 0.35
    assert metrics["n_significant"] >= 15


def test_full_cv_mode_recovers_signal():
    X, Y, _ = _synthetic(T=500)
    metrics, weights, best_alphas = fit_nested_cv(
        X, Y, n_outer_folds=3, n_inner_folds=3, chunk_length=20, seed=0,
    )
    assert (TRAIN_TEST_KEYS | FULL_CV_EXTRA_KEYS) <= set(metrics)
    assert weights.shape == (8, 30)
    corrs = np.array(metrics["correlations"])
    assert np.median(corrs[:20]) > 0.5
    assert metrics["n_significant"] >= 10


def test_single_alpha_mode():
    X, Y, _ = _synthetic(T=300, V=10, n_signal=10)
    metrics, _, best_alphas = fit_nested_cv(
        X, Y, X_test=X[:50], y_test=Y[:50], single_alpha=True,
        chunk_length=20, seed=0,
    )
    assert len(set(np.round(best_alphas, 6))) == 1


def test_voxel_chunking_matches_unchunked():
    X, Y, _ = _synthetic(T=300, V=25)
    Xte = rng.normal(size=(80, 8)).astype(np.float32)
    Yte = rng.normal(size=(80, 25)).astype(np.float32)
    m1, w1, a1 = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, voxel_chunk_size=None,
    )
    m2, w2, a2 = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, voxel_chunk_size=7,
    )
    assert np.allclose(w1, w2, atol=1e-5)
    assert np.array_equal(a1, a2)
    assert np.allclose(m1["correlations"], m2["correlations"], atol=1e-5)


def test_seed_reproducibility():
    X, Y, _ = _synthetic(T=300)
    m1, w1, _ = fit_nested_cv(X, Y, X_test=X[:50], y_test=Y[:50], seed=5)
    m2, w2, _ = fit_nested_cv(X, Y, X_test=X[:50], y_test=Y[:50], seed=5)
    assert np.allclose(w1, w2)
    assert m1["median_score"] == m2["median_score"]


def test_normalization_path():
    X, Y, _ = _synthetic(T=300)
    X = X * 100 + 7  # un-normalized scales
    metrics, _, _ = fit_nested_cv(
        X, Y, X_test=X[:50], y_test=Y[:50],
        normalize_features=True, normalize_targets=True, seed=0,
    )
    assert np.isfinite(metrics["median_score"])


def test_model_class_wrapper():
    X, Y, _ = _synthetic(T=300, V=12, n_signal=12)
    model = NestedCVModel(model_name="ridge_regression", seed=0)
    metrics, weights, alphas = model.fit_predict(
        X, Y, X_test=X[:60], y_test=Y[:60]
    )
    assert metrics["median_score"] > 0.5  # train overlap -> high corr
    assert weights.shape == (8, 12)


def test_use_corr_false_path():
    X, Y, _ = _synthetic(T=300, V=10, n_signal=10)
    metrics, _, _ = fit_nested_cv(
        X, Y, X_test=X[:50], y_test=Y[:50], use_corr=False, seed=0,
    )
    assert np.isfinite(metrics["median_score"])


def test_return_weights_false():
    X, Y, _ = _synthetic(T=300, V=10, n_signal=10)
    m, w, a = fit_nested_cv(
        X, Y, X_test=X[:50], y_test=Y[:50], seed=0, return_weights=False,
    )
    assert w is None
    assert np.isfinite(m["median_score"])


def test_complement_fast_path_matches_svd_path():
    """The complement-Gram eigh fast path must match the direct svd path."""
    X, Y, _ = _synthetic(T=400, V=20)
    Xte = rng.normal(size=(80, 8)).astype(np.float32)
    Yte = rng.normal(size=(80, 20)).astype(np.float32)
    m_fast, w_fast, a_fast = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, method="eigh",
        chunk_length=20,
    )
    m_ref, w_ref, a_ref = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, method="svd",
        chunk_length=20,
    )
    assert np.array_equal(a_fast, a_ref)  # coarse grid: identical argmax
    assert np.allclose(m_fast["correlations"], m_ref["correlations"],
                       atol=2e-3)
    assert np.allclose(w_fast, w_ref, atol=3e-3)


def test_complement_path_with_voxel_chunking():
    X, Y, _ = _synthetic(T=400, V=23)
    Xte = rng.normal(size=(80, 8)).astype(np.float32)
    Yte = rng.normal(size=(80, 23)).astype(np.float32)
    m1, w1, a1 = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, method="eigh",
        voxel_chunk_size=None,
    )
    m2, w2, a2 = fit_nested_cv(
        X, Y, X_test=Xte, y_test=Yte, seed=0, method="eigh",
        voxel_chunk_size=6,
    )
    assert np.array_equal(a1, a2)
    assert np.allclose(m1["correlations"], m2["correlations"], atol=1e-5)


def test_fast_scan_selects_same_alphas():
    """bf16 scan changes scores by <1e-3 but the coarse-grid argmax should
    be stable (opt-in knob; full-precision default guards parity)."""
    X, Y, _ = _synthetic(T=400, V=20)
    Xte = rng.normal(size=(80, 8)).astype(np.float32)
    Yte = rng.normal(size=(80, 20)).astype(np.float32)
    m1, _, a1 = fit_nested_cv(X, Y, X_test=Xte, y_test=Yte, seed=0,
                              method="eigh", fast_scan=False,
                              return_weights=False)
    m2, _, a2 = fit_nested_cv(X, Y, X_test=Xte, y_test=Yte, seed=0,
                              method="eigh", fast_scan=True,
                              return_weights=False)
    # On CPU DEFAULT==HIGHEST so this is exact; on TPU the argmax is stable
    # for the logspace grid. Allow a tiny number of tie flips.
    assert np.mean(a1 == a2) > 0.9
    assert abs(m1["median_score"] - m2["median_score"]) < 5e-3


def test_constant_voxel_targets_no_nans():
    """A zero-variance voxel must yield r=0, p=1 and never NaN
    (reference nan policy: nested_cv.py:433-437 via np.nan_to_num)."""
    import numpy as np

    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    rng = np.random.default_rng(0)
    T, D, V = 160, 5, 8
    X = rng.normal(size=(T, D)).astype(np.float32)
    Y = (X @ rng.normal(size=(D, V)) + rng.normal(size=(T, V))).astype(
        np.float32
    )
    Y[:, 3] = 2.5  # constant voxel
    Xte = rng.normal(size=(40, D)).astype(np.float32)
    Yte = (Xte @ rng.normal(size=(D, V))).astype(np.float32)
    Yte[:, 3] = 2.5

    m, w, a = fit_nested_cv(X, Y, X_test=Xte, y_test=Yte, chunk_length=10,
                            n_inner_folds=3)
    corr = np.asarray(m["correlations"])
    pv = np.asarray(m["p_values"])
    assert np.isfinite(corr).all() and np.isfinite(pv).all()
    assert corr[3] == 0.0
    assert pv[3] == 1.0
    assert np.isfinite(np.asarray(w)).all()
