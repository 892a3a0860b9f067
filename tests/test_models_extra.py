"""Linear / sklearn-wrapper / banded-ridge model tests."""

import numpy as np
import pytest

from litcoder_core_tpu.models.banded import (
    BandedRidgeModel,
    fit_banded_ridge,
    sample_gammas,
)
from litcoder_core_tpu.models.linear import LinearPredictivityModel
from litcoder_core_tpu.models.sklearn_model import SklearnPredictivityModel

rng = np.random.default_rng(12)


def _linear_data(T=200, D=6, V=8, noise=0.3):
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + noise * rng.normal(size=(T, V))).astype(np.float32)
    return X, Y


# ---- LinearPredictivityModel ---------------------------------------------------

def test_linear_model_fit_and_predict(tmp_path):
    X, Y = _linear_data()
    groups = np.repeat(np.arange(4), 50)
    model = LinearPredictivityModel({"n_folds": 4})
    metrics = model.fit(X, Y, groups=groups)
    assert metrics["median_score"] > 0.8
    preds = model.predict(X[:10])
    assert preds.shape == (10, 8)

    model.save(tmp_path / "lin")
    fresh = LinearPredictivityModel({"n_folds": 4})
    fresh.load(tmp_path / "lin")
    assert np.allclose(fresh.predict(X[:10]), preds, atol=1e-4)


def test_linear_model_unfitted_raises():
    model = LinearPredictivityModel({})
    with pytest.raises(ValueError, match="not been fitted"):
        model.predict(np.zeros((3, 2)))


# ---- SklearnPredictivityModel ---------------------------------------------------

def test_sklearn_model_ridge_with_grid(tmp_path):
    X, Y = _linear_data()
    model = SklearnPredictivityModel({
        "model_type": "ridge",
        "n_folds": 3,
        "use_groups": False,
        "param_grid": {"alpha": [0.1, 1.0, 10.0]},
        "inner_cv": 3,
    })
    metrics = model.fit(X, Y)
    assert metrics["median_score"] > 0.8
    assert "alpha" in metrics
    assert metrics["alpha"] in (0.1, 1.0, 10.0)

    model.save(tmp_path / "sk")
    fresh = SklearnPredictivityModel({"model_type": "ridge"})
    fresh.load(tmp_path / "sk")
    assert fresh.predict(X[:5]).shape == (5, 8)


def test_sklearn_model_unknown_type():
    with pytest.raises(ValueError, match="Unsupported model type"):
        SklearnPredictivityModel({"model_type": "forest"})


# ---- banded ridge ---------------------------------------------------------------

def test_sample_gammas():
    g = sample_gammas(3, 7, seed=0)
    assert g.shape == (7, 3)
    assert np.allclose(g.sum(axis=1), 1.0, atol=1e-5)
    assert np.allclose(g[0], 1 / 3)  # uniform first


def test_banded_ridge_prefers_informative_band():
    """Band 0 drives the signal; band 1 is pure high-variance noise. Banded
    ridge should assign most prior variance to band 0 for signal voxels and
    beat the uniform-concatenation fit."""
    T, Tp, D1, D2, V = 400, 120, 8, 8, 16
    X1 = rng.normal(size=(T, D1)).astype(np.float32)
    X2 = (5.0 * rng.normal(size=(T, D2))).astype(np.float32)  # loud noise
    wt = rng.normal(size=(D1, V)).astype(np.float32)
    Y = (X1 @ wt + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    X1t = rng.normal(size=(Tp, D1)).astype(np.float32)
    X2t = (5.0 * rng.normal(size=(Tp, D2))).astype(np.float32)
    Yt = (X1t @ wt + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)

    metrics, weights, best_alphas, best_gammas = fit_banded_ridge(
        [X1, X2], Y, X_tests=[X1t, X2t], y_test=Yt,
        n_gammas=8, n_inner_folds=3, chunk_length=20, seed=0,
    )
    assert weights.shape == (D1 + D2, V)
    assert best_gammas.shape == (V, 2)
    assert metrics["median_score"] > 0.8
    # Informative band gets the dominant share for most voxels.
    assert np.median(best_gammas[:, 0]) > 0.5


def test_banded_ridge_model_class():
    T, V = 200, 6
    X1 = rng.normal(size=(T, 5)).astype(np.float32)
    X2 = rng.normal(size=(T, 4)).astype(np.float32)
    Y = (X1 @ rng.normal(size=(5, V)).astype(np.float32)
         + rng.normal(size=(T, V))).astype(np.float32)
    model = BandedRidgeModel(seed=0, n_gammas=4)
    metrics, weights, alphas, gammas = model.fit_predict(
        [X1, X2], Y, X_tests=[X1[:50], X2[:50]], y_test=Y[:50],
        n_inner_folds=3, chunk_length=10,
    )
    assert np.isfinite(metrics["median_score"])
    assert weights.shape == (9, V)


def test_banded_single_band_reduces_to_ridge():
    """With one band, banded ridge must match the plain solver's scores."""
    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    X, Y = _linear_data(T=300, V=10)
    Xt, Yt = X[:60], Y[:60]
    m_banded, w_b, a_b, g_b = fit_banded_ridge(
        [X], Y, X_tests=[Xt], y_test=Yt, n_gammas=1,
        n_inner_folds=3, chunk_length=20, seed=0,
    )
    m_plain, w_p, a_p = fit_nested_cv(
        X * np.float32(1.0), Y, X_test=Xt, y_test=Yt,
        n_inner_folds=3, chunk_length=20, seed=0,
    )
    # Same folds, same grid; the single gamma=1.0 candidate scales X by 1.
    assert np.allclose(
        m_banded["median_score"], m_plain["median_score"], atol=5e-3
    )


def test_banded_fast_path_matches_fallback():
    """The scaled-Gram fast path must match direct per-gamma factorization."""
    from litcoder_core_tpu.models.banded import _score_gammas, sample_gammas
    import jax.numpy as jnp
    from litcoder_core_tpu.models.folding import create_folds

    T = 240
    X1 = rng.normal(size=(T, 6)).astype(np.float32)
    X2 = rng.normal(size=(T, 5)).astype(np.float32)
    Y = (X1 @ rng.normal(size=(6, 9)).astype(np.float32)
         + rng.normal(size=(T, 9))).astype(np.float32)
    gammas = sample_gammas(2, 4, seed=1)
    folds = create_folds(T, "chunked", 3, 10, seed=0)
    alphas = np.logspace(-1, 3, 5).astype(np.float32)

    fast = np.asarray(_score_gammas(
        [X1, X2], jnp.asarray(Y), gammas, folds, alphas, True, True,
        1e-10, "eigh",
    ))
    slow = np.asarray(_score_gammas(
        [X1, X2], jnp.asarray(Y), gammas, folds, alphas, True, True,
        1e-10, "svd",
    ))
    assert fast.shape == slow.shape == (4, 5, 9)
    assert np.allclose(fast, slow, atol=3e-3)


@pytest.mark.parametrize("method", ["auto", "eigh"])
def test_banded_fast_path_unequal_folds_matches_fallback(method):
    """Chunked folding leaves a remainder fold of a different size at
    realistic T; the shape-grouped fast path (one vmapped dispatch per
    fold-shape group) must match the per-(gamma, fold) fallback — before
    the grouping, ONE odd fold silently dropped the whole scan to the
    ~10x-slower fallback (observed at north-star scale)."""
    from litcoder_core_tpu.models.banded import _score_gammas, sample_gammas
    import jax.numpy as jnp
    from litcoder_core_tpu.models.folding import create_folds

    T = 250  # 25 chunks over 3 folds -> 9/8/8: two shape groups
    X1 = rng.normal(size=(T, 6)).astype(np.float32)
    X2 = rng.normal(size=(T, 5)).astype(np.float32)
    Y = (X1 @ rng.normal(size=(6, 9)).astype(np.float32)
         + rng.normal(size=(T, 9))).astype(np.float32)
    gammas = sample_gammas(2, 4, seed=1)
    folds = create_folds(T, "chunked", 3, 10, seed=0)
    assert len({(len(tr), len(va)) for tr, va in folds}) > 1

    fast = np.asarray(_score_gammas(
        [X1, X2], jnp.asarray(Y), gammas, folds,
        np.logspace(-1, 3, 5).astype(np.float32), True, True, 1e-10,
        method,
    ))
    slow = np.asarray(_score_gammas(
        [X1, X2], jnp.asarray(Y), gammas, folds,
        np.logspace(-1, 3, 5).astype(np.float32), True, True, 1e-10,
        "svd",
    ))
    assert fast.shape == slow.shape == (4, 5, 9)
    assert np.allclose(fast, slow, atol=3e-3)
    # The per-voxel joint (gamma, alpha) selection must be identical.
    assert np.array_equal(np.argmax(fast.reshape(-1, 9), axis=0),
                          np.argmax(slow.reshape(-1, 9), axis=0))


def test_linear_model_default_single_fold():
    """n_folds=1 (the config default) must fit in-sample, not crash in
    GroupKFold (regression: sklearn rejects n_splits=1)."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    Y = X @ rng.normal(size=(3, 5)).astype(np.float32)
    model = LinearPredictivityModel({})
    metrics = model.fit(X, Y)
    assert metrics["median_score"] > 0.99


def test_linear_model_1d_features():
    """1-D feature input is a single regressor column, not a row vector."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=60).astype(np.float32)
    Y = np.outer(x, [1.0, -2.0]) + 0.01 * rng.normal(size=(60, 2))
    model = LinearPredictivityModel({"n_folds": 1})
    metrics = model.fit(x, Y.astype(np.float32))
    assert metrics["median_score"] > 0.9
    preds = model.predict(x)
    assert preds.shape == (60, 2)


def test_banded_input_validation():
    """ADVICE r3: X_tests without y_test and mismatched Y rows used to be
    silently accepted (the latter clamped by JAX out-of-bounds gathers —
    garbage selections, no error)."""
    import pytest

    from litcoder_core_tpu.models.banded import fit_banded_ridge

    rng = np.random.default_rng(3)
    X1 = rng.normal(size=(40, 4)).astype(np.float32)
    X2 = rng.normal(size=(40, 3)).astype(np.float32)
    Y = rng.normal(size=(40, 6)).astype(np.float32)
    Xt = [rng.normal(size=(10, 4)).astype(np.float32),
          rng.normal(size=(10, 3)).astype(np.float32)]
    kw = dict(alphas=[0.1, 1.0], n_gammas=2, n_inner_folds=2,
              chunk_length=5)

    with pytest.raises(ValueError, match="given together"):
        fit_banded_ridge([X1, X2], Y, X_tests=Xt, **kw)
    with pytest.raises(ValueError, match="rows"):
        fit_banded_ridge([X1, X2], Y[:30], **kw)
    with pytest.raises(ValueError, match="test spaces"):
        fit_banded_ridge([X1, X2], Y, X_tests=Xt[:1],
                         y_test=rng.normal(size=(10, 6)).astype(np.float32),
                         **kw)
    with pytest.raises(ValueError, match="test space 0"):
        fit_banded_ridge([X1, X2], Y, X_tests=[Xt[0][:5], Xt[1]],
                         y_test=rng.normal(size=(10, 6)).astype(np.float32),
                         **kw)
    with pytest.raises(ValueError, match="features"):
        fit_banded_ridge([X1, X2], Y,
                         X_tests=[Xt[0][:, :2], Xt[1]],
                         y_test=rng.normal(size=(10, 6)).astype(np.float32),
                         **kw)


def test_banded_prediction_only_matches_weights_mode():
    """return_weights=False routes the chol refit through the per-gamma
    masked all-voxel prediction kernel (_refit_gamma_predict — the
    gather-form groups OOMed at scale); its test metrics must match the
    gather-form weights-mode refit exactly."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    rng = np.random.default_rng(9)
    T, Tp, V = 160, 40, 23
    X1 = rng.normal(size=(T, 6)).astype(np.float32)
    X2 = rng.normal(size=(T, 4)).astype(np.float32)
    w1 = rng.normal(size=(6, V)).astype(np.float32)
    Y = (X1 @ w1 + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    Xt1 = rng.normal(size=(Tp, 6)).astype(np.float32)
    Xt2 = rng.normal(size=(Tp, 4)).astype(np.float32)
    Yt = (Xt1 @ w1 + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)
    kw = dict(alphas=np.logspace(-1, 3, 5), n_gammas=4, chunk_length=8,
              n_inner_folds=3, seed=0)

    m_w, w_w, a_w, g_w = fit_banded_ridge(
        [X1, X2], Y, X_tests=[Xt1, Xt2], y_test=Yt, **kw)
    m_p, w_p, a_p, g_p = fit_banded_ridge(
        [X1, X2], Y, X_tests=[Xt1, Xt2], y_test=Yt, return_weights=False,
        **kw)
    assert m_w["solver_paths"]["banded_refit"] == "grouped_chol"
    assert w_p is None and w_w is not None
    np.testing.assert_array_equal(a_p, a_w)
    np.testing.assert_array_equal(g_p, g_w)
    np.testing.assert_allclose(m_p["correlations"], m_w["correlations"],
                               atol=1e-5)
    assert m_p["n_significant"] == m_w["n_significant"]
