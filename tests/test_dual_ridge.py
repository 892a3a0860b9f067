"""Dual (kernel-ridge) solver paths for WIDE designs (D > T_train).

The reference's torch SVD (encoding/models/ridge_utils.py:34-67) covers wide
shapes implicitly through the economy SVD; the TPU-native counterpart is the
small-side factorization pair:

- `ridge_svd(method='dual')` — eigh of the (T, T) kernel matrix X X^T (the
  mirror of the tall-design Gram eigh), used by 'auto' whenever T < D;
- the dual Cholesky alpha search (`_find_best_alphas_dual`): K = X X^T once,
  per-fold kernel SLICES, per-(fold, alpha) Cholesky factors — zero
  eigendecompositions, the wide-fold twin of the tall Cholesky search.

These tests lock numerical agreement with the spectral ('svd') path, the
'auto' gating, voxel chunking, full-CV mode, and mesh invariance.
"""

import logging

import jax
import numpy as np
import pytest

from litcoder_core_tpu.models.nested_cv import (
    _chol_search_eligible,
    _dual_search_eligible,
    fit_nested_cv,
)
from litcoder_core_tpu.models.ridge import ridge_corr, ridge_fit, ridge_svd

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

rng = np.random.default_rng(77)


def _wide_problem(T=150, Tp=50, D=260, V=30, noise=4.0):
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + noise * rng.normal(size=(T, V))).astype(np.float32)
    X_test = rng.normal(size=(Tp, D)).astype(np.float32)
    Y_test = (X_test @ wt + noise * rng.normal(size=(Tp, V))).astype(
        np.float32
    )
    return X, Y, X_test, Y_test


def test_ridge_svd_dual_matches_svd_scoring():
    X, Y, X_test, Y_test = _wide_problem()
    alphas = np.logspace(-1, 3, 6).astype(np.float32)
    c_svd = np.asarray(ridge_corr(X, X_test, Y, Y_test, alphas,
                                  method="svd", normalpha=True))
    c_dual = np.asarray(ridge_corr(X, X_test, Y, Y_test, alphas,
                                   method="dual", normalpha=True))
    assert np.allclose(c_svd, c_dual, atol=1e-5)


def test_ridge_svd_dual_matches_svd_weights():
    X, Y, _, _ = _wide_problem()
    valphas = np.full(Y.shape[1], 10.0, np.float32)
    w_svd = np.asarray(ridge_fit(X, Y, valphas, method="svd"))
    w_dual = np.asarray(ridge_fit(X, Y, valphas, method="dual"))
    assert np.allclose(w_svd, w_dual, atol=1e-4)


def test_ridge_svd_auto_picks_dual_when_wide():
    X, _, _, _ = _wide_problem()
    svd = ridge_svd(X, None)  # auto; wide -> dual
    # The dual path materializes U (T, k) from the kernel eigh; the tall
    # path ('eigh') leaves U None. k = T on the dual path (k = D on svd).
    assert svd.U is not None and svd.U.shape == (X.shape[0], X.shape[0])
    assert svd.Vh.shape == (X.shape[0], X.shape[1])
    tall = ridge_svd(X.T @ X, None)  # square counts as tall
    assert tall.U is None


def test_dual_search_eligibility_gates():
    wide_folds = [(np.arange(0, 100), np.arange(100, 130))]
    tall_folds = [(np.arange(0, 300), np.arange(300, 330))]
    a = np.logspace(-1, 3, 5)
    assert _dual_search_eligible("auto", True, a, wide_folds, 260)
    assert not _dual_search_eligible("auto", True, a, tall_folds, 260)
    assert not _chol_search_eligible("auto", True, a, wide_folds, 260)
    assert _dual_search_eligible("dual", False, [0.0], tall_folds, 260)
    assert not _dual_search_eligible("auto", False, a, wide_folds, 260)
    assert not _dual_search_eligible("auto", True, np.array([1e-3]),
                                     wide_folds, 260)
    assert not _dual_search_eligible("auto", True, a, wide_folds, 260,
                                     singcutoff=1e-6)
    assert not _dual_search_eligible("chol", True, a, wide_folds, 260)


def test_unknown_method_raises():
    """A typo'd method must raise instead of silently running the svd
    fallback (both the plain and the banded fit)."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    X, Y, _, _ = _wide_problem(T=60, D=10, V=4)
    with pytest.raises(ValueError, match="method must be one of"):
        fit_nested_cv(X, Y, method="choleski")
    with pytest.raises(ValueError, match="method must be one of"):
        fit_banded_ridge([X, X], Y, method="choleski")


def _fit_kwargs(**extra):
    kwargs = dict(alphas=np.logspace(-1, 4, 8), n_inner_folds=4, seed=0,
                  chunk_length=10, normalpha=True)
    kwargs.update(extra)
    return kwargs


def test_fit_wide_dual_matches_svd_and_auto_routes(caplog):
    X, Y, X_test, Y_test = _wide_problem()
    m_svd, w_svd, a_svd = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="svd", **_fit_kwargs())
    m_dual, w_dual, a_dual = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", **_fit_kwargs())
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        m_auto, _, a_auto = fit_nested_cv(
            X, Y, X_test=X_test, y_test=Y_test, method="auto",
            **_fit_kwargs())

    assert any("dual cholesky" in r.message for r in caplog.records)
    assert np.array_equal(a_svd, a_dual)
    assert np.array_equal(a_dual, a_auto)
    assert np.allclose(m_svd["correlations"], m_dual["correlations"],
                       atol=1e-4)
    assert np.allclose(m_dual["correlations"], m_auto["correlations"],
                       atol=1e-4)
    assert np.allclose(w_svd, w_dual, atol=1e-3)


def test_fit_wide_dual_chunked_matches_unchunked():
    X, Y, X_test, Y_test = _wide_problem()
    m, _, a = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", **_fit_kwargs())
    # 13 does not divide V=30: exercises the full-chunks + tail split.
    m_c, _, a_c = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual",
        voxel_chunk_size=13, **_fit_kwargs())
    assert np.array_equal(a, a_c)
    assert np.allclose(m["correlations"], m_c["correlations"], atol=1e-5)


def test_fit_wide_dual_fast_scan_auto_runs_and_matches():
    """fast_scan='auto' on the dual path: the fp32 calibration subset takes
    the voxel-side kernel (V=512 capped to V=30 here << Tva); on CPU the
    'fast' scan is fp32 so the guard must ACCEPT and match exactly."""
    X, Y, X_test, Y_test = _wide_problem()
    m, _, a = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", **_fit_kwargs())
    m_f, _, a_f = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", fast_scan="auto",
        **_fit_kwargs())
    assert np.array_equal(a, a_f)
    assert np.allclose(m["correlations"], m_f["correlations"], atol=1e-5)


def test_full_cv_wide_dual_matches_svd():
    X, Y, _, _ = _wide_problem(T=200)
    kwargs = dict(alphas=np.logspace(-1, 4, 6), n_inner_folds=3,
                  n_outer_folds=3, seed=0, chunk_length=10, normalpha=True)
    m_svd, _, a_svd = fit_nested_cv(X, Y, method="svd", **kwargs)
    m_dual, _, a_dual = fit_nested_cv(X, Y, method="dual", **kwargs)
    assert np.allclose(a_svd, a_dual)
    assert np.allclose(m_svd["correlations"], m_dual["correlations"],
                       atol=1e-4)


@needs_mesh
def test_fit_wide_dual_mesh_invariant():
    """The dual whole-array kernel only row-gathers Y, so a voxel-sharded
    fit must reproduce the single-device metrics (V=30 is not divisible by
    8: exercises pad+strip on the dual path)."""
    X, Y, X_test, Y_test = _wide_problem()
    m_plain, w_plain, a_plain = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", **_fit_kwargs())
    m_mesh, w_mesh, a_mesh = fit_nested_cv(
        X, Y, X_test=X_test, y_test=Y_test, method="dual", n_devices=8,
        **_fit_kwargs())
    assert np.array_equal(a_plain, a_mesh)
    assert np.allclose(m_plain["correlations"], m_mesh["correlations"],
                       atol=1e-4)
    assert np.allclose(w_plain, w_mesh, atol=1e-3)
