"""Guarded fast_scan='auto': bf16 scan with an fp32 calibration check
(docs/performance.rst 'Precision knobs')."""

import logging

import numpy as np
import pytest

import litcoder_core_tpu.models.nested_cv as ncv

rng = np.random.default_rng(53)


def _problem(T=240, Tp=60, D=8, V=24, noise=0.5):
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


def test_auto_accepts_and_matches_fp32(caplog):
    """On the CPU test backend DEFAULT == fp32, so the bf16 scan trivially
    agrees and 'auto' must both accept AND reproduce the fp32 result."""
    X, Y, X_test, Y_test = _problem()
    m_fp32, _, a_fp32 = ncv.fit_nested_cv(X, Y, X_test=X_test,
                                          y_test=Y_test, **KW)
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        m_auto, _, a_auto = ncv.fit_nested_cv(
            X, Y, X_test=X_test, y_test=Y_test, fast_scan="auto", **KW)
    assert any("ACCEPTED" in r.message for r in caplog.records)
    assert np.allclose(a_auto, a_fp32)
    assert np.allclose(m_auto["correlations"], m_fp32["correlations"],
                       atol=1e-5)


def test_auto_rejection_falls_back_to_fp32(caplog, monkeypatch):
    """Force the guard to reject (threshold > 1) — the result must still be
    the fp32 search's selections."""
    X, Y, X_test, Y_test = _problem()
    monkeypatch.setattr(ncv, "FAST_SCAN_AGREE_THRESHOLD", 1.01)
    m_fp32, _, a_fp32 = ncv.fit_nested_cv(X, Y, X_test=X_test,
                                          y_test=Y_test, **KW)
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        m_auto, _, a_auto = ncv.fit_nested_cv(
            X, Y, X_test=X_test, y_test=Y_test, fast_scan="auto", **KW)
    assert any("REJECTED" in r.message for r in caplog.records)
    assert np.allclose(a_auto, a_fp32)


def test_auto_full_cv_fused(caplog):
    X, Y, _, _ = _problem(T=300)
    kw = dict(alphas=np.logspace(-1, 3, 5), chunk_length=10,
              n_outer_folds=3, n_inner_folds=3, seed=0)
    m_fp32, _, a_fp32 = ncv.fit_nested_cv(X, Y, **kw)
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        m_auto, _, a_auto = ncv.fit_nested_cv(X, Y, fast_scan="auto", **kw)
    assert any("fused full-CV fold" in r.message and "ACCEPTED" in r.message
               for r in caplog.records)
    assert np.allclose(a_auto, a_fp32)
    assert np.allclose(m_auto["correlations"], m_fp32["correlations"],
                       atol=1e-5)


def test_invalid_fast_scan_rejected():
    X, Y, X_test, Y_test = _problem(T=80, Tp=20, V=4)
    with pytest.raises(ValueError, match="fast_scan"):
        ncv.fit_nested_cv(X, Y, X_test=X_test, y_test=Y_test,
                          fast_scan="yes", **KW)


def test_step_rejects_auto():
    from litcoder_core_tpu.parallel.step import (
        equal_size_folds,
        nested_cv_step,
    )

    X, Y, X_test, Y_test = _problem(T=80, Tp=20, V=8)
    tr, va = equal_size_folds(80, 4, 10, seed=0)
    with pytest.raises(ValueError, match="boolean fast_scan"):
        nested_cv_step(X, Y, X_test, Y_test, np.logspace(-1, 3, 4), tr, va,
                       fast_scan="auto")
