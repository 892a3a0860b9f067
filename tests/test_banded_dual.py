"""Dual (kernel-ridge) banded scan for WIDE designs (sum D_b > T_train).

Wide banded fits — several large-model feature spaces on a short training
set — previously fell back to one factorization per (gamma, fold). The dual
scan (models/banded.py:_score_gammas_dual) computes per-band kernels
K_b = X_b X_b^T once; each gamma candidate is a weighted kernel SUM
(band scaling by sqrt(gamma_b) gives K_gamma = sum_b gamma_b K_b), folds
take 2-D slices, and each (gamma, alpha) system is one Cholesky — zero
eigendecompositions, the banded twin of nested_cv's dual search.
"""

import logging

import jax
import numpy as np
import pytest

from litcoder_core_tpu.models.banded import fit_banded_ridge

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

rng = np.random.default_rng(55)


def _wide_banded_problem(T=140, Tp=40, D1=120, D2=100, V=24, noise=6.0):
    """sum D_b = 220 > Ttr (~105 at 4 folds): every fold is wide."""
    X1 = rng.normal(size=(T, D1)).astype(np.float32)
    X2 = rng.normal(size=(T, D2)).astype(np.float32)
    w1 = rng.normal(size=(D1, V)).astype(np.float32)
    w2 = 0.2 * rng.normal(size=(D2, V)).astype(np.float32)
    Y = (X1 @ w1 + X2 @ w2
         + noise * rng.normal(size=(T, V))).astype(np.float32)
    X1t = rng.normal(size=(Tp, D1)).astype(np.float32)
    X2t = rng.normal(size=(Tp, D2)).astype(np.float32)
    Yt = (X1t @ w1 + X2t @ w2
          + noise * rng.normal(size=(Tp, V))).astype(np.float32)
    return [X1, X2], Y, [X1t, X2t], Yt


def _kwargs(**extra):
    kw = dict(alphas=np.logspace(-1, 5, 6), n_gammas=4, n_inner_folds=4,
              chunk_length=7, seed=0)
    kw.update(extra)
    return kw


def test_banded_wide_dual_matches_svd_fallback(caplog):
    Xs, Y, Xts, Yt = _wide_banded_problem()
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.banded"):
        m_a, w_a, a_a, g_a = fit_banded_ridge(
            Xs, Y, X_tests=Xts, y_test=Yt, method="auto", **_kwargs())
    assert any("dual cholesky" in r.message for r in caplog.records)
    m_s, w_s, a_s, g_s = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="svd", **_kwargs())
    assert np.array_equal(a_a, a_s)
    assert np.array_equal(g_a, g_s)
    assert np.allclose(m_a["correlations"], m_s["correlations"], atol=1e-4)
    assert np.allclose(w_a, w_s, atol=1e-3)


def test_banded_wide_dual_chunked_matches_unchunked():
    Xs, Y, Xts, Yt = _wide_banded_problem()
    m, _, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", **_kwargs())
    # 7 does not divide V=24: full chunks + tail.
    m_c, _, a_c, g_c = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", voxel_chunk_size=7,
        **_kwargs())
    assert np.array_equal(a, a_c)
    assert np.array_equal(g, g_c)
    assert np.allclose(m["correlations"], m_c["correlations"], atol=1e-5)


def test_banded_forced_dual_on_tall_matches_auto():
    """method='dual' engages the kernel scan regardless of shape (the
    forced-method contract of _dual_search_eligible); on a tall problem it
    must agree with the tall Cholesky scan."""
    Xs, Y, Xts, Yt = _wide_banded_problem(T=520, D1=40, D2=30)
    m_a, _, a_a, g_a = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto",
        **_kwargs(chunk_length=20))
    m_d, _, a_d, g_d = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="dual",
        **_kwargs(chunk_length=20))
    assert np.array_equal(a_a, a_d)
    assert np.array_equal(g_a, g_d)
    assert np.allclose(m_a["correlations"], m_d["correlations"], atol=1e-4)


def test_banded_wide_dual_fast_scan_matches_fp32():
    """On CPU the 'fast' scan is still fp32, so scores must agree exactly;
    this locks the fast_scan wiring through the dual kernels."""
    Xs, Y, Xts, Yt = _wide_banded_problem()
    m, _, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", **_kwargs())
    m_f, _, a_f, g_f = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", fast_scan=True,
        **_kwargs())
    assert np.array_equal(a, a_f)
    assert np.array_equal(g, g_f)
    assert np.allclose(m["correlations"], m_f["correlations"], atol=1e-5)


def test_banded_wide_return_weights_false_returns_none():
    """The spectral refit (wide designs) predicts per group on device, so
    return_weights=False must return None weights (the documented
    fit_nested_cv contract) with identical metrics."""
    Xs, Y, Xts, Yt = _wide_banded_problem()
    m, w, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto",
        return_weights=False, **_kwargs())
    assert w is None
    m2, w2, a2, g2 = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", **_kwargs())
    assert w2 is not None
    assert np.array_equal(a, a2)
    assert np.allclose(m["correlations"], m2["correlations"], atol=1e-5)


@needs_mesh
def test_banded_wide_dual_mesh_invariant():
    """Kbands replicate with Xc; Y's voxel axis only ever row-gathers, so
    the voxel-sharded wide scan must reproduce single-device results
    (V=24 is divisible by 8; pad+strip is locked elsewhere)."""
    Xs, Y, Xts, Yt = _wide_banded_problem()
    m, _, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", **_kwargs())
    m_m, _, a_m, g_m = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, method="auto", n_devices=8,
        **_kwargs())
    assert np.array_equal(a, a_m)
    assert np.array_equal(g, g_m)
    assert np.allclose(m["correlations"], m_m["correlations"], atol=1e-4)
