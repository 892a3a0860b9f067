"""Whole-brain-safe chunked banded chol scan (round 4).

At V=95,556 the in-jit chunked scan's three nested while loops made XLA's
copy insertion materialize a second full-size (T, V) response — a
compile-time OOM on a 16 GB chip. models/banded._chol_scan_chunked splits
the (fold, gamma, voxel-chunk) loop to the PYTHON level instead: one
compile per chunk shape, the (A, D, Tva) solve factors shared across
chunks per (fold, gamma), the full Y only ever touched by top-level
slices. These tests lock (a) that the path actually ENGAGES for tall
chol-scan problems with voxel_chunk_size, and (b) bitwise-tolerant
equivalence with the unchunked scan. Scan semantics match the per-fold
inner CV of /root/reference/encoding/models/nested_cv.py:334-415 extended
over the gamma grid."""

import numpy as np

import litcoder_core_tpu.models.banded as banded
from litcoder_core_tpu.models.banded import fit_banded_ridge

rng = np.random.default_rng(17)


def _tall_banded_problem(T=240, D1=24, D2=16, V=23, TP=40):
    X1 = rng.normal(size=(T, D1)).astype(np.float32)
    X2 = rng.normal(size=(T, D2)).astype(np.float32)
    w1 = rng.normal(size=(D1, V)).astype(np.float32) / np.sqrt(D1)
    w2 = rng.normal(size=(D2, V)).astype(np.float32) / np.sqrt(D2)
    Y = (X1 @ w1 + 0.3 * X2 @ w2
         + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    X1t = rng.normal(size=(TP, D1)).astype(np.float32)
    X2t = rng.normal(size=(TP, D2)).astype(np.float32)
    Yt = (X1t @ w1 + 0.3 * X2t @ w2
          + 0.5 * rng.normal(size=(TP, V))).astype(np.float32)
    return [X1, X2], Y, [X1t, X2t], Yt


def _kwargs(**extra):
    # min(alpha)=0.1 >= 0.03 + normalpha + tall folds -> chol scan.
    kw = dict(alphas=np.logspace(-1, 5, 6), n_gammas=4, n_inner_folds=4,
              chunk_length=10, seed=0)
    kw.update(extra)
    return kw


def test_chunked_chol_scan_engages_and_matches(monkeypatch):
    Xs, Y, Xts, Yt = _tall_banded_problem()
    m, w, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, **_kwargs())

    calls = []
    orig = banded._chol_scan_chunked

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(banded, "_chol_scan_chunked", spy)
    # 7 does not divide V=23: 3 full chunks + a 2-voxel tail.
    m_c, w_c, a_c, g_c = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, **_kwargs())
    assert calls, "voxel_chunk_size on a tall chol-scan problem must " \
                  "route through the Python-level chunked scan"
    np.testing.assert_array_equal(a, a_c)
    np.testing.assert_array_equal(g, g_c)
    np.testing.assert_allclose(m["correlations"], m_c["correlations"],
                               atol=1e-5)
    np.testing.assert_allclose(w, w_c, atol=1e-4)


def test_chunked_chol_scan_fast_scan_matches(monkeypatch):
    """fast_scan threads through the chunked dispatches (fp32 on CPU, so
    selections must be identical)."""
    Xs, Y, Xts, Yt = _tall_banded_problem()
    m, _, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, **_kwargs())
    m_f, _, a_f, g_f = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, fast_scan=True,
        **_kwargs())
    np.testing.assert_array_equal(a, a_f)
    np.testing.assert_array_equal(g, g_f)
    np.testing.assert_allclose(m["correlations"], m_f["correlations"],
                               atol=1e-5)


def test_chunk_larger_than_v_runs_unchunked():
    """voxel_chunk_size >= V must not chunk (and must not crash)."""
    Xs, Y, Xts, Yt = _tall_banded_problem(V=9)
    m, _, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, **_kwargs())
    m_c, _, a_c, g_c = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=64, **_kwargs())
    np.testing.assert_array_equal(a, a_c)
    np.testing.assert_array_equal(g, g_c)
    np.testing.assert_allclose(m["correlations"], m_c["correlations"],
                               atol=1e-6)
