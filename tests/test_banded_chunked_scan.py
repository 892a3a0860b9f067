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


def test_host_streaming_scan_matches_device_resident(monkeypatch):
    """Round-5 whole-brain HBM fix: a HOST (numpy) chunked response
    routes through the streaming scan — the (D, V) cross-product is
    built once by `_xty_streamed` (and reused by the refit: no second
    full-Y pass), per-fold val rows are uploaded and freed — while a
    DEVICE response keeps the device-resident chunk kernel. Both must
    reproduce the unchunked fit exactly (selections) / to fp tolerance
    (scores, weights)."""
    import jax.numpy as jnp

    Xs, Y, Xts, Yt = _tall_banded_problem()
    m, w, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, **_kwargs())

    streams = []
    orig = banded._xty_streamed

    def spy(*args, **kwargs):
        streams.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(banded, "_xty_streamed", spy)
    m_h, w_h, a_h, g_h = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, **_kwargs())
    assert streams == [1], "host (numpy) Y + voxel_chunk must stream " \
                           "the cross-product exactly once"
    m_d, w_d, a_d, g_d = fit_banded_ridge(
        Xs, jnp.asarray(Y), X_tests=Xts, y_test=Yt, voxel_chunk_size=7,
        **_kwargs())
    assert len(streams) == 1, "a device-resident Y must NOT stream"
    for a_c, g_c, m_c, w_c in ((a_h, g_h, m_h, w_h),
                               (a_d, g_d, m_d, w_d)):
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


def test_alpha_subbatched_scan_matches(monkeypatch):
    """Round-5 whole-brain HBM fix: the chunk scorer streams the alpha
    axis through lax.map batches so the (A, Tva, chunk) prediction block
    never materializes whole. Forcing ab=2 (and ab=1, the memory-minimal
    sequential scan) must reproduce the fully-batched numerics."""
    Xs, Y, Xts, Yt = _tall_banded_problem()
    m, w, a, g = fit_banded_ridge(
        Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, **_kwargs())
    for forced_ab in (1, 2, 3):
        monkeypatch.setattr(banded, "_scan_alpha_batch",
                            lambda *args, **kw: forced_ab)
        m_b, w_b, a_b, g_b = fit_banded_ridge(
            Xs, Y, X_tests=Xts, y_test=Yt, voxel_chunk_size=7, **_kwargs())
        np.testing.assert_array_equal(a, a_b)
        np.testing.assert_array_equal(g, g_b)
        np.testing.assert_allclose(m["correlations"], m_b["correlations"],
                                   atol=1e-5)
        np.testing.assert_allclose(w, w_b, atol=1e-4)


def test_scan_memory_budget_helpers():
    """_scan_chunk_cap / _scan_alpha_batch: the whole-brain shapes that
    RESOURCE_EXHAUSTED'd the chip must come out capped, small problems
    untouched, and the alpha batch is always a divisor."""
    # Whole-brain T: an 8192-voxel chunk's (T, chunk) slice is ~0.9 GB ->
    # capped; the cap is a multiple of 512.
    cap = banded._scan_chunk_cap(26880, 8192)
    assert cap < 8192 and cap % 512 == 0 and cap >= 1024
    # Small problems keep their requested chunk.
    assert banded._scan_chunk_cap(240, 7) == 7
    # Divisor property + budget monotonicity.
    for a_n in (6, 10, 12):
        ab = banded._scan_alpha_batch(a_n, 5376, cap)
        assert a_n % ab == 0
        assert 4 * ab * 5376 * cap <= 256 * 2**20 or ab == 1
    # Tiny shapes: the whole grid fits one batch.
    assert banded._scan_alpha_batch(6, 60, 7) == 6


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
