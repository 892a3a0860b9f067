"""Column-stat helpers, profiling utilities."""

import numpy as np

from litcoder_core_tpu.utils.core import (
    demean,
    mcorr,
    unmask_correlations_for_plotting,
    xcorr,
    zs,
)
from litcoder_core_tpu.utils.profiling import StageTimer

rng = np.random.default_rng(16)


def test_zs_skips_zero_variance_columns():
    x = np.column_stack([rng.normal(size=20), np.full(20, 3.0)])
    z = zs(x)
    assert abs(z[:, 0].std() - 1.0) < 1e-6
    assert np.allclose(z[:, 1], 0.0)  # demeaned only, no divide-by-zero


def test_demean():
    x = rng.normal(size=(30, 4)) + 5
    assert np.allclose(demean(x).mean(0), 0, atol=1e-6)


def test_mcorr_self_is_one():
    x = rng.normal(size=(50, 3))
    # ddof=0 z-scores -> mean of products is exactly 1 for self-correlation.
    assert np.allclose(mcorr(x, x), 1.0, atol=1e-5)


def test_xcorr_shape():
    a = rng.normal(size=(4, 100))
    b = rng.normal(size=(6, 100))
    out = xcorr(a, b)
    assert out.shape == (4, 6)
    assert np.allclose(np.diag(xcorr(a, a)), 1.0, atol=1e-5)


def test_unmask_correlations():
    full = unmask_correlations_for_plotting(
        np.array([0.5, 0.7]), np.array([1, 3]), 5
    )
    assert np.isnan(full[0]) and full[1] == 0.5 and full[3] == 0.7


def test_stage_timer():
    import time

    timer = StageTimer()
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("b"):
        pass
    with timer.stage("a"):
        pass
    totals = timer.report()
    assert set(totals) == {"a", "b"}
    assert totals["a"] >= 0.01


def test_zscore_1d_vector():
    """1-D input works like the reference's zs lambda (regression)."""
    from litcoder_core_tpu.utils.core import zs

    v = np.array([1.0, 2.0, 3.0, 4.0])
    out = zs(v)
    assert out.shape == (4,)
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-12)
    const = zs(np.full(5, 3.0))
    np.testing.assert_allclose(const, 0.0)  # zero-variance -> demeaned
