"""Downsampler facade tests vs the reference's per-TR loop semantics."""

import numpy as np
import pytest

from litcoder_core_tpu.downsample.downsampling import Downsampler

rng = np.random.default_rng(2)


@pytest.fixture
def ds():
    return Downsampler()


def _word_data(n_words=50, dim=7, n_trs=12):
    data = rng.normal(size=(n_words, dim)).astype(np.float32)
    split = sorted(rng.integers(0, n_trs, size=n_words).tolist())
    return data, split, n_trs


def test_available_methods(ds):
    assert set(ds.available_methods) == {
        "rect", "average", "sinc", "lanczos", "last", "gabor",
        "legacy_average", "legacy_last", "sum", "legacy_sum",
    }


def test_method_param_validation(ds):
    with pytest.raises(ValueError, match="Required parameter"):
        ds.downsample(np.zeros((5, 2)), None, None, method="average")
    with pytest.raises(ValueError, match="Unsupported"):
        ds.downsample(np.zeros((5, 2)), None, None, method="nope")


def test_average_matches_loop(ds):
    data, split, n_trs = _word_data()
    out = ds.downsample(data, None, None, method="average",
                        split_indices=split)
    ref = np.zeros((max(split) + 1, data.shape[1]))
    for tr in range(max(split) + 1):
        idx = [i for i, s in enumerate(split) if s == tr]
        if idx:
            ref[tr] = data[idx].mean(axis=0)
    assert np.allclose(out, ref, atol=1e-5)


def test_sum_and_last_match_loop(ds):
    data, split, _ = _word_data()
    n_trs = max(split) + 1
    out_sum = ds.downsample(data, None, None, method="sum",
                            split_indices=split)
    out_last = ds.downsample(data, None, None, method="last",
                             split_indices=split)
    for tr in range(n_trs):
        idx = [i for i, s in enumerate(split) if s == tr]
        if idx:
            assert np.allclose(out_sum[tr], data[idx].sum(axis=0), atol=1e-4)
            assert np.allclose(out_last[tr], data[max(idx)], atol=1e-6)
        else:
            assert np.allclose(out_sum[tr], 0)
            assert np.allclose(out_last[tr], 0)


def test_legacy_variants_match_np_split(ds):
    data = rng.normal(size=(40, 5)).astype(np.float32)
    boundaries = [7, 15, 15, 30]  # includes an empty chunk
    chunks = np.split(data, boundaries)
    for method, fn in [("legacy_average", lambda c: c.mean(axis=0)),
                       ("legacy_sum", lambda c: c.sum(axis=0)),
                       ("legacy_last", lambda c: c[-1])]:
        out = ds.downsample(data, None, None, method=method,
                            split_indices=boundaries)
        assert out.shape == (len(boundaries) + 1, 5)
        for ci, chunk in enumerate(chunks):
            if len(chunk):
                assert np.allclose(out[ci], fn(chunk), atol=1e-4), method
            else:
                assert np.allclose(out[ci], 0), method


def test_rect_matches_loop(ds):
    data_times = np.sort(rng.uniform(0, 60, size=200)).astype(np.float32)
    tr_times = np.arange(1.0, 59.0, 2.0, dtype=np.float32)
    data = rng.normal(size=(200, 4)).astype(np.float32)
    out = ds.downsample(data, data_times, tr_times, method="rect")
    tr = np.mean(np.diff(tr_times))
    ref = np.zeros((len(tr_times), 4))
    for i, t in enumerate(tr_times):
        mask = (data_times >= t - tr / 2) & (data_times < t + tr / 2)
        if np.any(mask):
            ref[i] = data[mask].mean(axis=0)
    assert np.allclose(out, ref, atol=1e-5)


def test_lanczos_through_facade(ds):
    data_times = np.sort(rng.uniform(0, 60, size=150)).astype(np.float32)
    tr_times = np.arange(1.0, 59.0, 2.0, dtype=np.float32)
    data = rng.normal(size=(150, 3)).astype(np.float32)
    out = ds.downsample(data, data_times, tr_times, method="lanczos",
                        window=3, cutoff_mult=1.0)
    assert out.shape == (len(tr_times), 3)
    assert np.isfinite(out).all()


def test_split_poolers_emit_all_trailing_trs(ds):
    """Trailing TRs with no words must still get (zero) rows when tr_times
    is provided — the reference sizes output as max(split)+1 and silently
    drops them (reference downsampling.py:70,121), which desyncs features
    from brain data downstream. With tr_times=None the reference shape is
    preserved."""
    n_trs, dim = 10, 3
    data = rng.normal(size=(8, dim)).astype(np.float32)
    split = [0, 0, 1, 2, 2, 3, 5, 5]  # TRs 4, 6..9 wordless; 6+ trailing
    tr_times = np.arange(n_trs) * 2.0
    for method in ("average", "sum", "last"):
        out = ds.downsample(data, None, tr_times, method=method,
                            split_indices=split)
        assert out.shape == (n_trs, dim)
        assert np.allclose(out[6:], 0.0)
        assert np.allclose(out[4], 0.0)
        ref_shape = ds.downsample(data, None, None, method=method,
                                  split_indices=split)
        assert ref_shape.shape == (6, dim)
        assert np.allclose(out[:6], ref_shape, atol=1e-6)
