"""Direct segment-op tests (complementing the Downsampler facade tests)."""

import numpy as np

from litcoder_core_tpu.ops.segment import (
    boundaries_to_segment_ids,
    segment_last_pool,
    segment_mean_pool,
    segment_sum_pool,
)

rng = np.random.default_rng(17)


def test_boundaries_to_segment_ids_matches_np_split():
    n = 20
    boundaries = [3, 7, 7, 15]
    ids = np.asarray(boundaries_to_segment_ids(n, boundaries))
    chunks = np.split(np.arange(n), boundaries)
    for ci, chunk in enumerate(chunks):
        for row in chunk:
            assert ids[row] == ci


def test_empty_segments_are_zero():
    data = rng.normal(size=(6, 3)).astype(np.float32)
    ids = np.array([0, 0, 2, 2, 5, 5])  # segments 1, 3, 4 empty
    for pool in (segment_sum_pool, segment_mean_pool, segment_last_pool):
        out = np.asarray(pool(data, ids, 6))
        assert out.shape == (6, 3)
        for empty in (1, 3, 4):
            assert np.allclose(out[empty], 0.0), pool.__name__


def test_single_segment():
    data = rng.normal(size=(5, 2)).astype(np.float32)
    ids = np.zeros(5, int)
    assert np.allclose(
        np.asarray(segment_mean_pool(data, ids, 1)), data.mean(0)
    )
    assert np.allclose(
        np.asarray(segment_last_pool(data, ids, 1)), data[-1]
    )
