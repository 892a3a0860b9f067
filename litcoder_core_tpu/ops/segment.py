"""Segment (word -> TR) pooling ops.

The reference's split-index downsamplers loop over TRs in Python building
index lists (encoding/downsample/downsampling.py:42-136, 239-319). Here each
pooler is a single jax.ops.segment_* call: O(n_words) on the VPU, no host
loops, jittable, and differentiable.

Two split-index conventions exist in the reference and both are supported:
- per-word TR ids ("average"/"sum"/"last"): split_indices[i] = TR of word i.
- legacy boundary positions ("legacy_*"): np.split(data, split_indices)
  chunk semantics — converted here with a searchsorted.
"""

import jax
import jax.numpy as jnp


def segment_sum_pool(data, segment_ids, num_segments: int):
    """Sum rows of data per segment id; empty segments -> 0 rows.
    (reference: SumDownsampler, encoding/downsample/downsampling.py:239-284)"""
    data = jnp.asarray(data, jnp.float32)
    segment_ids = jnp.asarray(segment_ids, jnp.int32)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean_pool(data, segment_ids, num_segments: int):
    """Mean rows per segment; empty segments -> 0 rows.
    (reference: AverageDownsampler, encoding/downsample/downsampling.py:91-136)"""
    data = jnp.asarray(data, jnp.float32)
    segment_ids = jnp.asarray(segment_ids, jnp.int32)
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), jnp.float32), segment_ids,
        num_segments=num_segments,
    )
    return sums / jnp.maximum(counts, 1.0)[:, None]


def segment_last_pool(data, segment_ids, num_segments: int):
    """Last row per segment (highest word index); empty segments -> 0 rows.
    (reference: LastPointDownsampler, encoding/downsample/downsampling.py:42-88)"""
    data = jnp.asarray(data, jnp.float32)
    segment_ids = jnp.asarray(segment_ids, jnp.int32)
    n = data.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    last_idx = jax.ops.segment_max(idx, segment_ids, num_segments=num_segments)
    # segment_max of empty segments yields the dtype min; mask them to 0 rows.
    has_any = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), segment_ids, num_segments=num_segments
    ) > 0
    safe_idx = jnp.clip(last_idx, 0, n - 1)
    out = data[safe_idx]
    return jnp.where(has_any[:, None], out, 0.0)


def boundaries_to_segment_ids(n_rows: int, boundaries):
    """Convert np.split-style boundary positions to per-row segment ids.

    np.split(data, boundaries) produces len(boundaries)+1 chunks where chunk c
    is rows [boundaries[c-1], boundaries[c]). Row i belongs to chunk
    searchsorted(boundaries, i, side='right').
    """
    boundaries = jnp.asarray(boundaries, jnp.int32)
    rows = jnp.arange(n_rows, dtype=jnp.int32)
    return jnp.searchsorted(boundaries, rows, side="right").astype(jnp.int32)


def rect_pool(data, data_times, tr_times):
    """Rectangular (box) filter pooling: mean of samples within TR/2 of each
    TR time; empty windows -> 0 rows.
    (reference: RectangularDownsampler, encoding/downsample/downsampling.py:24-39)

    Vectorized as a masked-mean matmul over (n_tr, n_samples) — MXU-friendly.
    """
    data = jnp.asarray(data, jnp.float32)
    data_times = jnp.asarray(data_times, jnp.float32)
    tr_times = jnp.asarray(tr_times, jnp.float32)
    tr = jnp.mean(jnp.diff(tr_times))
    lo = tr_times[:, None] - tr / 2.0
    hi = tr_times[:, None] + tr / 2.0
    mask = ((data_times[None, :] >= lo) & (data_times[None, :] < hi)).astype(
        jnp.float32
    )
    counts = jnp.sum(mask, axis=1, keepdims=True)
    weights = mask / jnp.maximum(counts, 1.0)
    return jnp.dot(weights, data, precision=jax.lax.Precision.HIGHEST)
