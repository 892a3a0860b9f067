"""Core TPU-native array ops: stats, interpolation, FIR, segment pooling."""

from litcoder_core_tpu.ops.stats import (
    zscore,
    pearson_r,
    pearson_pvalues,
    fisher_combine_pvalues,
    bh_fdrcorrection,
)
from litcoder_core_tpu.ops.fir import make_delayed
from litcoder_core_tpu.ops.interp import (
    lanczosfun,
    sincfun,
    lanczosinterp2D,
    sincinterp2D,
    gabor_xfm,
    gabor_xfm2D,
    interpdata,
)
from litcoder_core_tpu.ops.segment import (
    segment_mean_pool,
    segment_sum_pool,
    segment_last_pool,
    boundaries_to_segment_ids,
)

__all__ = [
    "zscore",
    "pearson_r",
    "pearson_pvalues",
    "fisher_combine_pvalues",
    "bh_fdrcorrection",
    "make_delayed",
    "lanczosfun",
    "sincfun",
    "lanczosinterp2D",
    "sincinterp2D",
    "gabor_xfm",
    "gabor_xfm2D",
    "interpdata",
    "segment_mean_pool",
    "segment_sum_pool",
    "segment_last_pool",
    "boundaries_to_segment_ids",
]
