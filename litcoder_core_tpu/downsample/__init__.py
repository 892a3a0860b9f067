"""Temporal-alignment layer: downsampling continuous features to TR times."""

from litcoder_core_tpu.downsample.downsampling import Downsampler

__all__ = ["Downsampler"]
