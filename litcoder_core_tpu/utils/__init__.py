"""Utilities: column stats, activation caches, model saver."""

from litcoder_core_tpu.utils.core import (
    demean, dm, zscore, zs, rescale, rs, mcorr, xcorr, make_delayed,
    unmask_correlations_for_plotting,
)
from litcoder_core_tpu.utils.caches import (
    ActivationCache,
    LazyLayerCache,
    SpeechActivationCache,
    SpeechLazyLayerCache,
)
from litcoder_core_tpu.utils.saver import ModelSaver
from litcoder_core_tpu.utils.profiling import StageTimer, annotate, trace

__all__ = [
    "demean", "dm", "zscore", "zs", "rescale", "rs", "mcorr", "xcorr",
    "make_delayed", "unmask_correlations_for_plotting",
    "ActivationCache", "LazyLayerCache",
    "SpeechActivationCache", "SpeechLazyLayerCache",
    "ModelSaver",
    "StageTimer", "annotate", "trace",
]
