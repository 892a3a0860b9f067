"""Downsampler facade with the reference's 10 methods, TPU-backed.

API contract from reference encoding/downsample/downsampling.py:322-445:
Downsampler().downsample(data, data_times, tr_times, method=..., **kwargs)
with per-method required/optional parameter validation (METHOD_PARAMS).

Every method lowers to a single jitted array program from
litcoder_core_tpu.ops (kernel-matrix matmuls for lanczos/sinc/gabor/rect,
segment ops for the split-index poolers) instead of the reference's per-TR
Python loops. Inputs/outputs are numpy at this facade so host pipeline code
is backend-agnostic; under jit the ops compose directly.
"""

from typing import List

import numpy as np

from litcoder_core_tpu.ops import interp as interp_ops
from litcoder_core_tpu.ops import segment as segment_ops


def _per_word_pool(pool_fn, data, split_indices, tr_times=None):
    """Pool per-word rows into TRs by the word->TR map.

    The reference sizes its output as max(split_indices)+1
    (downsampling.py:70,121), which silently DROPS trailing TRs that no
    word maps to — downstream, features then have fewer rows than the
    brain data and the fit crashes on a shape mismatch (the reference has
    the same latent bug; its zero-init covers wordless TRs only in the
    middle). When `tr_times` is available we emit exactly len(tr_times)
    rows: identical values for every TR the reference emits, plus the
    zero rows its own zero-init semantics imply for wordless TRs."""
    if split_indices is None:
        raise ValueError("split_indices must be provided for this method")
    ids = np.asarray(split_indices)
    n_trs = int(ids.max()) + 1
    if tr_times is not None:
        n_trs = max(n_trs, len(tr_times))
    return np.asarray(pool_fn(data, ids, n_trs))


def _legacy_pool(pool_fn, data, split_indices):
    """np.split boundary semantics (downsampling.py:170-236,287-319):
    output has len(split_indices)+1 rows."""
    if split_indices is None:
        raise ValueError("split_indices must be provided for Legacy downsampling")
    boundaries = np.asarray(split_indices)
    n_out = len(boundaries) + 1
    ids = segment_ops.boundaries_to_segment_ids(data.shape[0], boundaries)
    return np.asarray(pool_fn(data, ids, n_out))


class Downsampler:
    """Unified downsampling interface (reference: downsampling.py:322-445)."""

    METHOD_PARAMS = {
        "lanczos": {"required": ["window", "cutoff_mult"], "optional": ["rectify"]},
        "sinc": {"required": ["window", "cutoff_mult"],
                 "optional": ["causal", "renorm"]},
        "average": {"required": ["split_indices"], "optional": []},
        "sum": {"required": ["split_indices"], "optional": []},
        "last": {"required": ["split_indices"], "optional": []},
        "legacy_average": {"required": ["split_indices"], "optional": []},
        "legacy_sum": {"required": ["split_indices"], "optional": []},
        "legacy_last": {"required": ["split_indices"], "optional": []},
        "rect": {"required": [], "optional": []},
        "gabor": {"required": ["freqs", "sigma"], "optional": []},
    }

    def __init__(self):
        self._methods = {
            "rect": self._rect,
            "average": self._average,
            "sinc": self._sinc,
            "lanczos": self._lanczos,
            "last": self._last,
            "gabor": self._gabor,
            "legacy_average": self._legacy_average,
            "legacy_last": self._legacy_last,
            "sum": self._sum,
            "legacy_sum": self._legacy_sum,
        }

    # --- methods -----------------------------------------------------------

    @staticmethod
    def _rect(data, data_times, tr_times):
        return np.asarray(segment_ops.rect_pool(data, data_times, tr_times))

    @staticmethod
    def _lanczos(data, data_times, tr_times, window=3, cutoff_mult=1.0,
                 rectify=False):
        return np.asarray(interp_ops.lanczosinterp2D(
            data, data_times, tr_times, window=window,
            cutoff_mult=cutoff_mult, rectify=rectify,
        ))

    @staticmethod
    def _sinc(data, data_times, tr_times, window=1, cutoff_mult=1.0,
              causal=False, renorm=True):
        return np.asarray(interp_ops.sincinterp2D(
            data, data_times, tr_times, cutoff_mult=cutoff_mult,
            window=window, causal=causal, renorm=renorm,
        ))

    @staticmethod
    def _gabor(data, data_times, tr_times, freqs=None, sigma=None):
        # Reference: np.abs(gabor_xfm2D(data.T, ...)).T (downsampling.py:160-167).
        out = interp_ops.gabor_xfm2D(
            np.asarray(data).T, data_times, tr_times, freqs, sigma
        )
        return np.abs(np.asarray(out)).T

    @staticmethod
    def _average(data, data_times, tr_times, split_indices=None):
        return _per_word_pool(segment_ops.segment_mean_pool, data,
                              split_indices, tr_times)

    @staticmethod
    def _sum(data, data_times, tr_times, split_indices=None):
        return _per_word_pool(segment_ops.segment_sum_pool, data,
                              split_indices, tr_times)

    @staticmethod
    def _last(data, data_times, tr_times, split_indices=None):
        return _per_word_pool(segment_ops.segment_last_pool, data,
                              split_indices, tr_times)

    @staticmethod
    def _legacy_average(data, data_times, tr_times, split_indices=None):
        return _legacy_pool(segment_ops.segment_mean_pool, data, split_indices)

    @staticmethod
    def _legacy_sum(data, data_times, tr_times, split_indices=None):
        return _legacy_pool(segment_ops.segment_sum_pool, data, split_indices)

    @staticmethod
    def _legacy_last(data, data_times, tr_times, split_indices=None):
        return _legacy_pool(segment_ops.segment_last_pool, data, split_indices)

    # --- facade ------------------------------------------------------------

    def _validate_method_params(self, method: str, **kwargs) -> dict:
        """Filter kwargs to the method's declared params
        (reference: downsampling.py:361-393)."""
        if method not in self._methods:
            raise ValueError(f"Unsupported downsampling method: {method}")
        spec = self.METHOD_PARAMS.get(method, {"required": [], "optional": []})
        filtered = {}
        for param in spec["required"]:
            if param not in kwargs:
                raise ValueError(
                    f"Required parameter '{param}' missing for method '{method}'"
                )
            filtered[param] = kwargs[param]
        for param in spec["optional"]:
            if param in kwargs:
                filtered[param] = kwargs[param]
        return filtered

    def downsample(self, data: np.ndarray, data_times: np.ndarray,
                   tr_times: np.ndarray, method: str = "rect",
                   **kwargs) -> np.ndarray:
        """Downsample `data` onto `tr_times` with the chosen method
        (reference: downsampling.py:395-424)."""
        filtered = self._validate_method_params(method, **kwargs)
        return self._methods[method](
            np.asarray(data, np.float32), data_times, tr_times, **filtered
        )

    @property
    def available_methods(self) -> List[str]:
        return list(self._methods.keys())

    def get_method_params(self, method: str) -> dict:
        if method not in self._methods:
            raise ValueError(f"Unsupported downsampling method: {method}")
        return self.METHOD_PARAMS.get(method, {"required": [], "optional": []})
