"""Column-stat helpers and plotting unmask (reference: encoding/utils.py:17-83,606-622).

These are the host-side numpy utilities the trainer uses between pipeline
stages (per-story z-scoring etc.); the device-side equivalents live in
litcoder_core_tpu.ops.stats.
"""

import numpy as np

from litcoder_core_tpu.features.fir_expander import FIR


def demean(v: np.ndarray) -> np.ndarray:
    """Removes the mean from each column of [v]."""
    return v - v.mean(0)


dm = demean


def zscore(v: np.ndarray) -> np.ndarray:
    """Z-scores each column of [v]; zero-variance columns are left demeaned
    (reference encoding/utils.py:23-29 skips dividing when std == 0).
    Accepts 1-D vectors like the reference's zs lambda."""
    s = v.std(0)
    m = v - v.mean(0)
    if m.ndim == 1:
        return m / s if s != 0.0 else m
    nonzero = s != 0.0
    m[:, nonzero] /= s[nonzero]
    return m


zs = zscore


def rescale(v: np.ndarray) -> np.ndarray:
    """Rescales each column of [v] to unit variance."""
    return v / v.std(0)


rs = rescale


def mcorr(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Correlation between each column of c1 and the matching column of c2."""
    return (zs(c1) * zs(c2)).mean(0)


def xcorr(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Correlation between each row of c1 and EACH row of c2."""
    return np.dot(zs(c1.T).T, zs(c2.T)) / (c1.shape[1])


def make_delayed(stim: np.ndarray, delays, circpad: bool = False) -> np.ndarray:
    """FIR delay stack; same function as FIR.make_delayed (the reference keeps
    a duplicate at encoding/utils.py:62-83 — we keep one implementation)."""
    return FIR.make_delayed(stim, delays, circpad)


def unmask_correlations_for_plotting(masked_correlations: np.ndarray,
                                     mask_indices: np.ndarray,
                                     full_size: int) -> np.ndarray:
    """Expand masked correlations to full brain size with NaNs elsewhere
    (reference: encoding/utils.py:606-622)."""
    full = np.full(full_size, np.nan)
    full[mask_indices] = masked_correlations
    return full
