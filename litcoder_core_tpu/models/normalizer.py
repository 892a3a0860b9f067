"""Train-statistics z-scoring (reference: encoding/models/ridge_utils.py:70-180).

Functional core (jit-friendly) plus a DataNormalizer class with the
reference's fit/transform/fit_transform API.
"""

from typing import Optional, Tuple

import jax.numpy as jnp


def fit_normalizer_stats(X_train, y_train,
                         normalize_features: bool = True,
                         normalize_targets: bool = True):
    """Compute (feature_mean, feature_std, target_mean, target_std) from the
    training split; None for axes not being normalized.

    Uses torch-style unbiased std (ddof=1) to match the reference's device
    path (torch .std default, ridge_utils.py:113-122).
    """
    f_mean = f_std = t_mean = t_std = None
    if normalize_features:
        X_train = jnp.asarray(X_train, jnp.float32)
        f_mean = jnp.mean(X_train, axis=0, keepdims=True)
        f_std = jnp.std(X_train, axis=0, keepdims=True, ddof=1)
    if normalize_targets:
        y_train = jnp.asarray(y_train, jnp.float32)
        t_mean = jnp.mean(y_train, axis=0, keepdims=True)
        t_std = jnp.std(y_train, axis=0, keepdims=True, ddof=1)
    return f_mean, f_std, t_mean, t_std


def apply_normalizer_stats(X, y, stats, eps: float = 1e-8):
    """Apply precomputed stats to (X, y); identity on axes with None stats."""
    f_mean, f_std, t_mean, t_std = stats
    if f_mean is not None:
        X = (jnp.asarray(X, jnp.float32) - f_mean) / (f_std + eps)
    if t_mean is not None:
        y = (jnp.asarray(y, jnp.float32) - t_mean) / (t_std + eps)
    return X, y


class DataNormalizer:
    """Drop-in replacement for the reference class
    (encoding/models/ridge_utils.py:70-180)."""

    def __init__(self, normalize_features: bool = True,
                 normalize_targets: bool = True, eps: float = 1e-8):
        self.normalize_features = normalize_features
        self.normalize_targets = normalize_targets
        self.eps = eps
        self._stats: Optional[Tuple] = None

    def fit(self, X_train, y_train) -> "DataNormalizer":
        self._stats = fit_normalizer_stats(
            X_train, y_train, self.normalize_features, self.normalize_targets
        )
        return self

    def transform(self, X, y):
        if self._stats is None:
            raise ValueError("Must call fit() before transform()")
        return apply_normalizer_stats(X, y, self._stats, self.eps)

    def fit_transform(self, X, y):
        return self.fit(X, y).transform(X, y)
