"""Linear predictivity model (reference: encoding/models/linear.py:11-163).

Same API (config dict, fit/predict/save/load, GroupKFold, best-fold model),
but the solve is a jitted jnp least-squares + device-side Pearson scoring
instead of sklearn LinearRegression + per-voxel scipy loops. NOTE: like the
reference, this implements `fit`, not `fit_predict` — it is not wired into
the trainers (reference parity; SURVEY.md §2.1 'Linear model' row).
"""

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.model_selection import GroupKFold

from litcoder_core_tpu.models.base import BasePredictivityModel
from litcoder_core_tpu.ops.stats import pearson_r

logger = logging.getLogger(__name__)


@jax.jit
def _lstsq_fit(X, y):
    """Least-squares with intercept: returns (coef (D, V), intercept (V,))."""
    with jax.default_matmul_precision("highest"):  # CLAUDE.md numerics rule
        X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        x_mean = X.mean(axis=0, keepdims=True)
        y_mean = y.mean(axis=0, keepdims=True)
        coef, _, _, _ = jnp.linalg.lstsq(X - x_mean, y - y_mean)
        intercept = (y_mean - x_mean @ coef).squeeze(0)
    return coef, intercept


class LinearPredictivityModel(BasePredictivityModel):
    """Linear regression under GroupKFold with best-fold retention."""

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config.get("model_name", "linear"))
        self.config = config
        self.n_folds = config.get("n_folds", 1)
        self.output_dir = config.get("output_dir")
        self.best_model = None  # (coef, intercept)
        self.best_score = -np.inf
        self.scores = []
        self.models = []

    def fit_predict(self, features, targets, groups=None, **kwargs):
        """BasePredictivityModel interface: delegates to fit()."""
        return self.fit(features, targets, groups=groups, **kwargs)

    def fit(self, features: np.ndarray, targets: np.ndarray,
            groups: Optional[np.ndarray] = None, **kwargs) -> Dict[str, Any]:
        if groups is None:
            groups = np.zeros(len(features))
        n_splits = max(self.n_folds, 1)
        if n_splits < 2 or len(np.unique(groups)) < n_splits:
            # GroupKFold needs n_splits >= 2 and >= n_splits groups;
            # degenerate cases (n_folds=1, single group) -> fit on everything
            # and score in-sample (reference behavior with dummy groups).
            splits = [(np.arange(len(features)), np.arange(len(features)))]
        else:
            gkf = GroupKFold(n_splits=n_splits)
            splits = list(gkf.split(features, targets, groups=groups))

        features = np.asarray(features)
        if features.ndim == 1:
            features = features.reshape(-1, 1)
        for fold_idx, (train_idx, test_idx) in enumerate(splits):
            X_train = features[train_idx]
            X_test = features[test_idx]
            y_train = np.asarray(targets)[train_idx]
            y_test = np.asarray(targets)[test_idx]

            coef, intercept = _lstsq_fit(X_train, y_train)
            preds = np.asarray(
                jnp.dot(jnp.asarray(X_test, jnp.float32), coef,
                        precision=jax.lax.Precision.HIGHEST) + intercept
            )
            fold_scores = np.asarray(pearson_r(y_test, preds))
            median_score = float(np.median(fold_scores))
            logger.info("Fold %d/%d - Median score: %.3f", fold_idx + 1,
                        len(splits), median_score)

            self.scores.append(fold_scores.tolist())
            self.models.append((np.asarray(coef), np.asarray(intercept)))
            if median_score > self.best_score:
                self.best_score = median_score
                self.best_model = self.models[-1]

        final_scores = np.array(self.scores).mean(axis=0)
        return {
            "median_score": float(np.median(final_scores)),
            "mean_score": float(np.mean(final_scores)),
            "std_score": float(np.std(final_scores)),
            "correlations": final_scores.tolist(),
        }

    def predict(self, features: np.ndarray) -> np.ndarray:
        if self.best_model is None:
            raise ValueError("Model has not been fitted yet")
        features = np.asarray(features)
        if features.ndim == 1:
            features = features.reshape(-1, 1)
        coef, intercept = self.best_model
        return features @ coef + intercept

    def save(self, path: Path) -> None:
        if self.best_model is None:
            raise ValueError("No model to save")
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        coef, intercept = self.best_model
        # Reference stores sklearn's (V, D) coef_ layout (linear.py:138).
        np.save(path / "best_model_coefficients.npy", coef.T)
        np.save(path / "best_model_intercept.npy", intercept)

    def load(self, path: Path) -> None:
        path = Path(path)
        coef_path = path / "best_model_coefficients.npy"
        if not coef_path.exists():
            raise FileNotFoundError(f"No model found at {coef_path}")
        coef = np.load(coef_path).T
        intercept_path = path / "best_model_intercept.npy"
        intercept = (np.load(intercept_path) if intercept_path.exists()
                     else np.zeros(coef.shape[1]))
        self.best_model = (coef, intercept)
