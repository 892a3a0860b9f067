"""Modeling layer: seeded CV folding, batched SVD ridge, nested-CV solver."""

from litcoder_core_tpu.models.base import BasePredictivityModel
from litcoder_core_tpu.models.folding import create_folds
from litcoder_core_tpu.models.ridge import (
    ridge_fit,
    ridge_corr,
    ridge_corr_pred,
    svd_masked,
)
from litcoder_core_tpu.models.nested_cv import NestedCVModel, fit_nested_cv
from litcoder_core_tpu.models.banded import BandedRidgeModel, fit_banded_ridge
from litcoder_core_tpu.models.variance_partition import (
    variance_partitioning,
)
from litcoder_core_tpu.models.stacking import (
    StackedRidgeModel,
    fit_stacked_ridge,
)
from litcoder_core_tpu.models.linear import LinearPredictivityModel
from litcoder_core_tpu.models.sklearn_model import SklearnPredictivityModel
from litcoder_core_tpu.models.normalizer import DataNormalizer

__all__ = [
    "BasePredictivityModel",
    "create_folds",
    "ridge_fit",
    "ridge_corr",
    "ridge_corr_pred",
    "svd_masked",
    "NestedCVModel",
    "fit_nested_cv",
    "BandedRidgeModel",
    "fit_banded_ridge",
    "variance_partitioning",
    "StackedRidgeModel",
    "fit_stacked_ridge",
    "LinearPredictivityModel",
    "SklearnPredictivityModel",
    "DataNormalizer",
]
