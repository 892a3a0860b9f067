"""Abstract base for predictivity models (reference: encoding/models/base.py)."""

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import numpy as np


class BasePredictivityModel(ABC):
    """Interface contract: fit_predict(features, targets, ...) -> metrics.

    Mirrors the reference ABC (encoding/models/base.py:7-41) so user code
    written against LITcoder drops in unchanged.
    """

    def __init__(self, model_name: str):
        self.model_name = model_name

    @abstractmethod
    def fit_predict(
        self,
        features: np.ndarray,
        targets: np.ndarray,
        groups: Optional[np.ndarray] = None,
        **kwargs: Any,
    ) -> Dict[str, Any]:
        """Fit on features/targets and return an evaluation-metrics dict."""
        raise NotImplementedError
