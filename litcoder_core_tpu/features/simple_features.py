"""Wordrate passthrough extractor (reference: encoding/features/simple_features.py:6-35)."""

from typing import Any, Dict

import numpy as np

from litcoder_core_tpu.features.base import BaseFeatureExtractor


class WordRateFeatureExtractor(BaseFeatureExtractor):
    """Reshapes assembly-precomputed word rates to (n_TRs, 1).

    Word rates are already TR-binned by the assembly layer, so the trainer
    skips downsampling for this extractor (reference: trainer.py:168-172).
    """

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)

    def extract_features(self, stimuli: Any, **kwargs) -> np.ndarray:
        if isinstance(stimuli, list):
            stimuli = np.array(stimuli)
        if stimuli.ndim == 1:
            stimuli = stimuli.reshape(-1, 1)
        elif stimuli.ndim == 2 and stimuli.shape[1] == 1:
            pass
        else:
            raise ValueError(f"Unexpected stimuli shape: {stimuli.shape}")
        return stimuli
