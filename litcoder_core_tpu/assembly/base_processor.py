"""Shared dataset-processing logic for assembly generation
(reference: encoding/assembly/base_processor.py:23-365).

Covers: token-budgeted context-window stimulus construction (fullcontext /
nocontext / halfcontext), analysis-mask application, content-agnostic
temporal-baseline synthesis, per-TR word-rate computation, and transcript
pickle loading.

Environmental differences from the reference:
- the tokenizer is injectable and loaded lazily (GPT2 download only when
  actually needed — the reference downloads it in every constructor,
  base_processor.py:39-43);
- the temporal baseline uses a vectorized autocorrelation build + symmetric
  eigendecomposition instead of a double Python loop + full SVD
  (base_processor.py:299-308) — same features up to column sign, which is
  irrelevant for ridge regression.
"""

import logging
import os
import pickle
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly

from litcoder_core_tpu.brain_projection.project import (
    SurfaceProcessor,
    VolumeProcessor,
)

logger = logging.getLogger(__name__)


class BaseAssemblyGenerator(ABC):
    """Abstract base for dataset-specific assembly generators."""

    def __init__(
        self,
        data_dir: str,
        dataset_type: str,
        tr: float = 1.5,
        use_volume: bool = False,
        mask_path: Optional[str] = None,
        analysis_mask_path: Optional[str] = None,
        tokenizer=None,
    ):
        self.data_dir = Path(data_dir)
        self.tr = tr
        self.analysis_mask = analysis_mask_path
        self._tokenizer = tokenizer
        self.dataset_type = dataset_type
        self.use_volume = use_volume
        self._brain_processor = None
        self._mask_path = mask_path
        # Defaults, set per generate_assembly call like the reference.
        self.context_type = "fullcontext"
        self.lookback = 256

    @property
    def tokenizer(self):
        """Lazy GPT-2 tokenizer (injectable for offline use)."""
        if self._tokenizer is None:
            from transformers import GPT2Tokenizer

            self._tokenizer = GPT2Tokenizer.from_pretrained("gpt2")
        return self._tokenizer

    @property
    def brain_processor(self):
        """Lazy volume/surface processor (surface needs nilearn)."""
        if self._brain_processor is None:
            self._brain_processor = (
                VolumeProcessor(mask_path=self._mask_path)
                if self.use_volume else SurfaceProcessor()
            )
        return self._brain_processor

    # ------------------------------------------------------------- abstract

    @abstractmethod
    def generate_assembly(self, subject: str, lookback: int = 256,
                          context_type: str = "fullcontext",
                          correlation_length: int = 100,
                          generate_temporal_baseline: bool = False,
                          ) -> SimpleNeuroidAssembly:
        """Generate an assembly for a subject."""

    @abstractmethod
    def _discover_stories(self, subject_dir: Path) -> List[Dict[str, str]]:
        """Discover stories/runs for a subject."""

    # -------------------------------------------------- stimulus construction

    def generate_stimuli_with_context(self, transcript: pd.DataFrame,
                                      lookback: int) -> List[str]:
        """Token-budgeted context window per word
        (reference: base_processor.py:106-117)."""
        if self.context_type == "fullcontext":
            return self._process_fullcontext(transcript, lookback)
        if self.context_type == "nocontext":
            return self._process_nocontext(transcript, lookback)
        if self.context_type == "halfcontext":
            return self._process_halfcontext(transcript, lookback)
        raise ValueError(f"Invalid context type: {self.context_type}")

    def _process_fullcontext(self, transcript: pd.DataFrame,
                             lookback: int) -> List[str]:
        """Sliding window of the preceding `lookback` words, token-budget
        enforced by encode/truncate/decode (base_processor.py:119-148)."""
        ds_data = transcript["word_orig"].astype(str)
        total_len = len(ds_data)
        stimuli: List[str] = []
        for i, w in enumerate(ds_data):
            if w != "":
                text = " ".join(
                    ds_data[max(0, i - lookback):min(i + 1, total_len)]
                )
                tokens = self.tokenizer.encode(text, add_special_tokens=False)
                if len(tokens) > lookback:
                    tokens = tokens[-lookback:]
                    text = self.tokenizer.decode(tokens)
                stimuli.append(text.strip())
            else:
                stimuli.append("")
        return stimuli

    def _process_nocontext(self, transcript: pd.DataFrame,
                           lookback: int) -> List[str]:
        """Accumulate from a reset point; reset when the token budget is hit
        (base_processor.py:150-181)."""
        ds_data = transcript["word_orig"].astype(str)
        stimuli: List[str] = []
        start_idx = 0
        for i, w in enumerate(ds_data):
            if w != "":
                text = " ".join(ds_data[start_idx:i + 1])
                tokens = self.tokenizer.encode(text, add_special_tokens=False)
                stimuli.append(text.strip())
                if len(tokens) >= lookback:
                    start_idx = i + 1  # start fresh from the next word
            else:
                stimuli.append("")
        return stimuli

    def _process_halfcontext(self, transcript: pd.DataFrame,
                             lookback: int) -> List[str]:
        """Sliding window advanced by lookback/2 on budget overflow
        (base_processor.py:183-217)."""
        ds_data = transcript["word_orig"].astype(str)
        stimuli: List[str] = []
        start = 0
        i = 0
        half_lookback = lookback // 2
        while i < len(ds_data):
            if ds_data[i] != "":
                text = " ".join(ds_data[start:i + 1])
                tokens = self.tokenizer.encode(text, add_special_tokens=False)
                if len(tokens) > lookback:
                    start += half_lookback
                    continue
                stimuli.append(text.strip())
            else:
                stimuli.append("")
            i += 1
        return stimuli

    # ------------------------------------------------------------- masking

    def apply_analysis_mask(
        self, brain_data: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Apply the analysis mask: (masked_data, kept indices)
        (reference: base_processor.py:219-256)."""
        if self.analysis_mask is None:
            return brain_data, np.arange(brain_data.shape[1])
        mask = np.asarray(self.analysis_mask, dtype=bool)
        if mask.shape[0] != brain_data.shape[1]:
            raise ValueError(
                f"Analysis mask size ({mask.shape[0]}) doesn't match brain "
                f"data ({brain_data.shape[1]})"
            )
        masked = brain_data[:, mask]
        logger.info("Applied analysis mask: %d -> %d voxels/vertices",
                    brain_data.shape[1], masked.shape[1])
        return masked, np.where(mask)[0]

    # ----------------------------------------------------- temporal baseline

    def create_temporal_baseline(self, stimuli_list, d_model: int = 128,
                                 correlation_length: int = 75) -> np.ndarray:
        """Content-agnostic temporal features: spectral embedding of the
        exp-decay autocorrelation matrix (reference: base_processor.py:258-310).
        """
        n = len(stimuli_list)
        logger.info("Creating temporal baseline for %d stimuli "
                    "(d_model=%d, correlation_length=%d)",
                    n, d_model, correlation_length)
        return self._create_temporal_baseline(n, d_model, correlation_length)

    @staticmethod
    def _create_temporal_baseline(n_stimuli: int, d_model: int = 128,
                                  correlation_length: int = 75) -> np.ndarray:
        idx = np.arange(n_stimuli)
        autocorr = np.exp(
            -np.abs(idx[:, None] - idx[None, :]) / correlation_length
        )
        # Symmetric PSD -> eigh (descending) instead of SVD: same
        # U * sqrt(s) features up to column sign.
        evals, evecs = np.linalg.eigh(autocorr)
        evals, evecs = evals[::-1], evecs[:, ::-1]
        d = min(d_model, n_stimuli)
        return evecs[:, :d] * np.sqrt(np.maximum(evals[:d], 0.0))

    # ------------------------------------------------------------ word rates

    def compute_word_rate_features(self, transcript: pd.DataFrame,
                                   tr_times: np.ndarray) -> np.ndarray:
        """Words per TR bin, (n_trs, 1) (reference: base_processor.py:312-336).

        Vectorized: non-empty word times histogrammed over the TR bin edges
        (bins [t_i, t_{i+1}), last bin [t_last, t_last + tr))."""
        transcript = transcript.copy()
        transcript["word_orig"] = transcript["word_orig"].astype(str)
        nonempty = transcript["word_orig"].str.strip() != ""
        times = transcript.loc[nonempty, "word_times"].to_numpy(float)
        tr_times = np.asarray(tr_times, float)
        edges = np.concatenate([tr_times, [tr_times[-1] + self.tr]])
        # np.histogram closes the last bin on the right; the reference's bins
        # are half-open everywhere, so drop words exactly at the final edge.
        times = times[times < edges[-1]]
        counts, _ = np.histogram(times, bins=edges)
        return counts.astype(float).reshape(-1, 1)

    # -------------------------------------------------------------- transcript

    def process_transcript(self, data_dir, story_name: str):
        """Read {dataset_type}_data.pkl and return (transcript df,
        split_indices, tr_times, data_times, TR_onset)
        (reference: base_processor.py:338-365)."""
        with open(os.path.join(data_dir, f"{self.dataset_type}_data.pkl"),
                  "rb") as f:
            data = pickle.load(f)
        story = next(
            (s for s in data if s.get("story_name") == story_name), None
        )
        if story is None:
            available = [s.get("story_name") for s in data]
            raise ValueError(
                f"Story '{story_name}' not found in "
                f"{self.dataset_type}_data.pkl. Available stories: {available}"
            )
        words = pd.DataFrame({
            "word_orig": story["words"],
            "word_times": story["data_times"],
        })
        return (words, story["split_indices"], story["tr_times"],
                story["data_times"], story.get("TR_onset"))
