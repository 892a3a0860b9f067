"""Le Petit Prince (LPP) dataset processor
(reference: encoding/assembly/lpp_processor.py:13-196).

9 runs run-01..09; drops the first 4 TRs then samples brain rows at unique
TR_onset values; validation_method='inner'."""

import logging
from pathlib import Path
from typing import Dict, List, Optional

from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.narratives_processor import (
    NarrativesAssemblyGenerator,
)
from litcoder_core_tpu.assembly.story_data import StoryData

logger = logging.getLogger(__name__)


class LPPAssemblyGenerator(NarrativesAssemblyGenerator):
    """Generator for LPP dataset assemblies (shares the cache-aware volume
    loading path with Narratives)."""

    RUNS = ["01", "02", "03", "04", "05", "06", "07", "08", "09"]

    def __init__(self, data_dir: str, dataset_type: str, tr: float = 2.0,
                 use_volume: bool = False, mask_path: Optional[str] = None,
                 analysis_mask_path: Optional[str] = None, tokenizer=None):
        super().__init__(data_dir, dataset_type, tr, use_volume, mask_path,
                         analysis_mask_path, tokenizer)

    def generate_assembly(self, subject: str, lookback: int = 256,
                          context_type: str = "fullcontext",
                          correlation_length: int = 100,
                          generate_temporal_baseline: bool = False,
                          ) -> SimpleNeuroidAssembly:
        subject_dir = self.data_dir / subject
        if not subject_dir.exists():
            raise FileNotFoundError(
                f"Subject directory not found: {subject_dir}"
            )
        run_configs = self._discover_stories(subject_dir, subject)
        if not run_configs:
            raise ValueError(f"No runs found for subject {subject}")

        self.context_type = context_type
        self.lookback = lookback
        story_data_list = [
            self._process_single_story(
                subject, cfg["name"], cfg["volume_path"],
                correlation_length, generate_temporal_baseline,
                audio_path=None,
            )
            for cfg in run_configs
        ]
        return SimpleNeuroidAssembly(story_data_list,
                                     validation_method="inner")

    def _discover_stories(self, subject_dir: Path,
                          subject: Optional[str] = None
                          ) -> List[Dict[str, str]]:
        """run-01..09 BIDS NIfTIs (reference: lpp_processor.py:74-100)."""
        subject = subject or subject_dir.name
        run_configs = []
        for run, section in zip(self.RUNS, range(1, len(self.RUNS) + 1)):
            volume_file = (
                subject_dir / f"{subject}_task-lppEN_run-{run}_space-"
                              "MNI152NLin2009cAsym_res-2_desc-preproc_bold"
                              "_fixed.nii.gz"
            )
            if volume_file.exists():
                run_configs.append({
                    "name": f"run_{run}",
                    "volume_path": str(volume_file),
                    "section": section,
                })
        return run_configs

    def _process_single_story(self, subject: str, story_name: str,
                              volume_path: str, correlation_length: int = 100,
                              generate_temporal_baseline: bool = False,
                              audio_path: Optional[str] = None) -> StoryData:
        brain_data = self._load_brain_data(subject, volume_path)
        transcript, split_indices, tr_times, data_times, TR_onset = (
            self.process_transcript(self.data_dir, story_name)
        )

        # LPP quirks (lpp_processor.py:159-162): drop the first 4 TRs, then
        # keep only rows at the unique TR_onset values.
        brain_data = brain_data[4:, :]
        unique_trs = [int(tr) for tr in set(TR_onset)]
        sampled = brain_data[unique_trs, :]

        mask_indices = None
        if self.analysis_mask is not None:
            sampled, mask_indices = self.apply_analysis_mask(sampled)

        stimuli = self.generate_stimuli_with_context(transcript, self.lookback)
        temporal_baseline = (
            self.create_temporal_baseline(
                stimuli, correlation_length=correlation_length
            ) if generate_temporal_baseline else None
        )
        word_rates = self.compute_word_rate_features(transcript, tr_times)

        return StoryData(
            name=story_name,
            brain_data=sampled,
            stimuli=stimuli,
            temporal_baseline=temporal_baseline,
            split_indices=split_indices,
            tr_times=tr_times,
            data_times=data_times,
            words=transcript["word_orig"].tolist(),
            word_rates=word_rates,
            mask_indices=mask_indices,
            audio_path=audio_path,
        )
