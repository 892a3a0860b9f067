"""LeBel dataset processor (reference: encoding/assembly/lebel_processor.py:18-168).

25 hard-coded stories; per-subject response-dict pickles
(noslice_sub-{subject}_story_data[_surface].pkl); validation_method='outer'
(last story is the held-out test set in the trainer)."""

import pickle
from pathlib import Path
from typing import Dict, List, Optional

from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.base_processor import BaseAssemblyGenerator
from litcoder_core_tpu.assembly.story_data import StoryData

LEBEL_STORIES = [
    "adollshouse", "adventuresinsayingyes", "alternateithicatom", "avatar",
    "buck", "exorcism", "eyespy", "fromboyhoodtofatherhood", "hangtime",
    "haveyoumethimyet", "howtodraw", "inamoment", "itsabox", "legacy",
    "naked", "odetostepfather", "sloth", "souls", "stagefright",
    "swimmingwithastronauts", "thatthingonmyarm",
    "theclosetthatateeverything", "tildeath", "undertheinfluence",
    "wheretheressmoke",
]


class LebelAssemblyGenerator(BaseAssemblyGenerator):
    """Generator for LeBel dataset assemblies."""

    def __init__(self, data_dir: str, dataset_type: str, tr: float = 1.5,
                 use_volume: bool = False, mask_path: Optional[str] = None,
                 analysis_mask_path: Optional[str] = None, tokenizer=None):
        super().__init__(data_dir, dataset_type, tr, use_volume, mask_path,
                         analysis_mask_path, tokenizer)
        self.stories = list(LEBEL_STORIES)
        self._resp_dict = None  # loaded once per subject, reused for stories
        self._resp_subject = None

    def generate_assembly(self, subject: str, lookback: int = 256,
                          context_type: str = "fullcontext",
                          correlation_length: int = 100,
                          generate_temporal_baseline: bool = False,
                          ) -> SimpleNeuroidAssembly:
        self.lookback = lookback
        self.context_type = context_type
        story_data_list = []
        for story in self.stories:
            story_data_list.append(self._process_single_story(
                subject, story, None, correlation_length,
                generate_temporal_baseline,
                audio_path=f"{self.data_dir}/audio_files/{story}.wav",
            ))
        return SimpleNeuroidAssembly(story_data_list,
                                     validation_method="outer")

    def _discover_stories(self, subject_dir: Path) -> List[Dict[str, str]]:
        """LeBel stories are predefined (lebel_processor.py:99-104)."""
        return []

    def _load_responses(self, subject: str):
        # Cache keyed BY SUBJECT: one generator may serve several subjects
        # (sweeps), and serving a stale subject's responses would corrupt
        # every later assembly silently.
        if self._resp_dict is None or self._resp_subject != subject:
            suffix = "" if self.use_volume else "_surface"
            path = (self.data_dir /
                    f"noslice_sub-{subject}_story_data{suffix}.pkl")
            with open(path, "rb") as f:
                self._resp_dict = pickle.load(f)
            self._resp_subject = subject
        return self._resp_dict

    def _process_single_story(self, subject: str, story_name: str,
                              volume_path, correlation_length: int = 100,
                              generate_temporal_baseline: bool = False,
                              audio_path: Optional[str] = None) -> StoryData:
        brain_data = self._load_responses(subject).get(story_name)
        transcript, split_indices, tr_times, data_times, _ = (
            self.process_transcript(self.data_dir, story_name)
        )
        stimuli = self.generate_stimuli_with_context(transcript, self.lookback)

        mask_indices = None
        if self.analysis_mask is not None:
            brain_data, mask_indices = self.apply_analysis_mask(brain_data)

        temporal_baseline = (
            self.create_temporal_baseline(
                stimuli, correlation_length=correlation_length
            ) if generate_temporal_baseline else None
        )
        word_rates = self.compute_word_rate_features(transcript, tr_times)

        return StoryData(
            name=story_name,
            brain_data=brain_data,
            words=transcript["word_orig"].tolist(),
            stimuli=stimuli,
            temporal_baseline=temporal_baseline,
            split_indices=split_indices,
            tr_times=tr_times,
            data_times=data_times,
            word_rates=word_rates,
            mask_indices=mask_indices,
            audio_path=audio_path,
        )
