"""Dependency-injected pipeline orchestrator
(reference: encoding/trainer.py:18-358).

Same 5-step flow and constructor contract as the reference AbstractTrainer:
extract -> downsample -> FIR -> structure (train/test split or concat) ->
fit_predict -> log/save. Differences are environmental, not behavioral:
- logger_backend adds 'none' (NullLogger) so headless runs don't require
  wandb/tensorboard;
- per-story z-scoring keeps the reference's numpy semantics
  (utils.zs: zero-variance columns stay demeaned).
"""

import logging
from datetime import datetime
from typing import Any, Dict, List, Optional

import numpy as np

from litcoder_core_tpu.features.factory import FeatureExtractorFactory
from litcoder_core_tpu.features.fir_expander import FIR
from litcoder_core_tpu.plotting.plotting_utils import (
    BrainPlotter,
    NullLogger,
    TensorBoardLogger,
    WandBLogger,
)
from litcoder_core_tpu.utils.core import zs
from litcoder_core_tpu.utils.saver import ModelSaver

logger = logging.getLogger(__name__)


class AbstractTrainer:
    """Orchestrates the encoding pipeline with injected components."""

    def __init__(
        self,
        assembly: Any,
        feature_extractors: List[Any],
        downsampler: Any,
        model: Any,
        fir_delays: List[int],
        trimming_config: Dict,
        use_train_test_split: bool = False,
        layer_idx: int = 9,
        lookback: int = 256,
        dataset_type: str = "unknown",
        logger_backend: str = "tensorboard",
        wandb_project_name: str = "abstract-trainer",
        results_dir: str = "results",
        run_name: Optional[str] = None,
        downsample_config: Optional[Dict] = None,
        story_selection: Optional[List[str]] = None,
        concat_features: bool = True,
        fused_downsample_fir: Any = "auto",
        device_resident: Any = "auto",
    ):
        """concat_features=True hstacks multi-extractor features like the
        reference (trainer.py:146-150); False keeps them as separate feature
        SPACES for banded-ridge models (models.banded.BandedRidgeModel).

        fused_downsample_fir: 'auto' (default) runs Lanczos downsampling and
        FIR delay expansion as ONE fused device kernel
        (ops.pallas_kernels.lanczos_fir) whenever that is exactly equivalent
        to the two-stage path (method='lanczos' without rectify, all delays
        positive); False always keeps the reference's two-stage flow
        (Downsampler -> host -> FIR.make_delayed, reference
        encoding/downsample/interpdata.py:110-124 +
        encoding/features/FIR_expander.py:24-43); True asserts eligibility.

        device_resident: 'auto' (default) keeps pipeline arrays ON DEVICE
        from the fused downsample+FIR kernel through structuring (z-score/
        trim/stack run as jnp ops, numerics identical to the host path) so
        nothing round-trips host memory between stages — the solver then
        consumes already-resident arrays. 'auto' activates exactly when the
        fused kernel is active; True forces device structuring even for the
        two-stage flow (arrays move to device at the structure stage);
        False keeps the reference's host numpy structuring."""
        self.assembly = assembly
        self.concat_features = concat_features
        self.fused_downsample_fir = fused_downsample_fir
        self.device_resident = device_resident
        self.feature_extractors = feature_extractors
        self.downsampler = downsampler
        self.model = model
        self.fir_delays = fir_delays
        self.trimming_config = trimming_config
        self.use_train_test_split = use_train_test_split
        self.downsample_config = downsample_config or {}
        self.layer_idx = layer_idx
        self.lookback = lookback
        self.dataset_type = dataset_type

        if story_selection is None:
            self.stories_to_process = self.assembly.stories
        elif isinstance(story_selection, int):
            # 1-based single story index (reference: trainer.py:86-88).
            self.stories_to_process = [self.assembly.stories[story_selection - 1]]
        else:
            self.stories_to_process = story_selection

        self.setup_logger(logger_backend, wandb_project_name, results_dir,
                          run_name)
        self.model_saver = ModelSaver(base_dir=results_dir)
        self.brain_plotter = BrainPlotter(self.experiment_logger)
        self._brain_prefetch = None

        logger.info("Abstract trainer initialized: %d extractors, %d stories, "
                    "layer=%d, lookback=%d, dataset=%s, fir=%s, split=%s",
                    len(self.feature_extractors), len(self.stories_to_process),
                    self.layer_idx, self.lookback, self.dataset_type,
                    self.fir_delays, self.use_train_test_split)

    def setup_logger(self, backend: str, project_name: str, results_dir: str,
                     run_name: Optional[str]):
        if run_name is None:
            run_name = (
                f"abstract-trainer-{datetime.now().strftime('%Y%m%d-%H%M%S')}"
            )
        if backend == "wandb":
            import wandb

            wandb.init(project=project_name, name=run_name)
            self.experiment_logger = WandBLogger()
        elif backend == "tensorboard":
            self.experiment_logger = TensorBoardLogger(
                log_dir=f"{results_dir}/runs/{run_name}"
            )
        elif backend == "none":
            self.experiment_logger = NullLogger()
        else:
            raise ValueError(f"Unsupported logger_backend '{backend}'")

    # ------------------------------------------------------------ stage 1

    def extract_and_downsample_features(self) -> Dict[str, np.ndarray]:
        """Per-story feature extraction + downsampling
        (reference: trainer.py:125-157)."""
        all_features = {}
        for story in self.stories_to_process:
            idx = self.assembly.stories.index(story)
            story_features = []
            for extractor in self.feature_extractors:
                features = self._extract_single_features(extractor, story, idx)
                if self._should_downsample(extractor):
                    downsampled = self._downsample_features(features, idx)
                else:
                    downsampled = features
                story_features.append(downsampled)
            # Align timepoints across extractors.
            min_len = min(f.shape[0] for f in story_features)
            story_features = [f[:min_len] for f in story_features]
            if self.concat_features:
                combined = (np.concatenate(story_features, axis=1)
                            if len(story_features) > 1 else story_features[0])
                all_features[story] = combined
                logger.info("Story %s: feature shape %s", story,
                            combined.shape)
            else:
                all_features[story] = story_features  # list of spaces
                logger.info("Story %s: %d feature spaces %s", story,
                            len(story_features),
                            [f.shape for f in story_features])
        return all_features

    def _extract_single_features(self, extractor, story: str, idx: int):
        return FeatureExtractorFactory.extract_features_with_caching(
            extractor, self.assembly, story, idx, self.layer_idx,
            self.lookback, self.dataset_type,
        )

    def _should_downsample(self, extractor) -> bool:
        """Wordrate features are already TR-binned
        (reference: trainer.py:168-172)."""
        return "wordrate" not in extractor.__class__.__name__.lower()

    # ------------------------------------------------- fused stages 1+2

    def _fused_eligible(self) -> bool:
        """True when the fused Lanczos+FIR kernel is exactly equivalent to
        Downsampler('lanczos') followed by FIR.make_delayed:
        - method is lanczos without rectify (rectify splits pos/neg parts);
        - all FIR delays are positive ints, so every output row t depends
          only on rows <= t and per-story truncation commutes with the
          delay stacking."""
        if not self.fused_downsample_fir:
            return False
        eligible = (
            self.downsample_config.get("method") == "lanczos"
            # The two-stage Downsampler declares window/cutoff_mult
            # REQUIRED for lanczos; the fused path must not mask a missing
            # parameter by inventing defaults — fall through to the
            # two-stage path, which raises the proper error.
            and "window" in self.downsample_config
            and "cutoff_mult" in self.downsample_config
            and not self.downsample_config.get("rectify", False)
            and bool(self.fir_delays)
            and all(int(d) > 0 for d in self.fir_delays)
        )
        if self.fused_downsample_fir is True and not eligible:
            raise ValueError(
                "fused_downsample_fir=True requires downsample method "
                "'lanczos' (rectify=False) with explicit window/"
                "cutoff_mult and strictly positive fir_delays; got "
                f"config={self.downsample_config!r}, "
                f"delays={self.fir_delays}"
            )
        return eligible

    def _device_resident_active(self) -> bool:
        if self.device_resident == "auto":
            return self._fused_eligible()
        return bool(self.device_resident)

    def extract_and_delay_features_fused(self) -> Dict[str, np.ndarray]:
        """Stages 1+2 in one device program per story: Lanczos interpolation
        to TRs and FIR delay stacking run as a single fused kernel — the
        downsampled base matrix never round-trips through HBM/host between
        the two stages (the north-star fusion; reference hot path:
        encoding/downsample/interpdata.py:110-124 +
        encoding/features/FIR_expander.py:24-43).

        Output is IDENTICAL to extract_and_downsample_features() followed by
        apply_fir_delays(): per-space fused blocks are truncated to the
        common story length and re-interleaved by delay so multi-extractor
        column order matches FIR.make_delayed(hstack(spaces)).

        With device_resident active, blocks stay as device arrays (no
        np.asarray fetch per story); structuring then also runs on device."""
        import jax.numpy as jnp

        from litcoder_core_tpu.ops import fir as fir_ops
        from litcoder_core_tpu.ops.pallas_kernels import lanczos_fir

        resident = self._device_resident_active()
        xp = jnp if resident else np

        delays = [int(d) for d in self.fir_delays]
        n_delays = len(delays)
        window = self.downsample_config["window"]         # required
        cutoff_mult = self.downsample_config["cutoff_mult"]  # required

        all_delayed = {}
        for story in self.stories_to_process:
            idx = self.assembly.stories.index(story)
            tr_times = self.assembly.get_tr_times()[idx]
            spaces = []      # per-extractor (T, n_delays * D) delayed blocks
            for extractor in self.feature_extractors:
                features = self._extract_single_features(extractor, story,
                                                         idx)
                if self._should_downsample(extractor):
                    if isinstance(features, tuple):  # speech: (data, times)
                        data, data_times = features
                    else:
                        data = features
                        data_times = self.assembly.get_data_times()[idx]
                    block = lanczos_fir(
                        data, data_times, tr_times, delays=tuple(delays),
                        window=window, cutoff_mult=cutoff_mult,
                    )
                    if not resident:
                        block = np.asarray(block)
                else:
                    # Pre-TR-binned (wordrate): delay-stack only.
                    block = (fir_ops.make_delayed(features, delays) if resident
                             else FIR.make_delayed(np.asarray(features),
                                                   delays))
                spaces.append(block)

            # Align story length across extractors, post-FIR: with strictly
            # positive delays, make_delayed(f[:m]) == make_delayed(f)[:m].
            min_len = min(b.shape[0] for b in spaces)
            spaces = [b[:min_len] for b in spaces]
            if not self.concat_features:
                all_delayed[story] = spaces
                logger.info("Story %s (fused): %d feature spaces %s", story,
                            len(spaces), [b.shape for b in spaces])
                continue
            if len(spaces) == 1:
                combined = spaces[0]
            else:
                # (T, k*Di) blocks -> (T, k, Di) -> concat dims -> (T, k*D):
                # exactly FIR.make_delayed(hstack(spaces)) column order.
                stacked = xp.concatenate(
                    [b.reshape(min_len, n_delays, -1) for b in spaces],
                    axis=2,
                )
                combined = stacked.reshape(min_len, -1)
            all_delayed[story] = combined
            logger.info("Story %s (fused): delayed shape %s", story,
                        combined.shape)
        return all_delayed

    def _downsample_features(self, features, story_idx: int):
        if isinstance(features, tuple):
            # Speech: (features, times).
            features, times = features
            return self.downsampler.downsample(
                data=features,
                data_times=times,
                tr_times=self.assembly.get_tr_times()[story_idx],
                split_indices=self.assembly.get_split_indices()[story_idx],
                **self.downsample_config,
            )
        return self.downsampler.downsample(
            data=features,
            data_times=self.assembly.get_data_times()[story_idx],
            tr_times=self.assembly.get_tr_times()[story_idx],
            split_indices=self.assembly.get_split_indices()[story_idx],
            **self.downsample_config,
        )

    # ------------------------------------------------------------ stage 2

    def apply_fir_delays(
        self, features: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        delayed = {}
        for story, feat in features.items():
            if isinstance(feat, list):  # per-space (banded) mode
                delayed[story] = [
                    FIR.make_delayed(f, self.fir_delays) for f in feat
                ]
            else:
                delayed[story] = FIR.make_delayed(feat, self.fir_delays)
                logger.info("Story %s: delayed shape %s", story,
                            delayed[story].shape)
        return delayed

    # ------------------------------------------------------------ stage 3

    def _prefetch_brain_data(self, budget_bytes: int = 4 << 30):
        """Enqueue per-story response transfers BEFORE extraction.

        With device-resident structuring the responses must cross the
        host->device link exactly once either way; issuing the
        device_puts up front lets the transfers ride the link while the
        extraction stage keeps the chip busy with forwards (the link is
        otherwise idle then) instead of paying them serially inside
        structure_data — on the tunneled chip that was most of an 80 s
        structuring stage at LeBel surface scale. Budget-gated: at
        whole-brain scale the full response set next to the fit's own
        concatenation would crowd HBM, so large assemblies keep the
        transfer-at-structuring behavior."""
        if not self._device_resident_active():
            return None
        arrs = {
            story: self.assembly.get_brain_data()[
                self.assembly.stories.index(story)
            ]
            for story in self.stories_to_process
        }
        total = sum(int(np.asarray(a).nbytes) for a in arrs.values())
        if total > budget_bytes:
            logger.info(
                "brain-data prefetch skipped: %.1f GB exceeds the %.1f GB "
                "device budget (transfers stay in structure_data)",
                total / 2**30, budget_bytes / 2**30)
            return None
        import jax

        return {s: jax.device_put(a) for s, a in arrs.items()}

    def structure_data(
        self, features: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        brain_data = self._brain_prefetch or {
            story: self.assembly.get_brain_data()[
                self.assembly.stories.index(story)
            ]
            for story in self.stories_to_process
        }
        self._brain_prefetch = None
        if self.use_train_test_split:
            return self._create_train_test_split(features, brain_data)
        return self._create_concatenated_data(features, brain_data)

    def _structure_ops(self):
        """(zs, vstack, nan_to_num) — host numpy or device jnp twins
        (trainer_zscore reproduces utils.core.zs exactly on device)."""
        if self._device_resident_active():
            import jax.numpy as jnp

            from litcoder_core_tpu.ops.stats import trainer_zscore

            return trainer_zscore, jnp.vstack, jnp.nan_to_num
        return zs, np.vstack, np.nan_to_num

    def _create_train_test_split(self, features: Dict,
                                 brain_data: Dict) -> Dict[str, np.ndarray]:
        """LeBel style: last story held out; per-story z-score + trim + vstack
        (reference: trainer.py:223-262). In banded (per-space) mode the same
        structuring is applied to each feature space independently."""
        stories = list(features.keys())
        train_stories, test_stories = stories[:-1], stories[-1:]
        cfg = self.trimming_config
        zs_fn, vstack, nan_to_num = self._structure_ops()

        if isinstance(features[stories[0]], list):
            n_spaces = len(features[stories[0]])

            def stack(space_idx, story_list, lo_key, hi_key):
                return nan_to_num(vstack([
                    zs_fn(features[s][space_idx][cfg.get(lo_key, 0):
                                                 cfg.get(hi_key, None)])
                    for s in story_list
                ]))

            Rstim = [stack(b, train_stories, "train_features_start",
                           "train_features_end") for b in range(n_spaces)]
            Pstim = [stack(b, test_stories, "test_features_start",
                           "test_features_end") for b in range(n_spaces)]
            Rresp = vstack([
                zs_fn(brain_data[s][cfg.get("train_targets_start", 0):
                                    cfg.get("train_targets_end", None)])
                for s in train_stories
            ])
            Presp = vstack([
                zs_fn(brain_data[s][cfg.get("test_targets_start", 0):
                                    cfg.get("test_targets_end", None)])
                for s in test_stories
            ])
            return {"Rstim": Rstim, "Rresp": Rresp,
                    "Pstim": Pstim, "Presp": Presp}

        X_train = nan_to_num(vstack([
            zs_fn(features[s][cfg.get("train_features_start", 0):
                              cfg.get("train_features_end", None)])
            for s in train_stories
        ]))
        Y_train = vstack([
            zs_fn(brain_data[s][cfg.get("train_targets_start", 0):
                                cfg.get("train_targets_end", None)])
            for s in train_stories
        ])
        X_test = nan_to_num(vstack([
            zs_fn(features[s][cfg.get("test_features_start", 0):
                              cfg.get("test_features_end", None)])
            for s in test_stories
        ]))
        Y_test = vstack([
            zs_fn(brain_data[s][cfg.get("test_targets_start", 0):
                                cfg.get("test_targets_end", None)])
            for s in test_stories
        ])
        logger.info("Train: X%s Y%s | Test: X%s Y%s", X_train.shape,
                    Y_train.shape, X_test.shape, Y_test.shape)
        return {"Rstim": X_train, "Rresp": Y_train,
                "Pstim": X_test, "Presp": Y_test}

    def _create_concatenated_data(self, features: Dict,
                                  brain_data: Dict) -> Dict[str, np.ndarray]:
        """LPP/Narratives style: concat in story order + global trim
        (reference: trainer.py:264-282)."""
        cfg = self.trimming_config
        if not self.concat_features:
            raise ValueError(
                "Banded (concat_features=False) training requires "
                "use_train_test_split=True"
            )
        _, vstack, _ = self._structure_ops()
        X = vstack([features[s] for s in self.stories_to_process])
        Y = vstack([brain_data[s] for s in self.stories_to_process])
        X = X[cfg.get("features_start", 0):cfg.get("features_end", None)]
        Y = Y[cfg.get("targets_start", 0):cfg.get("targets_end", None)]
        logger.info("Final: X%s Y%s", X.shape, Y.shape)
        return {"X": X, "Y": Y}

    # ------------------------------------------------------------ stages 4-5

    def train(self, **model_kwargs) -> Dict[str, Any]:
        """Run the complete pipeline (reference: trainer.py:284-320),
        with per-stage wall-clock accounting (StageTimer)."""
        from litcoder_core_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        # Enqueue response transfers so they overlap the extraction
        # stage's device compute (see _prefetch_brain_data).
        self._brain_prefetch = self._prefetch_brain_data()
        if self._fused_eligible():
            with timer.stage("extract_downsample_fir_fused"):
                delayed = self.extract_and_delay_features_fused()
        else:
            with timer.stage("extract_and_downsample"):
                features = self.extract_and_downsample_features()
            with timer.stage("fir_delays"):
                delayed = self.apply_fir_delays(features)
        with timer.stage("structure_data"):
            data = self.structure_data(delayed)

        logger.info("Starting model training...")
        banded = "Rstim" in data and isinstance(data["Rstim"], list)
        with timer.stage("fit_predict"):
            if banded:
                # Multi-space model API (banded OR stacked): feature
                # SPACES, train/test mode only. Banded returns a 4-tuple
                # (..., best_gammas); stacked returns 3.
                out = self.model.fit_predict(
                    data["Rstim"], data["Rresp"],
                    X_tests=data["Pstim"], y_test=data["Presp"],
                    **model_kwargs,
                )
                metrics, weights, best_alphas = out[:3]
            elif "Rstim" in data:
                metrics, weights, best_alphas = self.model.fit_predict(
                    features=data["Rstim"], targets=data["Rresp"],
                    X_test=data["Pstim"], y_test=data["Presp"],
                    **model_kwargs,
                )
            else:
                if not self.concat_features:
                    raise ValueError(
                        "Banded (concat_features=False) training requires "
                        "use_train_test_split=True"
                    )
                metrics, weights, best_alphas = self.model.fit_predict(
                    features=data["X"], targets=data["Y"], **model_kwargs,
                )

        with timer.stage("log_and_save"):
            self.log_metrics(metrics)
            self.save_model(weights, best_alphas, metrics, model_kwargs)
        stage_seconds = timer.report()
        for name, dt in stage_seconds.items():
            self.experiment_logger.log_scalar(f"stage_seconds/{name}", dt)
        # Pipeline-level wall split (extract / align / structure / fit /
        # save), distinct from the model's own 'stage_seconds' — callers
        # and benchmarks read the composed wall a user experiences here
        # (benchmarks/trainer_e2e.py).
        metrics["trainer_stage_seconds"] = dict(stage_seconds)
        logger.info("Training complete. Median correlation: %.4f",
                    metrics["median_score"])
        return metrics

    def log_metrics(self, metrics: Dict):
        log = self.experiment_logger
        log.log_scalar("median_correlation", float(metrics["median_score"]))
        log.log_scalar("mean_correlation", float(metrics["mean_score"]))
        log.log_scalar("std_correlation", float(metrics["std_score"]))
        if "correlations" in metrics and "significant_mask" in metrics:
            correlations = np.array(metrics["correlations"])
            mask = np.array(metrics["significant_mask"], dtype=bool)
            # Surface plots only apply at fsaverage5 resolution; other voxel
            # counts are treated as volume-style (histograms only).
            is_volume = correlations.shape[0] != 20484
            try:
                self.brain_plotter.log_plots(correlations, mask, "", None,
                                             is_volume)
            except Exception as e:
                logger.warning("Brain plotting failed: %s", e)
        if "best_alpha" in metrics:
            log.log_scalar("best_alpha", float(metrics["best_alpha"]))
        if "n_significant" in metrics:
            log.log_scalar("n_significant_voxels",
                           float(metrics["n_significant"]))

    def save_model(self, weights, best_alphas, metrics, model_kwargs):
        hyperparams = {
            "fir_delays": self.fir_delays,
            "trimming_config": self.trimming_config,
            "use_train_test_split": self.use_train_test_split,
            "downsample_config": self.downsample_config,
            "layer_idx": self.layer_idx,
            "lookback": self.lookback,
            "dataset_type": self.dataset_type,
            "stories_processed": len(self.stories_to_process),
            **model_kwargs,
        }
        self.model_saver.save_encoding_model(
            weights=weights, best_alphas=best_alphas,
            hyperparams=hyperparams, metrics=metrics,
        )
