"""Sweep utilities: all-layer comparisons over cached activations.

Driver config #3 ("LeBel UTS03 GPT-2 all-layer sweep — ActivationCache +
layer selection"): once one run has populated the all-layer activation cache,
every further layer costs only the (fast, device-side) ridge fit.
"""

import logging
from typing import Any, Callable, Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)


def run_layer_sweep(
    make_trainer: Callable[[int], Any],
    layers: Sequence[int],
    train_kwargs: Optional[Dict[str, Any]] = None,
) -> List[Dict[str, Any]]:
    """Train one model per layer and collect summary metrics.

    Args:
        make_trainer: layer_idx -> configured AbstractTrainer. The FIRST call
            populates the all-layer activation cache; later layers hit it.
        layers: layer indices to sweep.
        train_kwargs: forwarded to trainer.train().

    Returns:
        List of {"layer", "median_score", "mean_score", "n_significant"}
        sorted by layer order given.
    """
    layers = list(layers)
    if not layers:
        raise ValueError("run_layer_sweep: `layers` is empty")
    train_kwargs = train_kwargs or {}
    results = []
    for layer in layers:
        trainer = make_trainer(layer)
        try:
            metrics = trainer.train(**train_kwargs)
        finally:
            closer = getattr(trainer.experiment_logger, "close", None)
            if closer:  # one SummaryWriter per layer would otherwise leak
                closer()
        row = {
            "layer": int(layer),
            "median_score": float(metrics["median_score"]),
            "mean_score": float(metrics["mean_score"]),
            "n_significant": int(metrics.get("n_significant", 0)),
        }
        logger.info("layer %d: median r = %.4f (%d significant)",
                    layer, row["median_score"], row["n_significant"])
        results.append(row)
    best = max(results, key=lambda r: r["median_score"])
    logger.info("best layer: %d (median r = %.4f)", best["layer"],
                best["median_score"])
    return results


def run_subject_sweep(configs: Sequence[Dict[str, Any]],
                      checkpoint_dir: Optional[str] = None,
                      ) -> List[Dict[str, Any]]:
    """Run the unified pipeline for a list of CLI-style config dicts.

    Subjects x models sweeps are embarrassingly parallel (SURVEY.md §5.8):
    across hosts, launch one process per config (each host drives its own
    chips; no collectives needed). Within one host this runs them
    sequentially on the local device.

    Each config is what `litcoder_core_tpu.cli.run` accepts (the parsed-args
    dict). Returns one summary row per config; failures are recorded, not
    raised, so a sweep survives individual bad subjects.

    checkpoint_dir enables RESUME: each completed config's summary is
    written to `<checkpoint_dir>/<hash>.json` and skipped on re-runs — an
    interrupted sweep continues where it stopped (mid-run checkpointing the
    reference has none of, SURVEY.md §5.4).
    """
    import hashlib
    import json
    from pathlib import Path

    from litcoder_core_tpu.cli import run

    ckpt = Path(checkpoint_dir) if checkpoint_dir else None
    if ckpt:
        ckpt.mkdir(parents=True, exist_ok=True)

    def _ckpt_path(config):
        key = hashlib.md5(
            json.dumps(config, sort_keys=True, default=str).encode()
        ).hexdigest()
        return ckpt / f"{key}.json"

    results = []
    for config in configs:
        label = f"{config.get('dataset_type')}/{config.get('subject')}"
        if ckpt:
            path = _ckpt_path(config)
            if path.exists():
                logger.info("sweep config %s: checkpoint hit, skipping",
                            label)
                results.append(json.loads(path.read_text()))
                continue
        try:
            metrics = run(dict(config))
            row = {
                "config": label,
                "median_score": float(metrics["median_score"]),
                "n_significant": int(metrics.get("n_significant", 0)),
                "error": None,
            }
        except Exception as e:  # keep sweeping past bad subjects
            logger.warning("sweep config %s failed: %s", label, e)
            row = {"config": label, "median_score": float("nan"),
                   "n_significant": 0, "error": str(e)}
        results.append(row)
        if ckpt and row["error"] is None:
            _ckpt_path(config).write_text(json.dumps(row))
    return results
