"""Stacked-regression CLI path: --stacking routes the unified CLI's
multi-space data prep (one space per modality, same as --banded) into
models.stacking.StackedRidgeModel — prediction-level blending with
per-voxel simplex weights. Not in the reference."""

import numpy as np
import pytest

from litcoder_core_tpu.assembly.assembly_loader import save_assembly
from litcoder_core_tpu.cli import parse_args, run
from tests.test_cli_banded import (
    _assembly_with_audio,
    _banded_config,
    _tiny_lm,
)


def _stacking_config(tmp_path, asm_path, **overrides):
    config = _banded_config(tmp_path, asm_path, banded=False, stacking=True)
    # The banded base sets a non-default n_gammas, which stacking now
    # REJECTS as a silently-ignored flag (ADVICE r3).
    config.pop("n_gammas", None)
    config.update(overrides)
    return config


def test_stacking_cli_wordrate_lm(tmp_path):
    """End-to-end through the unified CLI code path: one space per
    modality (wordrate + language_model), per-voxel simplex blend."""
    assembly = _assembly_with_audio(tmp_path, n_vox=12)
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)

    lm, tok = _tiny_lm()
    config = _stacking_config(
        tmp_path, asm_path,
        modalities=["wordrate", "language_model"],
        model_names=["wordrate", "tiny-gpt2"],
        extractor_config_overrides={
            "language_model": {"model": lm, "tokenizer": tok,
                               "batch_size": 16},
        },
    )
    metrics = run(config)
    assert np.isfinite(metrics["median_score"])
    # Metrics carry per-space SUMMARIES (full (V, S) weights are the
    # model's returned/saved weights, not a metrics payload — ADVICE r3).
    w_mean = np.asarray(metrics["stack_weights_mean"])
    assert w_mean.shape == (2,)
    np.testing.assert_allclose(w_mean.sum(), 1.0, atol=1e-4)
    assert np.asarray(metrics["stack_dominant_share"]).sum() == 1.0
    assert len(metrics["per_space_test_r"]) == 2
    # The word-rate space carries the signal (TRUE_WEIGHTS in the story
    # fixtures), so the blend should recover it.
    assert metrics["median_score"] > 0.2


def test_stacking_flag_parses_and_conflicts():
    args = parse_args([
        "--dataset_type", "lebel", "--stacking",
        "--ndelays", "4", "--lookback", "256", "--cache_dir", "c",
    ])
    assert args.stacking and not args.banded

    from pathlib import Path

    cfg = _stacking_config(Path("/tmp"), "x.pkl", banded=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        run(cfg)


def test_stacking_rejects_unsupported_flags(tmp_path):
    assembly = _assembly_with_audio(tmp_path, n_vox=12)
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    base = dict(modalities=["wordrate", "wordrate"],
                model_names=["wordrate", "wordrate"])
    # Flags that are silently ignored by the stacked fit must be rejected
    # rather than accepted (ADVICE r3).
    with pytest.raises(ValueError, match="n_permutations"):
        run(_stacking_config(tmp_path, asm_path, n_permutations=99, **base))
    with pytest.raises(ValueError, match="n_gammas"):
        run(_stacking_config(tmp_path, asm_path, n_gammas=5, **base))
    with pytest.raises(ValueError, match="normalize"):
        run(_stacking_config(tmp_path, asm_path, normalize_features=True,
                             **base))
    with pytest.raises(ValueError, match="fast_scan"):
        run(_stacking_config(tmp_path, asm_path, fast_scan=True, **base))
