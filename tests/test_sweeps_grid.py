"""Grid sweep farming (SURVEY.md §5.8's outermost axis): subject x layer x
modality expansion, ModelSaver-linked rows, resumable execution, and the
summary-table artifact."""

import json

import numpy as np
import pytest

from litcoder_core_tpu.assembly.assembly_loader import save_assembly
from litcoder_core_tpu.sweeps import (
    expand_grid,
    run_grid_sweep,
    summarize_sweep,
)
from tests.test_trainer_e2e import assembly  # noqa: F401 (fixture)


def _base(tmp_path, asm_path):
    return dict(
        dataset_type="lebel", assembly_path=asm_path, data_dir=None,
        subject="S1", tr=2.0, context_type="fullcontext", use_volume=False,
        story_idx=None, modalities=["wordrate"], model_names=["wordrate"],
        layer_idx=9, last_token=False, n_outer_folds=5, n_inner_folds=3,
        folding_type="chunked", chunk_length=10, singcutoff=1e-10,
        single_alpha=True, seed=0, downsample_method="lanczos",
        lanczos_cutoff_mult=1.0, lanczos_window=3, normalize_features=False,
        normalize_targets=False, ndelays=4, lookback=256,
        cache_dir=str(tmp_path / "cache"),
        results_dir=str(tmp_path / "results"), logger_backend="none",
        train_features_start=5, train_features_end=-5,
        train_targets_start=5, train_targets_end=-5,
        test_features_start=5, test_features_end=-5,
        test_targets_start=5, test_targets_end=-5,
    )


def test_expand_grid_cartesian_and_labels():
    base = {"dataset_type": "lebel", "seed": 0}
    configs = expand_grid(base, subject=["A", "B"], layer_idx=[1, 2, 3])
    assert len(configs) == 6
    labels = {c["sweep_label"] for c in configs}
    assert len(labels) == 6 and "layer_idx-1_subject-A" in labels
    # Deterministic run_name per grid point (addressable ModelSaver runs).
    assert all(c["run_name"] == f"sweep_{c['sweep_label']}"
               for c in configs)
    # Base is never mutated.
    assert base == {"dataset_type": "lebel", "seed": 0}
    with pytest.raises(ValueError, match="no axes"):
        expand_grid(base)


def test_grid_sweep_end_to_end_with_resume(assembly, tmp_path):  # noqa: F811
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    base = _base(tmp_path, asm_path)
    ckpt = str(tmp_path / "ckpt")
    summary = str(tmp_path / "summary.json")

    rows = run_grid_sweep(
        base, checkpoint_dir=ckpt, summary_path=summary,
        subject=["S1", "S2"], seed=[0, 1],
    )
    assert len(rows) == 4
    assert all(r["error"] is None for r in rows)
    assert all(np.isfinite(r["median_score"]) for r in rows)
    # Rows link back to their persisted ModelSaver runs.
    assert all(r["run_name"].startswith("sweep_") for r in rows)
    run_dirs = list((tmp_path / "results").glob("run_*"))
    assert len(run_dirs) == 4

    # Summary artifact: JSON + CSV twin with the grid axes as columns.
    recs = json.loads(open(summary).read())
    assert len(recs) == 4 and recs[0]["subject"] in ("S1", "S2")
    csv_text = open(str(tmp_path / "summary.csv")).read()
    assert "median_score" in csv_text.splitlines()[0]
    assert len(csv_text.strip().splitlines()) == 5

    # Resume: a second invocation hits every checkpoint — no new runs.
    rows2 = run_grid_sweep(
        base, checkpoint_dir=ckpt, summary_path=summary,
        subject=["S1", "S2"], seed=[0, 1],
    )
    assert [r["config"] for r in rows2] == [r["config"] for r in rows]
    assert len(list((tmp_path / "results").glob("run_*"))) == len(run_dirs)


def test_summarize_sweep_table_renders_failures():
    rows = [
        {"config": "a", "median_score": 0.5, "n_significant": 3,
         "error": None, "subject": "S1"},
        {"config": "b", "median_score": float("nan"), "n_significant": 0,
         "error": "boom"},
    ]
    table = summarize_sweep(rows)
    lines = table.splitlines()
    assert "median_score" in lines[0] and "subject" in lines[0]
    assert "0.5000" in table and "boom" in table and "nan" in table
    assert summarize_sweep([]) == "(empty sweep)"
