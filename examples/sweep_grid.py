#!/usr/bin/env python3
"""Subject x layer sweep farming over the unified pipeline.

The outermost axis of the framework is embarrassingly parallel job farming
(SURVEY.md §5.8): subjects x models x layers fan out as independent runs —
across hosts, launch one process per grid slice (no collectives); within a
host this script runs them sequentially on the local device with
checkpointed RESUME (interrupt it; rerunning skips completed points).

Usage:
  python examples/sweep_grid.py /path/to/assembly_lebel_uts03.pkl \
      --subjects UTS03 --layers 4 6 8 --out sweep_out

Each grid point is a full CLI config run (wordrate example below; switch
modalities/model_names for LM sweeps — the all-layer activation cache makes
layer sweeps nearly free after the first run). Artifacts per point land in
ModelSaver run dirs named sweep_<label>; the summary table (JSON + CSV)
lands under --out.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from litcoder_core_tpu.sweeps import run_grid_sweep, summarize_sweep  # noqa


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("assembly_path")
    parser.add_argument("--subjects", nargs="+", default=["UTS03"])
    parser.add_argument("--layers", type=int, nargs="+", default=[9])
    parser.add_argument("--out", default="sweep_out")
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    base = dict(
        dataset_type="lebel", assembly_path=args.assembly_path,
        data_dir=None, tr=2.0, context_type="fullcontext", use_volume=False,
        story_idx=None, modalities=["wordrate"], model_names=["wordrate"],
        last_token=False, n_outer_folds=5, n_inner_folds=5,
        folding_type="chunked", chunk_length=20, singcutoff=1e-10,
        single_alpha=False, seed=0, downsample_method="lanczos",
        lanczos_cutoff_mult=1.0, lanczos_window=3,
        normalize_features=False, normalize_targets=False,
        ndelays=4, lookback=256,
        cache_dir=os.path.join(args.out, "cache"),
        results_dir=os.path.join(args.out, "results"),
        logger_backend="none",
        # LeBel trimming (reference train_simple.py:35-40).
        train_features_start=10, train_features_end=-5,
        train_targets_start=0, train_targets_end=None,
        test_features_start=50, test_features_end=-5,
        test_targets_start=40, test_targets_end=None,
    )
    results = run_grid_sweep(
        base,
        checkpoint_dir=os.path.join(args.out, "ckpt"),
        summary_path=os.path.join(args.out, "summary.json"),
        subject=args.subjects,
        layer_idx=args.layers,
    )
    print(summarize_sweep(results))


if __name__ == "__main__":
    main()
