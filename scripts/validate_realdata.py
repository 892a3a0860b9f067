#!/usr/bin/env python3
"""Real-data acceptance harness: LeBel UTS03 wordrate run vs reference.

BASELINE.md's accuracy oracle is the reference's train_simple.py run on the
prepackaged LeBel UTS03 assembly pickle (reference train_simple.py:12-64,
README.md:30-106): it reports median_score (median voxelwise Pearson r) and
n_significant (BH-FDR alpha=0.05). This script runs OUR pipeline on the
same pickle with the same trimming/fir/fold settings and compares against
stored reference values — ready to execute the moment real data is mounted
(no real data ships in this environment).

Usage:
  python scripts/validate_realdata.py /path/to/assembly_lebel_uts03.pkl
      [--expected scripts/expected_lebel_uts03.json] [--atol 1e-3]
      [--record-ours]

To populate the expected file: run the reference
(`python /root/reference/train_simple.py` pointed at the same pickle),
then write its median_score / n_significant into the JSON (fields are null
until then; the script exits 2 with instructions while they are).

Exit codes: 0 = within tolerance; 1 = MISMATCH; 2 = no expected values yet.
"""

import argparse
import json
import os
import sys

DEFAULT_EXPECTED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "expected_lebel_uts03.json")

# Run straight from a checkout even when the package isn't pip-installed.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def run_ours(assembly_path: str, seed: int = 0):
    from litcoder_core_tpu.assembly.assembly_loader import load_assembly
    from litcoder_core_tpu.downsample.downsampling import Downsampler
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.models.nested_cv import NestedCVModel
    from litcoder_core_tpu.trainer import AbstractTrainer

    assembly = load_assembly(assembly_path)
    extractor = FeatureExtractorFactory.create_extractor(
        modality="wordrate", model_name="wordrate", config={},
        cache_dir="cache",
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[extractor],
        downsampler=Downsampler(),
        model=NestedCVModel(model_name="ridge_regression", seed=seed),
        fir_delays=[1, 2, 3, 4],
        # LeBel trimming (reference train_simple.py:35-40).
        trimming_config={
            "train_features_start": 10, "train_features_end": -5,
            "train_targets_start": 0, "train_targets_end": None,
            "test_features_start": 50, "test_features_end": -5,
            "test_targets_start": 40, "test_targets_end": None,
        },
        use_train_test_split=True,
        logger_backend="none",
        dataset_type="lebel",
        results_dir="results",
        downsample_config={},
    )
    metrics = trainer.train()
    return {
        "median_score": float(metrics["median_score"]),
        "n_significant": int(metrics["n_significant"]),
        "n_voxels": len(metrics["correlations"]),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("assembly_path")
    parser.add_argument("--expected", default=DEFAULT_EXPECTED)
    parser.add_argument("--atol", type=float, default=1e-3,
                        help="median-r tolerance (BASELINE.md acceptance)")
    parser.add_argument("--nsig-rtol", type=float, default=0.01,
                        help="n_significant relative tolerance (fold "
                             "randomness differs: reference shuffles are "
                             "unseeded, folding.py:86)")
    parser.add_argument("--record-ours", action="store_true",
                        help="also append our metrics to the expected file "
                             "under 'ours_history' for round-over-round "
                             "regression tracking")
    parser.add_argument("--platform", choices=["default", "cpu"],
                        default="default",
                        help="force the JAX platform; 'cpu' is needed for "
                             "CI/offline runs because the tunneled TPU "
                             "plugin ignores the JAX_PLATFORMS env var")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    ours = run_ours(args.assembly_path)
    print(json.dumps({"ours": ours}, indent=2))

    with open(args.expected) as f:
        expected = json.load(f)

    if args.record_ours:
        expected.setdefault("ours_history", []).append(ours)
        with open(args.expected, "w") as f:
            json.dump(expected, f, indent=2)
            f.write("\n")

    ref = expected.get("reference", {})
    if ref.get("median_score") is None:
        print(
            "NO REFERENCE VALUES RECORDED YET.\n"
            "Run the reference on the same pickle:\n"
            "  python /root/reference/train_simple.py  (edit its assembly "
            "path)\n"
            f"then fill reference.median_score / reference.n_significant in "
            f"{args.expected} and re-run.",
            file=sys.stderr,
        )
        return 2

    d_median = abs(ours["median_score"] - ref["median_score"])
    ok_median = d_median <= args.atol
    ok_nsig = True
    if ref.get("n_significant") is not None:
        denom = max(ref["n_significant"], 1)
        ok_nsig = (abs(ours["n_significant"] - ref["n_significant"]) / denom
                   <= args.nsig_rtol)
    status = "PASS" if (ok_median and ok_nsig) else "MISMATCH"
    print(f"{status}: |median_r - ref| = {d_median:.2e} "
          f"(atol {args.atol}), n_significant {ours['n_significant']} vs "
          f"ref {ref.get('n_significant')}")
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
