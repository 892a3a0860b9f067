"""The real-data acceptance harness must be runnable today on a synthetic
pickle (exit 2 while reference values are unrecorded; PASS once filled)."""

import json
import os
import subprocess
import sys

import numpy as np

from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.assembly_loader import save_assembly
from tests.test_trainer_e2e import _make_story

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_realdata.py")


def _synthetic_pickle(tmp_path):
    # Long stories so the LeBel trims (test 50:-5 / targets 40:) leave data.
    stories = [_make_story(f"s{i}", n_trs=160) for i in range(3)]
    # train_simple trimming has features 50:-5 vs targets 40:None on the
    # test story: rows only align when len differs by construction in real
    # LeBel data. For the synthetic check, make targets 15 rows shorter so
    # (160-50-5) == (145-40).
    for sd in stories:
        sd.brain_data = sd.brain_data[:145]
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(SimpleNeuroidAssembly(stories, "outer"), asm_path)
    return asm_path


def _run(asm_path, expected_path, *extra):
    return subprocess.run(
        [sys.executable, SCRIPT, asm_path, "--expected", expected_path,
         "--platform", "cpu", *extra],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env=dict(os.environ),
    )


def test_harness_exit2_without_reference_values(tmp_path):
    asm_path = _synthetic_pickle(tmp_path)
    expected_path = str(tmp_path / "expected.json")
    with open(os.path.join(REPO, "scripts", "expected_lebel_uts03.json")) as f:
        template = json.load(f)
    assert template["reference"]["median_score"] is None  # ships unfilled
    with open(expected_path, "w") as f:
        json.dump(template, f)
    proc = _run(asm_path, expected_path)
    assert proc.returncode == 2, proc.stderr
    assert "NO REFERENCE VALUES" in proc.stderr
    ours = json.loads(proc.stdout[: proc.stdout.rindex("}") + 1])["ours"]
    assert np.isfinite(ours["median_score"])


def test_harness_pass_and_mismatch(tmp_path):
    asm_path = _synthetic_pickle(tmp_path)
    expected_path = str(tmp_path / "expected.json")

    # First run to learn the deterministic metrics, then require them.
    proc0 = _run(asm_path, expected_path + ".bootstrap")
    assert proc0.returncode != 0  # bootstrap file missing -> error path
    with open(expected_path, "w") as f:
        json.dump({"reference": {"median_score": None}}, f)
    proc1 = _run(asm_path, expected_path)
    ours = json.loads(proc1.stdout[: proc1.stdout.rindex("}") + 1])["ours"]

    with open(expected_path, "w") as f:
        json.dump({"reference": {
            "median_score": ours["median_score"],
            "n_significant": ours["n_significant"],
        }}, f)
    proc = _run(asm_path, expected_path, "--record-ours")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout
    with open(expected_path) as f:
        assert len(json.load(f)["ours_history"]) == 1

    with open(expected_path, "w") as f:
        json.dump({"reference": {
            "median_score": ours["median_score"] + 0.5,
            "n_significant": ours["n_significant"],
        }}, f)
    proc = _run(asm_path, expected_path)
    assert proc.returncode == 1
    assert "MISMATCH" in proc.stdout
