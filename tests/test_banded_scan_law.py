"""Guarded scaling-law fit for the banded benchmark (VERDICT r3 weak #3:
a degraded-tunnel run once published a negative-slope law fitted over
non-monotonic measurements; the fit must refuse to publish such laws)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
))

from banded_scan import fit_scaling_law  # noqa: E402


def _row(n_gammas, warm_s, fast_scan="False", voxel_chunk=None,
         V=20484, T=26880):
    return {"metric": "banded_ridge_fit_wall_seconds",
            "n_gammas": n_gammas, "warm_s": warm_s,
            "fast_scan": fast_scan, "voxel_chunk": voxel_chunk,
            "V": V, "T": T}


def test_law_publishes_for_clean_monotonic_rows():
    law = fit_scaling_law([_row(5, 100.0), _row(10, 150.0),
                           _row(20, 250.0)])
    assert "law_rejected" not in law
    assert law["warm_s_model"].endswith("* n_gammas")
    # 50 + 10g -> 120s at g=7
    assert law["gammas_at_2min"] == 7


def test_law_rejected_for_nonmonotonic_rows():
    # The round-3 pollution shape: 292 s at g=5, 224 s at g=20.
    law = fit_scaling_law([_row(5, 292.4), _row(10, 170.2),
                           _row(20, 224.7)])
    assert "law_rejected" in law and "monotonic" in law["law_rejected"]
    assert "warm_s_model" not in law


def test_law_rejected_for_mixed_configs():
    law = fit_scaling_law([_row(5, 50.0, fast_scan="False"),
                           _row(10, 100.0, fast_scan="auto")])
    assert "law_rejected" in law and "mixed" in law["law_rejected"]


def test_law_needs_two_rows_and_ignores_law_records():
    assert fit_scaling_law([_row(5, 50.0)]) is None
    law = fit_scaling_law([
        _row(5, 50.0), _row(10, 100.0),
        {"metric": "banded_scan_scaling_law", "warm_s_model": "junk"},
    ])
    assert "law_rejected" not in law


def test_law_rejected_for_flat_slope():
    law = fit_scaling_law([_row(5, 100.0), _row(10, 100.0),
                           _row(20, 100.0)])
    # Flat walls are "monotonic" (non-decreasing) but give slope 0.
    assert "law_rejected" in law and "slope" in law["law_rejected"]
