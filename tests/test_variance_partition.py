"""Variance partitioning: recovered unique/shared structure on synthetic
spaces with known ground truth."""

import numpy as np
import pytest

from litcoder_core_tpu.models.variance_partition import (
    variance_partitioning,
)

rng = np.random.default_rng(17)


def _spaces(t=400, tp=120, v=30):
    """Space A drives voxels 0..9 only, space B voxels 10..19 only,
    a SHARED latent drives voxels 20..29 through both spaces."""
    latent = rng.normal(size=(t + tp, 4)).astype(np.float32)
    a_only = rng.normal(size=(t + tp, 6)).astype(np.float32)
    b_only = rng.normal(size=(t + tp, 6)).astype(np.float32)
    XA = np.hstack([a_only, latent])         # A carries the latent too
    XB = np.hstack([b_only, latent])
    Y = np.zeros((t + tp, v), np.float32)
    Y[:, 0:10] = a_only @ rng.normal(size=(6, 10)).astype(np.float32)
    Y[:, 10:20] = b_only @ rng.normal(size=(6, 10)).astype(np.float32)
    Y[:, 20:30] = latent @ rng.normal(size=(4, 10)).astype(np.float32)
    Y += 0.4 * rng.normal(size=(t + tp, v)).astype(np.float32)
    return (XA[:t], XB[:t]), Y[:t], (XA[t:], XB[t:]), Y[t:]


def test_two_space_partition_recovers_structure():
    Xs, Y, Xts, Yt = _spaces()
    out = variance_partitioning(Xs, Y, Xts, Yt, names=["lm", "speech"],
                                chunk_length=10, n_inner_folds=3, seed=0)
    assert set(out) == {"r2_lm", "r2_speech", "r2_lmspeech",
                        "unique_lm", "unique_speech", "shared"}
    # A-only voxels: unique to lm, not to speech.
    assert np.median(out["unique_lm"][:10]) > 0.2
    assert np.median(out["unique_speech"][:10]) < 0.1
    # B-only voxels: the reverse.
    assert np.median(out["unique_speech"][10:20]) > 0.2
    assert np.median(out["unique_lm"][10:20]) < 0.1
    # Latent voxels: shared variance dominates both uniques.
    assert np.median(out["shared"][20:30]) > 0.3
    assert np.median(out["unique_lm"][20:30]) < 0.1
    assert np.median(out["unique_speech"][20:30]) < 0.1


def test_three_space_partition_keys_and_identity():
    Xs2, Y, Xts2, Yt = _spaces()
    XC = rng.normal(size=(Y.shape[0], 5)).astype(np.float32)
    XCt = rng.normal(size=(Yt.shape[0], 5)).astype(np.float32)
    out = variance_partitioning(
        (Xs2[0], Xs2[1], XC), Y, (Xts2[0], Xts2[1], XCt),
        Yt, chunk_length=10, n_inner_folds=3, seed=0,
    )
    for key in ("unique_A", "unique_B", "unique_C", "shared_AB",
                "shared_AC", "shared_BC", "shared_ABC", "r2_ABC"):
        assert key in out, key
    # The 7 components must sum back to the full-model R2 exactly
    # (inclusion-exclusion identity).
    total = (out["unique_A"] + out["unique_B"] + out["unique_C"]
             + out["shared_AB"] + out["shared_AC"] + out["shared_BC"]
             + out["shared_ABC"])
    np.testing.assert_allclose(total, out["r2_ABC"], atol=1e-6)
    # Pure-noise space C explains nothing unique.
    assert np.median(np.abs(out["unique_C"])) < 0.05


def test_rejects_wrong_space_count():
    X = rng.normal(size=(50, 4)).astype(np.float32)
    Y = rng.normal(size=(50, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="2 or 3 spaces"):
        variance_partitioning((X,), Y, (X,), Y)
