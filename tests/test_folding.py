"""Fold-construction tests: structure invariants + seeded reproducibility."""

import numpy as np
import pytest

from litcoder_core_tpu.models.folding import create_folds


def _check_disjoint(splits):
    for tr, te in splits:
        assert len(np.intersect1d(tr, te)) == 0


@pytest.mark.parametrize("fold_type", [
    "chunked", "chunked_trimmed", "chunked_contiguous", "kfold",
    "kfold_trimmed", "timeseries",
])
def test_fold_types_basic(fold_type):
    # chunk_length 20 so chunked_trimmed (default trim 5/side) keeps 10 TRs.
    splits = create_folds(200, fold_type, 5, chunk_length=20, seed=7)
    assert len(splits) == 5
    _check_disjoint(splits)
    for tr, te in splits:
        assert len(te) > 0 and len(tr) > 0
        assert max(tr.max(), te.max()) < 200


def test_chunked_seeded_reproducible():
    a = create_folds(200, "chunked", 5, chunk_length=10, seed=42)
    b = create_folds(200, "chunked", 5, chunk_length=10, seed=42)
    c = create_folds(200, "chunked", 5, chunk_length=10, seed=43)
    for (ta, ea), (tb, eb) in zip(a, b):
        assert np.array_equal(ta, tb) and np.array_equal(ea, eb)
    assert any(
        not np.array_equal(ea, ec) for (_, ea), (_, ec) in zip(a, c)
    )


def test_chunked_respects_chunks():
    """Test indices come in whole chunk_length blocks."""
    splits = create_folds(200, "chunked", 5, chunk_length=10, seed=0)
    for _, te in splits:
        assert len(te) % 10 == 0
        starts = te[::10]
        assert np.all(starts % 10 == 0)


def test_chunked_covers_all_complete_chunks():
    splits = create_folds(205, "chunked", 5, chunk_length=10, seed=0)
    all_test = np.sort(np.concatenate([te for _, te in splits]))
    assert np.array_equal(all_test, np.arange(200))  # 5 leftover unused


def test_chunked_trimmed_removes_edges():
    splits = create_folds(200, "chunked_trimmed", 4, chunk_length=20,
                          trim_size=5, seed=0)
    for tr, te in splits:
        # Each test chunk contributes chunk_length - 2*trim = 10 indices.
        assert len(te) % 10 == 0
        # Trimmed edges are in no test set but remain valid train rows.
        assert len(tr) % 20 == 0


def test_kfold_trimmed():
    splits = create_folds(100, "kfold_trimmed", 5, trim_size=3)
    for tr, te in splits:
        assert len(te) == 20 - 6
        assert len(tr) == 80


def test_group_folding():
    groups = np.repeat(np.arange(10), 10)
    splits = create_folds(100, "group", 5, groups=groups)
    assert len(splits) == 5
    for tr, te in splits:
        assert set(groups[tr]).isdisjoint(set(groups[te]))


def test_group_requires_groups():
    with pytest.raises(ValueError, match="Groups must be provided"):
        create_folds(100, "group", 5)


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="Unknown folding type"):
        create_folds(100, "bogus", 5)


def test_fallback_when_too_few_chunks():
    splits = create_folds(30, "chunked", 5, chunk_length=10, seed=0)
    assert len(splits) == 5
    _check_disjoint(splits)
