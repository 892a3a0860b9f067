"""Cross-validation fold construction (seeded, reproducible).

Re-implements all 7 fold schemes of reference encoding/models/folding.py:8-255
as pure index arithmetic. One deliberate fix: the reference shuffles chunks
with the *unseeded* global `random.shuffle` (folding.py:86,156), making folds
irreproducible; here every shuffle draws from an explicit
numpy.random.Generator seed (SURVEY.md "hard parts" (b)).

Folds are host-side numpy int arrays — they are trace-time constants for the
jitted ridge program, so building them on host costs nothing.
"""

import logging
from typing import List, Optional, Tuple

import numpy as np
from sklearn.model_selection import GroupKFold, KFold, TimeSeriesSplit

logger = logging.getLogger(__name__)

Fold = Tuple[np.ndarray, np.ndarray]


def create_folds(
    n_samples: int,
    fold_type: str,
    n_folds: int,
    chunk_length: Optional[int] = None,
    trim_size: Optional[int] = None,
    groups: Optional[np.ndarray] = None,
    seed: int = 0,
) -> List[Fold]:
    """Create train/test index folds (reference: encoding/models/folding.py:8-64).

    fold_type in {'chunked', 'chunked_trimmed', 'chunked_contiguous', 'kfold',
    'kfold_trimmed', 'timeseries', 'group'}.
    """
    if fold_type == "chunked":
        return create_chunked_folds(
            n_samples, n_folds, chunk_length, shuffle=True, seed=seed
        )
    if fold_type == "chunked_trimmed":
        return create_chunked_folds_trimmed(
            n_samples, n_folds, chunk_length,
            trim_size=5 if trim_size is None else trim_size,
            shuffle=True, seed=seed,
        )
    if fold_type == "chunked_contiguous":
        return create_chunked_folds(
            n_samples, n_folds, chunk_length, shuffle=False, seed=seed
        )
    if fold_type == "kfold":
        kf = KFold(n_splits=n_folds, shuffle=False)
        return [(np.asarray(tr), np.asarray(te))
                for tr, te in kf.split(range(n_samples))]
    if fold_type == "kfold_trimmed":
        return create_kfold_trimmed(
            n_samples, n_folds, 5 if trim_size is None else trim_size
        )
    if fold_type == "timeseries":
        tscv = TimeSeriesSplit(n_splits=n_folds)
        return [(np.asarray(tr), np.asarray(te))
                for tr, te in tscv.split(range(n_samples))]
    if fold_type == "group":
        if groups is None:
            raise ValueError("Groups must be provided for group folding")
        gkf = GroupKFold(n_splits=n_folds)
        return [(np.asarray(tr), np.asarray(te))
                for tr, te in gkf.split(range(n_samples), groups=groups)]
    raise ValueError(f"Unknown folding type: {fold_type}")


def _chunk_assignment(
    n_samples: int, n_folds: int, chunk_length: int, shuffle: bool, seed: int
):
    """Shared chunk bookkeeping: returns (chunk order, chunks per fold) or
    None when there are too few chunks (caller falls back to KFold)."""
    n_complete_chunks = n_samples // chunk_length
    chunk_indices = np.arange(n_complete_chunks)
    if shuffle:
        np.random.default_rng(seed).shuffle(chunk_indices)
    chunks_per_fold = n_complete_chunks // n_folds
    if chunks_per_fold == 0:
        return None
    return chunk_indices, n_complete_chunks, chunks_per_fold


def _chunks_to_indices(chunks, chunk_length: int, n_samples: int) -> np.ndarray:
    """Expand chunk ids to sample indices, clipping the tail chunk."""
    if len(chunks) == 0:
        return np.array([], dtype=np.int64)
    starts = np.asarray(chunks) * chunk_length
    idx = starts[:, None] + np.arange(chunk_length)[None, :]
    idx = idx.reshape(-1)
    return idx[idx < n_samples]


def create_chunked_folds(
    n_samples: int,
    n_folds: int,
    chunk_length: int,
    shuffle: bool = True,
    seed: int = 0,
) -> List[Fold]:
    """Chunk-respecting KFold (reference: encoding/models/folding.py:67-124).

    Chunks of `chunk_length` TRs are dealt into folds (shuffled or
    contiguous); leftover samples past the last complete chunk are unused,
    exactly like the reference.
    """
    assignment = _chunk_assignment(n_samples, n_folds, chunk_length, shuffle, seed)
    if assignment is None:
        logger.warning(
            "Not enough chunks for the requested folds, falling back to KFold"
        )
        kf = KFold(n_splits=n_folds, shuffle=shuffle,
                   random_state=seed if shuffle else None)
        return [(np.asarray(tr), np.asarray(te))
                for tr, te in kf.split(range(n_samples))]
    chunk_indices, n_chunks, per_fold = assignment

    splits: List[Fold] = []
    for i in range(n_folds):
        lo = i * per_fold
        hi = (i + 1) * per_fold if i < n_folds - 1 else n_chunks
        test_chunks = chunk_indices[lo:hi]
        train_chunks = np.concatenate([chunk_indices[:lo], chunk_indices[hi:]])
        # Sample order within a fold doesn't affect the ridge solve or the
        # voxelwise correlations (row permutations cancel), so sort chunks to
        # make the device gathers contiguous.
        train_chunks = np.sort(train_chunks) if shuffle else train_chunks
        test_idx = _chunks_to_indices(np.sort(test_chunks), chunk_length, n_samples)
        train_idx = _chunks_to_indices(train_chunks, chunk_length, n_samples)
        splits.append((train_idx, test_idx))
    return splits


def create_chunked_folds_trimmed(
    n_samples: int,
    n_folds: int,
    chunk_length: int,
    trim_size: int = 5,
    shuffle: bool = True,
    seed: int = 0,
) -> List[Fold]:
    """Chunked folds with `trim_size` TRs cut from each end of every *test*
    chunk to reduce autocorrelation leakage
    (reference: encoding/models/folding.py:127-203). Train chunks stay full.
    """
    assignment = _chunk_assignment(n_samples, n_folds, chunk_length, shuffle, seed)
    if assignment is None:
        logger.warning(
            "Not enough chunks for the requested folds, falling back to KFold"
        )
        kf = KFold(n_splits=n_folds, shuffle=False)
        return [(np.asarray(tr), np.asarray(te))
                for tr, te in kf.split(range(n_samples))]
    chunk_indices, n_chunks, per_fold = assignment

    splits: List[Fold] = []
    for i in range(n_folds):
        lo = i * per_fold
        hi = (i + 1) * per_fold if i < n_folds - 1 else n_chunks
        test_chunks = np.sort(chunk_indices[lo:hi])
        train_chunks = np.sort(
            np.concatenate([chunk_indices[:lo], chunk_indices[hi:]])
        )
        test_parts = []
        for chunk in test_chunks:
            start = chunk * chunk_length
            end = min(start + chunk_length, n_samples)
            t_lo, t_hi = start + trim_size, end - trim_size
            if t_lo < t_hi:
                test_parts.append(np.arange(t_lo, t_hi))
        test_idx = (np.concatenate(test_parts) if test_parts
                    else np.array([], dtype=np.int64))
        train_idx = _chunks_to_indices(train_chunks, chunk_length, n_samples)
        splits.append((train_idx, test_idx))
    return splits


def create_kfold_trimmed(
    n_samples: int, n_folds: int, trim_size: int = 5
) -> List[Fold]:
    """Contiguous KFold with `trim_size` samples cut from each end of the test
    folds (reference: encoding/models/folding.py:206-255)."""
    kf = KFold(n_splits=n_folds, shuffle=False)
    splits: List[Fold] = []
    for train_idx, test_idx in kf.split(range(n_samples)):
        if len(test_idx) > 2 * trim_size:
            test_idx = test_idx[trim_size:-trim_size]
        else:
            logger.warning(
                "Test fold too small (%d samples) to trim %d from each end",
                len(test_idx), trim_size,
            )
        splits.append((np.asarray(train_idx), np.asarray(test_idx)))
    return splits
