"""Variance partitioning across feature spaces (beyond the reference).

A standard encoding-model analysis (Lescroart et al. 2015; de Heer et al.
2017) the reference does not implement: fit every non-empty subset of the
feature spaces with the same nested-CV ridge, then decompose each voxel's
explained variance (squared held-out correlation) into unique and shared
components by inclusion-exclusion. With the eigensolve-free solver a
2-space partition costs three fits and a 3-space partition seven — seconds
at fsaverage5 scale on one chip.

Conventions:
- R2 of a subset = sign-preserving squared held-out Pearson r per voxel
  (r * |r|, so anti-correlated predictions don't masquerade as explained
  variance).
- 2 spaces:  unique_A = R2_AB - R2_B;  shared_AB = R2_A + R2_B - R2_AB.
- 3 spaces: full inclusion-exclusion over the 7 subset fits.
Negative components are reported as-is (they are meaningful diagnostics of
suppression / overfitting; clip downstream if desired).
"""

import itertools
import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _fit_r2(Xs, Y, X_tests, y_test, **fit_kwargs) -> np.ndarray:
    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    X = np.concatenate([np.asarray(x, np.float32) for x in Xs], axis=1)
    Xt = np.concatenate([np.asarray(x, np.float32) for x in X_tests],
                        axis=1)
    metrics, _, _ = fit_nested_cv(X, Y, X_test=Xt, y_test=y_test,
                                  return_weights=False, **fit_kwargs)
    r = np.asarray(metrics["correlations"], np.float64)
    return r * np.abs(r)  # signed R^2


def variance_partitioning(
    Xs: Sequence[np.ndarray],
    Y: np.ndarray,
    X_tests: Sequence[np.ndarray],
    y_test: np.ndarray,
    names: Optional[List[str]] = None,
    **fit_kwargs,
) -> Dict[str, np.ndarray]:
    """Unique/shared variance per voxel over 2 or 3 feature spaces.

    Args:
        Xs / X_tests: per-space train/test design matrices (same T rows).
        Y / y_test: responses.
        names: optional space labels (default "A", "B", "C").
        fit_kwargs: forwarded to fit_nested_cv (alphas, chunk_length,
            n_inner_folds, seed, method, fast_scan, ...).

    Returns dict with:
        'r2_<subset>' for every non-empty subset (e.g. 'r2_A', 'r2_AB'),
        'unique_<name>' per space, and 'shared' (2 spaces) or
        'shared_<pair>' + 'shared_<all three names>' (3 spaces, e.g.
        'shared_ABC' with default names); each an (V,) float64 array.
    """
    n_spaces = len(Xs)
    if n_spaces not in (2, 3):
        raise ValueError(
            f"variance partitioning supports 2 or 3 spaces, got {n_spaces}"
        )
    if len(X_tests) != n_spaces:
        raise ValueError("X_tests must match Xs per space")
    if names is None:
        names = ["A", "B", "C"][:n_spaces]

    subsets = [
        tuple(sorted(c))
        for k in range(1, n_spaces + 1)
        for c in itertools.combinations(range(n_spaces), k)
    ]
    r2: Dict[tuple, np.ndarray] = {}
    for sub in subsets:
        label = "".join(names[i] for i in sub)
        logger.info("variance partitioning: fitting subset %s", label)
        r2[sub] = _fit_r2([Xs[i] for i in sub], Y,
                          [X_tests[i] for i in sub], y_test, **fit_kwargs)

    out: Dict[str, np.ndarray] = {
        "r2_" + "".join(names[i] for i in sub): v for sub, v in r2.items()
    }
    full = tuple(range(n_spaces))
    if n_spaces == 2:
        a, b = (0,), (1,)
        out[f"unique_{names[0]}"] = r2[full] - r2[b]
        out[f"unique_{names[1]}"] = r2[full] - r2[a]
        out["shared"] = r2[a] + r2[b] - r2[full]
    else:
        a, b, c = (0,), (1,), (2,)
        ab, ac, bc = (0, 1), (0, 2), (1, 2)
        # Inclusion-exclusion over the 7 fits.
        out[f"unique_{names[0]}"] = r2[full] - r2[bc]
        out[f"unique_{names[1]}"] = r2[full] - r2[ac]
        out[f"unique_{names[2]}"] = r2[full] - r2[ab]
        out[f"shared_{names[0]}{names[1]}"] = (
            r2[ac] + r2[bc] - r2[c] - r2[full]
        )
        out[f"shared_{names[0]}{names[2]}"] = (
            r2[ab] + r2[bc] - r2[b] - r2[full]
        )
        out[f"shared_{names[1]}{names[2]}"] = (
            r2[ab] + r2[ac] - r2[a] - r2[full]
        )
        # Shared among all three: singles - pairs + full (standard 3-set
        # inclusion-exclusion on variance components). Keyed by the caller's
        # names like the pairwise components ('shared_ABC' with the default
        # names).
        out[f"shared_{names[0]}{names[1]}{names[2]}"] = (
            r2[a] + r2[b] + r2[c] - r2[ab] - r2[ac] - r2[bc] + r2[full]
        )
    return out
