"""Golden tests for device-side stats vs scipy / hand-rolled BH."""

import numpy as np
import pytest
from scipy import stats as sps

from litcoder_core_tpu.ops.stats import (
    bh_fdrcorrection,
    fisher_combine_pvalues,
    pearson_pvalues,
    pearson_r,
    pearson_r_pvalues,
    zscore,
)

rng = np.random.default_rng(0)


def _bh_reference(pvals, alpha=0.05):
    """statsmodels.fdrcorrection(method='indep') reimplemented in numpy."""
    pvals = np.asarray(pvals)
    n = len(pvals)
    order = np.argsort(pvals)
    ranked = pvals[order]
    ecdf = np.arange(1, n + 1) / n
    reject = ranked <= ecdf * alpha
    if reject.any():
        rejectmax = max(np.nonzero(reject)[0])
        reject[: rejectmax + 1] = True
    corrected = ranked / ecdf
    corrected = np.minimum.accumulate(corrected[::-1])[::-1]
    corrected = np.clip(corrected, 0, 1)
    out_reject = np.empty_like(reject)
    out_corr = np.empty_like(corrected)
    out_reject[order] = reject
    out_corr[order] = corrected
    return out_reject, out_corr


def test_pearson_r_matches_scipy():
    y_true = rng.normal(size=(100, 7))
    y_pred = y_true * 0.5 + rng.normal(size=(100, 7))
    r = np.asarray(pearson_r(y_true, y_pred))
    for v in range(7):
        ref_r, _ = sps.pearsonr(y_true[:, v], y_pred[:, v])
        assert abs(r[v] - ref_r) < 1e-5


def test_pearson_pvalues_match_scipy():
    y_true = rng.normal(size=(60, 9))
    y_pred = 0.3 * y_true + rng.normal(size=(60, 9))
    r, p = pearson_r_pvalues(y_true, y_pred)
    p = np.asarray(p)
    for v in range(9):
        _, ref_p = sps.pearsonr(y_true[:, v], y_pred[:, v])
        assert abs(p[v] - ref_p) < 1e-5


def test_pearson_nan_policy():
    """Constant columns -> r = 0, p = 1 (reference nested_cv.py:433-437)."""
    y_true = np.ones((20, 2))
    y_pred = rng.normal(size=(20, 2))
    r, p = pearson_r_pvalues(y_true, y_pred)
    assert np.allclose(np.asarray(r), 0.0)
    assert np.allclose(np.asarray(p), 1.0)


def test_fisher_combination_matches_scipy():
    p_folds = rng.uniform(1e-6, 1, size=(5, 13))
    ours = np.asarray(fisher_combine_pvalues(p_folds))
    for v in range(13):
        _, ref = sps.combine_pvalues(p_folds[:, v], method="fisher")
        assert abs(ours[v] - ref) < 1e-5


def test_fisher_all_ones_special_case():
    p_folds = np.ones((5, 3))
    ours = np.asarray(fisher_combine_pvalues(p_folds))
    assert np.allclose(ours, 1.0)


@pytest.mark.parametrize("alpha", [0.05, 0.2])
def test_bh_fdr_matches_statsmodels_semantics(alpha):
    pvals = rng.uniform(size=200) ** 3  # skew small
    reject, corrected = bh_fdrcorrection(pvals, alpha=alpha)
    ref_reject, ref_corr = _bh_reference(pvals, alpha=alpha)
    assert np.array_equal(np.asarray(reject), ref_reject)
    assert np.allclose(np.asarray(corrected), ref_corr, atol=1e-6)


def test_bh_fdr_none_significant():
    pvals = np.linspace(0.5, 1.0, 50)
    reject, _ = bh_fdrcorrection(pvals, alpha=0.05)
    assert not np.asarray(reject).any()


def test_zscore_matches_torch_unbiased():
    import torch

    x = rng.normal(size=(50, 4)).astype(np.float32)
    ours = np.asarray(zscore(x, axis=0))
    t = torch.tensor(x)
    ref = ((t - t.mean(dim=0, keepdim=True))
           / (t.std(dim=0, keepdim=True) + 1e-8)).numpy()
    assert np.allclose(ours, ref, atol=1e-5)


def test_permutation_pvalues():
    import jax

    from litcoder_core_tpu.ops.stats import permutation_pvalues

    T, V = 200, 6
    y_true = rng.normal(size=(T, V)).astype(np.float32)
    # First 3 voxels perfectly predicted, last 3 pure noise.
    y_pred = np.concatenate(
        [y_true[:, :3], rng.normal(size=(T, 3)).astype(np.float32)], axis=1
    )
    p, obs = permutation_pvalues(
        y_true, y_pred, jax.random.PRNGKey(0), n_permutations=200
    )
    p, obs = np.asarray(p), np.asarray(obs)
    # Signal voxels: minimal possible p = 1/(n+1); noise voxels: large p.
    assert np.all(p[:3] <= 2 / 201)
    assert np.all(p[3:] > 0.05)
    assert np.all(obs[:3] > 0.99)


def test_permutation_pvalues_two_sided():
    import jax

    from litcoder_core_tpu.ops.stats import permutation_pvalues

    y_true = rng.normal(size=(150, 2)).astype(np.float32)
    y_pred = -y_true  # perfect anticorrelation
    p1, _ = permutation_pvalues(y_true, y_pred, jax.random.PRNGKey(1),
                                n_permutations=100)
    p2, _ = permutation_pvalues(y_true, y_pred, jax.random.PRNGKey(1),
                                n_permutations=100, two_sided=True)
    # One-sided on r: anticorrelation is NOT significant; two-sided: it is.
    assert np.all(np.asarray(p1) > 0.5)
    assert np.all(np.asarray(p2) <= 2 / 101)


def test_fisher_zero_pvalue_guard():
    """p==0 folds must combine to 0 without NaN/inf poisoning (the log floor
    must be representable in float32)."""
    from litcoder_core_tpu.ops.stats import fisher_combine_pvalues

    p = np.array([[0.0, 0.5, 1.0], [0.3, 0.5, 1.0]], np.float32)
    out = np.asarray(fisher_combine_pvalues(p))
    assert np.isfinite(out).all()
    assert out[0] < 1e-30         # a p=0 fold dominates (floored, not NaN)
    assert 0 < out[1] < 1
    assert out[2] == 1.0          # all-ones special case
