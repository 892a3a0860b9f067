"""Golden tests for device-side stats vs scipy / hand-rolled BH."""

import jax.numpy as jnp
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


# ------------------------------------------------------- float64 host tails


def test_pearson_pvalues_f64_tail_matches_scipy():
    """At LeBel scale (n ~ 2k test TRs) the float64 tail must track scipy
    into regions where float32 betainc underflows to 0."""
    from scipy.stats import beta as beta_dist

    from litcoder_core_tpu.ops.stats import (
        pearson_pvalues_f64,
        pearson_pvalues,
    )

    n = 2000
    rs = np.array([0.05, 0.2, 0.5, 0.9, 0.99, 0.999, 0.9999, -0.9999])
    got = pearson_pvalues_f64(rs, n)
    df = n - 2
    expected = np.array(
        [2 * beta_dist.cdf(0.5 * (1 - abs(r)), df / 2, df / 2) for r in rs]
    )  # scipy.stats.pearsonr's exact two-sided formula
    np.testing.assert_allclose(got, expected, rtol=1e-10)

    # The float32 device version saturates to 0 well before scipy does;
    # the f64 tail must not. r=0.35 @ n=2000 puts p ~ 1e-60: below
    # float32's ~1e-45 subnormal floor, comfortably inside float64.
    r_tail = np.float32(0.35)
    p32 = float(pearson_pvalues(jnp.asarray([r_tail]), n)[0])
    p64 = float(pearson_pvalues_f64(np.asarray([r_tail]), n)[0])
    expected_tail = 2 * beta_dist.cdf(0.5 * (1 - float(r_tail)), df / 2,
                                      df / 2)
    assert p32 == 0.0  # float32 underflow at this (r, n)
    assert 0.0 < p64 < 1e-45  # float64 keeps the tail
    np.testing.assert_allclose(p64, expected_tail, rtol=1e-6)


def test_pearson_pvalues_f64_agrees_with_f32_where_representable():
    from litcoder_core_tpu.ops.stats import (
        pearson_pvalues,
        pearson_pvalues_f64,
    )

    rng = np.random.default_rng(3)
    rs = rng.uniform(-0.5, 0.5, 64).astype(np.float32)
    p32 = np.asarray(pearson_pvalues(jnp.asarray(rs), 100))
    p64 = pearson_pvalues_f64(rs, 100)
    np.testing.assert_allclose(p32, p64, rtol=2e-4, atol=1e-6)


def test_fisher_combine_f64_matches_scipy():
    from scipy.stats import combine_pvalues

    from litcoder_core_tpu.ops.stats import fisher_combine_pvalues_f64

    rng = np.random.default_rng(4)
    p = rng.uniform(1e-12, 1.0, size=(5, 40))
    got = fisher_combine_pvalues_f64(p)
    expected = np.array(
        [combine_pvalues(p[:, v], method="fisher").pvalue
         for v in range(p.shape[1])]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    # all-ones guard + a literal zero p-value
    p0 = np.ones((3, 2))
    p0[0, 1] = 0.0
    out = fisher_combine_pvalues_f64(p0)
    assert out[0] == 1.0 and out[1] == 0.0


def test_bh_fdrcorrection_np_matches_scipy_and_device():
    from scipy.stats import false_discovery_control

    from litcoder_core_tpu.ops.stats import (
        bh_fdrcorrection,
        bh_fdrcorrection_np,
    )

    rng = np.random.default_rng(5)
    p = np.concatenate([rng.uniform(0, 1e-4, 30), rng.uniform(0, 1, 200)])
    reject, corrected = bh_fdrcorrection_np(p, alpha=0.05)
    np.testing.assert_allclose(
        corrected, false_discovery_control(p, method="bh"), rtol=1e-12
    )
    # statsmodels step-up semantics: reject iff corrected p <= alpha.
    np.testing.assert_array_equal(reject, corrected <= 0.05)
    # Device float32 version agrees on decisions for well-separated inputs.
    reject32, _ = bh_fdrcorrection(jnp.asarray(p, jnp.float32), alpha=0.05)
    np.testing.assert_array_equal(reject, np.asarray(reject32))


def test_bh_fdrcorrection_np_tail_decisions_beyond_float32():
    """p-values below float32's subnormal range must still rank correctly
    (float32 flushes them all to 0, losing the ordering)."""
    from litcoder_core_tpu.ops.stats import bh_fdrcorrection_np

    p = np.array([1e-300, 1e-200, 1e-100, 0.04, 0.5, 0.9])
    reject, corrected = bh_fdrcorrection_np(p, alpha=0.05)
    assert reject[:3].all() and not reject[4:].any()
    assert corrected[0] < corrected[1] < corrected[2]  # ordering preserved


def test_trainer_zscore_matches_host_zs():
    """Device twin of utils.core.zs: ddof=0, zero-variance columns left
    demeaned, 1-D supported."""
    from litcoder_core_tpu.ops.stats import trainer_zscore
    from litcoder_core_tpu.utils.core import zs

    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 6)).astype(np.float32)
    x[:, 2] = 7.0  # zero-variance column
    np.testing.assert_allclose(
        np.asarray(trainer_zscore(x)), zs(x), atol=1e-6
    )
    v = rng.normal(size=40).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(trainer_zscore(v)), zs(v), atol=1e-6
    )
    c = np.full(10, 3.0, np.float32)  # constant 1-D
    np.testing.assert_allclose(
        np.asarray(trainer_zscore(c)), zs(c), atol=1e-6
    )


def test_noise_ceiling_split_half():
    """High-SNR voxels approach ceiling 1; pure-noise voxels stay near 0;
    ceiling grows with the number of repeats."""
    import jax

    from litcoder_core_tpu.ops.stats import noise_ceiling_split_half

    r = np.random.default_rng(19)
    t, v, reps = 240, 20, 8
    signal = r.normal(size=(t, v)).astype(np.float32)
    noise_scale = np.where(np.arange(v) < 10, 0.3, 50.0).astype(np.float32)
    resp = signal[None] + noise_scale[None, None, :] * r.normal(
        size=(reps, t, v)).astype(np.float32)
    ceil = np.asarray(noise_ceiling_split_half(resp))
    assert np.all(ceil[:10] > 0.9)        # high-SNR voxels
    assert np.all(np.abs(ceil[10:]) < 0.4)  # noise voxels
    # Fewer repeats -> lower ceiling for the noisy voxels on average.
    ceil2 = np.asarray(noise_ceiling_split_half(resp[:2]))
    assert np.mean(ceil2[:10]) <= np.mean(ceil[:10]) + 1e-3
    with pytest.raises(ValueError, match=">= 2 repeats"):
        noise_ceiling_split_half(resp[:1])
