"""Voxelwise statistics as device-side array programs.

The reference computes Pearson r + p per voxel with a serial host-side
scipy.stats.pearsonr loop (reference: encoding/models/nested_cv.py:418-438),
Fisher p-value combination with a serial per-voxel scipy loop
(nested_cv.py:441-477), and BH-FDR via statsmodels
(nested_cv.py:158,282). Here all of them are O(V)-parallel jnp programs that
run on TPU in microseconds for ~100k voxels.

Closed forms used (numerically identical to the scipy/statsmodels results):
- two-sided Pearson p-value: with df = n - 2 and t^2 = r^2 df / (1 - r^2),
  p = I_{df/(df+t^2)}(df/2, 1/2) = betainc(df/2, 1/2, 1 - r^2).
- Fisher combination of k p-values: stat = -2 sum(log p),
  p_comb = SF_chi2(stat; 2k) = gammaincc(k, stat / 2).
- Benjamini-Hochberg step-up identical to
  statsmodels.stats.multitest.fdrcorrection(method='indep').
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammaincc


def zscore(x, axis=0, eps: float = 1e-8, ddof: int = 1):
    """Z-score along `axis` with numerical-stability eps.

    Matches the reference's torch path (encoding/models/ridge_utils.py:6-15):
    torch .std() is the unbiased (ddof=1) estimator. Pass ddof=0 for the
    numpy-style variant used at the trainer level (encoding/utils.py zscore).
    """
    x = jnp.asarray(x)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True, ddof=ddof)
    return (x - mean) / (std + eps)


def trainer_zscore(x):
    """Device twin of utils.core.zs (reference encoding/utils.py:23-29):
    per-column ddof=0 z-score where zero-variance columns are left DEMEANED
    (no eps in the denominator — the eps variant above matches the model-
    level torch path instead). Jittable; works for 1-D and 2-D inputs."""
    x = jnp.asarray(x)
    m = x - jnp.mean(x, axis=0, keepdims=(x.ndim > 1))
    s = jnp.std(x, axis=0, keepdims=(x.ndim > 1))
    return jnp.where(s == 0.0, m, m / jnp.where(s == 0.0, 1.0, s))


def pearson_r(y_true, y_pred, axis=0):
    """Columnwise Pearson correlation; NaN -> 0 like the reference
    (encoding/models/nested_cv.py:433-436)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    yt = y_true - jnp.mean(y_true, axis=axis, keepdims=True)
    yp = y_pred - jnp.mean(y_pred, axis=axis, keepdims=True)
    num = jnp.sum(yt * yp, axis=axis)
    den = jnp.sqrt(jnp.sum(yt * yt, axis=axis) * jnp.sum(yp * yp, axis=axis))
    r = num / den
    return jnp.nan_to_num(r, nan=0.0, posinf=0.0, neginf=0.0)


def pearson_pvalues(r, n: int):
    """Two-sided p-value of Pearson r with n samples via the beta closed form.

    Replaces the reference's per-voxel scipy.pearsonr host loop
    (encoding/models/nested_cv.py:433-437). NaN -> 1 like the reference.
    """
    r = jnp.asarray(r, jnp.float32)
    df = float(n - 2)
    if df <= 0:
        return jnp.ones_like(r)
    x = jnp.clip(1.0 - r * r, 0.0, 1.0)
    p = betainc(df / 2.0, 0.5, x)
    # |r| == 1 -> p = 0; r == 0 -> p = 1; NaN -> 1.
    p = jnp.where(jnp.isnan(r), 1.0, p)
    return jnp.clip(jnp.nan_to_num(p, nan=1.0), 0.0, 1.0)


def pearson_pvalues_f64(r, n: int):
    """Host float64 two-sided Pearson p-values, bit-matching
    scipy.stats.pearsonr's tail (betainc(df/2, 1/2, 1 - r^2) in double).

    The device version above runs in float32 (JAX x64 is off globally), so
    for |r| near 1 at LeBel scale (n ~ 2k test TRs) p underflows to 0 far
    earlier than scipy's float64, perturbing BH thresholds near alpha.
    Model-layer code (models/nested_cv.py) refines device p-values through
    this before any FDR/Fisher decision; the float32 version stays for the
    fully-jitted fused step (parallel/step.py)."""
    import numpy as np
    from scipy.special import betainc as betainc_f64

    r64 = np.asarray(r, np.float64)
    df = float(n - 2)
    if df <= 0:
        return np.ones_like(r64)
    x = np.clip(1.0 - r64 * r64, 0.0, 1.0)
    p = betainc_f64(df / 2.0, 0.5, x)
    p = np.where(np.isnan(r64), 1.0, p)
    return np.clip(np.nan_to_num(p, nan=1.0), 0.0, 1.0)


def fisher_combine_pvalues_f64(fold_pvalues):
    """Host float64 Fisher combination (see fisher_combine_pvalues), exact
    to scipy.stats.combine_pvalues(method='fisher'), with the reference's
    all-p==1 guard (encoding/models/nested_cv.py:459-462)."""
    import numpy as np
    from scipy.special import gammaincc as gammaincc_f64

    p = np.asarray(fold_pvalues, np.float64)
    k = p.shape[0]
    with np.errstate(divide="ignore"):  # log(0) -> -inf -> stat inf -> p 0
        stat = -2.0 * np.sum(np.log(p), axis=0)
    combined = np.where(np.isinf(stat), 0.0,
                        gammaincc_f64(float(k), stat / 2.0))
    return np.where(np.all(p >= 1.0, axis=0), 1.0, combined)


def bh_fdrcorrection_np(pvals, alpha: float = 0.05):
    """Host float64 Benjamini-Hochberg step-up, identical to statsmodels
    fdrcorrection(method='indep') (reference usage:
    encoding/models/nested_cv.py:158,263,282). Returns
    (reject_mask, corrected_pvals) as numpy arrays."""
    import numpy as np

    p = np.asarray(pvals, np.float64)
    n = p.shape[0]
    order = np.argsort(p, kind="stable")
    ranked = p[order]
    ecdf = np.arange(1, n + 1, dtype=np.float64) / n

    corrected_sorted = np.minimum(
        np.minimum.accumulate((ranked / ecdf)[::-1])[::-1], 1.0
    )
    below = ranked <= ecdf * alpha
    reject_sorted = np.zeros(n, dtype=bool)
    if below.any():
        reject_sorted[: np.max(np.nonzero(below)[0]) + 1] = True

    inv = np.argsort(order)
    return reject_sorted[inv], corrected_sorted[inv]


def pearson_r_pvalues(y_true, y_pred, axis=0):
    """Fused correlations + p-values (one pass over the data)."""
    r = pearson_r(y_true, y_pred, axis=axis)
    n = y_true.shape[axis]
    return r, pearson_pvalues(r, n)


def fisher_combine_pvalues(fold_pvalues):
    """Combine p-values across folds per voxel with Fisher's method.

    Args:
        fold_pvalues: (n_folds, n_voxels) array of p-values.

    Special-cases all-p==1 voxels to exactly 1.0, matching the reference's
    guard (encoding/models/nested_cv.py:459-462).
    """
    p = jnp.asarray(fold_pvalues, jnp.float32)
    k = p.shape[0]
    # Guard log(0): chi2 stat of p=0 is +inf -> combined p 0, which is correct,
    # but avoid NaN from 0 * inf paths. The floor must be representable in
    # float32 (1e-300 would underflow to 0 and disable the guard).
    logs = jnp.log(jnp.clip(p, jnp.finfo(jnp.float32).tiny, 1.0))
    stat = -2.0 * jnp.sum(logs, axis=0)
    combined = gammaincc(float(k), stat / 2.0)
    all_ones = jnp.all(p >= 1.0, axis=0)
    return jnp.where(all_ones, 1.0, combined)


@partial(jax.jit, static_argnames=("alpha",))
def bh_fdrcorrection(pvals, alpha: float = 0.05):
    """Benjamini-Hochberg FDR: returns (reject_mask, corrected_pvals).

    Device-side equivalent of statsmodels fdrcorrection(alpha, method='indep')
    used at encoding/models/nested_cv.py:158,263,282.
    """
    p = jnp.asarray(pvals, jnp.float32)
    n = p.shape[0]
    order = jnp.argsort(p)
    ranked = p[order]
    ecdf = jnp.arange(1, n + 1, dtype=jnp.float32) / n

    # Corrected p-values: p/ecdf, then enforce monotone non-decreasing from the
    # back (min of suffix), clipped at 1.
    raw = ranked / ecdf
    corrected_sorted = jnp.minimum(
        jnp.flip(jax.lax.cummin(jnp.flip(raw))), 1.0
    )

    # Step-up rejection: reject all hypotheses with rank <= max rank where
    # p_(i) <= ecdf_i * alpha.
    below = ranked <= ecdf * alpha
    any_below = jnp.any(below)
    max_idx = jnp.max(jnp.where(below, jnp.arange(n), -1))
    reject_sorted = jnp.where(
        any_below, jnp.arange(n) <= max_idx, jnp.zeros(n, dtype=bool)
    )

    inv = jnp.argsort(order)
    return reject_sorted[inv], corrected_sorted[inv]


@partial(jax.jit, static_argnames=("n_permutations", "two_sided"))
def permutation_pvalues(y_true, y_pred, key, n_permutations: int = 1000,
                        two_sided: bool = False):
    """Voxelwise permutation p-values via circular time shifts, on device.

    Circular shifts preserve each series' autocorrelation structure (the
    standard non-parametric null for fMRI time series), unlike iid shuffles.
    Not in the reference (it uses parametric pearsonr p-values only); named
    by the north star ("permutation significance on-device").

    Args:
        y_true/y_pred: (T, V).
        key: jax PRNG key.
        n_permutations: number of null shifts.

    Returns:
        (p_values (V,), observed_r (V,)): p = (1 + #{|null| >= |obs|}) /
        (n_permutations + 1) when two_sided, else one-sided on r.
    """
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    T = y_true.shape[0]
    obs = pearson_r(y_true, y_pred)

    offsets = jax.random.randint(key, (n_permutations,), 1, T)

    def one_shift(off):
        null_r = pearson_r(y_true, jnp.roll(y_pred, off, axis=0))
        if two_sided:
            return (jnp.abs(null_r) >= jnp.abs(obs)).astype(jnp.float32)
        return (null_r >= obs).astype(jnp.float32)

    exceed = jax.lax.map(one_shift, offsets).sum(axis=0)
    p = (1.0 + exceed) / (n_permutations + 1.0)
    return p, obs


def signed_square_corr(y_true, y_pred, axis=0):
    """Signed-sqrt R^2 metric (use_corr=False path), matching
    encoding/models/ridge_regression.py:127-130 with torch-unbiased variance."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    resvar = jnp.var(y_true - y_pred, axis=axis, ddof=1)
    truevar = jnp.var(y_true, axis=axis, ddof=1)
    rsq = 1.0 - resvar / truevar
    return jnp.sqrt(jnp.abs(rsq)) * jnp.sign(rsq)


def noise_ceiling_split_half(responses, key=None, n_splits: int = 20):
    """Per-voxel noise ceiling from repeated presentations (beyond the
    reference): mean split-half correlation across random partitions of
    the repeats, Spearman-Brown corrected to the full repeat count.

    Args:
        responses: (n_reps, T, V) responses to n_reps presentations of the
            SAME stimulus.
        key: jax PRNG key (defaults to PRNGKey(0); pass one for different
            partitions).
        n_splits: random half-splits to average over.

    Returns:
        (V,) float32 ceiling estimates in [-1, 1] — the correlation an
        ideal model could reach against single-presentation noise. Used to
        normalize encoding scores (r / sqrt(ceiling)).
    """
    responses = jnp.asarray(responses, jnp.float32)
    n_reps = responses.shape[0]
    if n_reps < 2:
        raise ValueError("noise ceiling needs >= 2 repeats")
    if key is None:
        key = jax.random.PRNGKey(0)
    # With odd n_reps the leftover repeat is DROPPED from each split (a
    # fresh repeat per permutation): Spearman-Brown assumes equal halves,
    # and correcting a 1-rep-vs-2-rep correlation with ratio n/half biases
    # the ceiling.
    half = n_reps // 2

    def one_split(k):
        perm = jax.random.permutation(k, n_reps)
        a = jnp.mean(responses[perm[:half]], axis=0)
        b = jnp.mean(responses[perm[half:2 * half]], axis=0)
        return pearson_r(a, b)

    r_half = jnp.mean(
        jax.lax.map(one_split, jax.random.split(key, n_splits)), axis=0
    )
    # Spearman-Brown: predict reliability of the n_reps-average from the
    # half-split correlation.
    ratio = n_reps / half
    return (ratio * r_half) / (1.0 + (ratio - 1.0) * r_half)
