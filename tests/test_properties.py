"""Property-based tests (hypothesis) for the core math invariants.

These complement the golden-value tests: instead of fixed fixtures they
assert structural identities over randomized shapes/values — the
invariants the solver paths rely on (SURVEY.md §4 recommends exactly this
class of tests; the reference has none).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from litcoder_core_tpu.models.folding import create_folds
from litcoder_core_tpu.ops import fir as fir_ops
from litcoder_core_tpu.ops.stats import pearson_r, trainer_zscore
from litcoder_core_tpu.utils.core import zs

SETTINGS = settings(max_examples=25, deadline=None)


def _rng(seed):
    return np.random.default_rng(seed)


# ---- FIR ---------------------------------------------------------------------

@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(5, 40), st.integers(1, 6),
       st.lists(st.integers(0, 4), min_size=1, max_size=4, unique=True))
def test_fir_shift_identity(seed, t, d, delays):
    """Column block k of make_delayed equals the stimulus shifted by
    delays[k] with zero padding."""
    stim = _rng(seed).normal(size=(t, d)).astype(np.float32)
    out = np.asarray(fir_ops.make_delayed(stim, delays))
    for k, delay in enumerate(delays):
        block = out[:, k * d:(k + 1) * d]
        expected = np.zeros_like(stim)
        if delay == 0:
            expected = stim
        else:
            expected[delay:] = stim[:-delay]
        np.testing.assert_allclose(block, expected, atol=0)


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(4, 30), st.integers(1, 5))
def test_fir_circpad_preserves_columns_as_permutation(seed, t, d):
    """Circular padding only permutes rows within each delayed block."""
    stim = _rng(seed).normal(size=(t, d)).astype(np.float32)
    out = np.asarray(fir_ops.make_delayed(stim, [2], circpad=True))
    np.testing.assert_allclose(np.sort(out, axis=0), np.sort(stim, axis=0),
                               atol=1e-6)


# ---- z-scoring ----------------------------------------------------------------

@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(3, 50), st.integers(1, 8))
def test_trainer_zscore_matches_numpy_zs(seed, t, d):
    x = _rng(seed).normal(size=(t, d)).astype(np.float32) * 10
    np.testing.assert_allclose(np.asarray(trainer_zscore(x)), zs(x),
                               atol=1e-5)


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(3, 50))
def test_zscore_affine_invariance(seed, t):
    """z-scoring is invariant to affine transforms of the input."""
    x = _rng(seed).normal(size=(t, 3)).astype(np.float64)
    np.testing.assert_allclose(zs(3.7 * x + 11.0), zs(x), atol=1e-8)


# ---- Pearson r ----------------------------------------------------------------

@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(4, 60), st.integers(1, 6))
def test_pearson_r_bounds_and_self_correlation(seed, t, v):
    r = _rng(seed)
    y = r.normal(size=(t, v)).astype(np.float32)
    p = r.normal(size=(t, v)).astype(np.float32)
    c = np.asarray(pearson_r(jnp.asarray(y), jnp.asarray(p)))
    assert np.all(c <= 1.0 + 1e-5) and np.all(c >= -1.0 - 1e-5)
    c_self = np.asarray(pearson_r(jnp.asarray(y), jnp.asarray(y * 2 + 1)))
    np.testing.assert_allclose(c_self, 1.0, atol=1e-4)


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(4, 60))
def test_pearson_r_sign_flip(seed, t):
    r = _rng(seed)
    y = r.normal(size=(t, 2)).astype(np.float32)
    p = r.normal(size=(t, 2)).astype(np.float32)
    c_pos = np.asarray(pearson_r(jnp.asarray(y), jnp.asarray(p)))
    c_neg = np.asarray(pearson_r(jnp.asarray(y), jnp.asarray(-p)))
    np.testing.assert_allclose(c_pos, -c_neg, atol=1e-5)


# ---- folding ------------------------------------------------------------------

@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(60, 400),
       st.integers(2, 6), st.integers(5, 20))
def test_chunked_folds_partition_and_disjoint(seed, n, folds, chunk):
    """Every chunked fold: train and val are disjoint, and the val sets
    partition the covered rows across folds."""
    splits = create_folds(n_samples=n, fold_type="chunked", n_folds=folds,
                          chunk_length=chunk, seed=seed)
    all_val = np.concatenate([va for _, va in splits])
    assert len(np.unique(all_val)) == len(all_val)  # val sets disjoint
    for tr, va in splits:
        assert len(np.intersect1d(tr, va)) == 0
        assert np.all((0 <= tr) & (tr < n)) and np.all((0 <= va) & (va < n))


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(100, 400), st.integers(5, 20))
def test_chunked_folds_seeded_reproducible(seed, n, chunk):
    a = create_folds(n_samples=n, fold_type="chunked", n_folds=4,
                     chunk_length=chunk, seed=seed)
    b = create_folds(n_samples=n, fold_type="chunked", n_folds=4,
                     chunk_length=chunk, seed=seed)
    for (tr1, va1), (tr2, va2) in zip(a, b):
        np.testing.assert_array_equal(tr1, tr2)
        np.testing.assert_array_equal(va1, va2)


# ---- ridge --------------------------------------------------------------------

@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(30, 80), st.integers(2, 10))
def test_ridge_alpha_zero_matches_lstsq(seed, t, d):
    """alpha -> 0 on a full-rank tall design reduces ridge to least
    squares."""
    from litcoder_core_tpu.models.ridge import ridge_fit

    r = _rng(seed)
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = r.normal(size=(t, 3)).astype(np.float32)
    w_ridge = np.asarray(ridge_fit(X, Y, np.array([1e-6], np.float32)))
    w_lstsq, *_ = np.linalg.lstsq(X, Y, rcond=None)
    np.testing.assert_allclose(w_ridge, w_lstsq, atol=5e-3)


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(30, 70), st.integers(2, 8))
def test_ridge_shrinks_with_alpha(seed, t, d):
    """Weight norms are monotonically nonincreasing in alpha."""
    from litcoder_core_tpu.models.ridge import ridge_fit

    r = _rng(seed)
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = r.normal(size=(t, 2)).astype(np.float32)
    norms = []
    for a in (0.1, 10.0, 1000.0):
        w = np.asarray(ridge_fit(X, Y, np.array([a], np.float32)))
        norms.append(float(np.linalg.norm(w)))
    assert norms[0] >= norms[1] >= norms[2]


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(24, 60), st.integers(2, 8),
       st.floats(0.5, 1e3))
def test_chol_solve_matches_spectral_solve(seed, t, d, alpha):
    """(G + a^2 I)^{-1} X^T Y via Cholesky == the masked-spectrum ridge
    formula, for arbitrary PD shifts — the identity the fast search paths
    rest on."""
    from litcoder_core_tpu.models.ridge import ridge_fit

    r = _rng(seed)
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = r.normal(size=(t, 2)).astype(np.float32)
    w_spec = np.asarray(ridge_fit(X, Y, np.array([alpha], np.float32)))
    G = (X.T @ X).astype(np.float64)
    w_chol = np.linalg.solve(G + alpha**2 * np.eye(d), X.T @ Y)
    np.testing.assert_allclose(w_spec, w_chol, atol=1e-3, rtol=1e-3)
