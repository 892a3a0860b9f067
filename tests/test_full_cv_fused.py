"""Fused full-CV mode: cross-outer-fold Gram/XtY reuse.

Locks (a) numerical parity between the fused outer-fold streaming path and
the unfused per-fold path (reference semantics,
encoding/models/nested_cv.py:173-331), (b) the eligibility gates, and
(c) composition with remainder rows (chunking leftovers) and the mesh.
"""

import logging

import numpy as np
import pytest

from litcoder_core_tpu.models.nested_cv import (
    _full_cv_fused_eligible,
    fit_nested_cv,
)

rng = np.random.default_rng(41)


def _problem(T=307, D=8, V=17, noise=0.5):
    """T=307 with chunk_length=10 leaves remainder rows outside every fold
    (and the inner schemes get their own remainders) — exercises the
    union-downdate bookkeeping."""
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + noise * rng.normal(size=(T, V))).astype(np.float32)
    return X, Y


KW = dict(alphas=np.logspace(-1, 3, 5), chunk_length=10, n_outer_folds=3,
          n_inner_folds=3, seed=0, single_alpha=False)


def test_fused_engages_and_matches_unfused(caplog):
    X, Y = _problem()
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        m_fused, w_fused, a_fused = fit_nested_cv(X, Y, **KW)
    assert any("fused outer-fold streaming" in r.message
               for r in caplog.records)

    # method='eigh' forces the unfused per-fold path (round-1 numerics).
    m_ref, w_ref, a_ref = fit_nested_cv(X, Y, method="eigh", **KW)
    assert np.allclose(m_fused["correlations"], m_ref["correlations"],
                       atol=2e-3)
    assert np.allclose(a_fused, a_ref)
    assert np.allclose(w_fused, w_ref, atol=2e-3)
    assert (m_fused["majority_significant_mask"]
            == m_ref["majority_significant_mask"])


def test_fused_single_alpha_and_rsq_metric():
    X, Y = _problem()
    kw = dict(KW, single_alpha=True, use_corr=False, return_weights=False)
    m_fused, w, _ = fit_nested_cv(X, Y, **kw)
    m_ref, _, _ = fit_nested_cv(X, Y, method="eigh", **kw)
    assert w is None
    assert len(set(m_fused["best_alphas"])) == 1
    assert np.allclose(m_fused["correlations"], m_ref["correlations"],
                       atol=2e-3)
    assert m_fused["best_alphas"] == m_ref["best_alphas"]


def test_fused_ineligible_small_alphas(caplog):
    """min(alpha) < 0.03 must fall back (f32 conditioning gate)."""
    X, Y = _problem(T=200)
    with caplog.at_level(logging.INFO,
                         logger="litcoder_core_tpu.models.nested_cv"):
        fit_nested_cv(X, Y, alphas=np.logspace(-3, 3, 4), chunk_length=10,
                      n_outer_folds=3, n_inner_folds=3, seed=0)
    assert any("per-fold (fused ineligible" in r.message
               for r in caplog.records)
    assert not any("fused outer-fold streaming" in r.message
                   for r in caplog.records)


def test_fused_ineligible_normalization():
    X, Y = _problem(T=200)
    ok = _full_cv_fused_eligible(
        "auto", True, np.logspace(-1, 3, 4), 1e-10, True, False,
        [(np.arange(100), np.arange(100, 200))],
        [[(np.arange(50), np.arange(50, 100))]], 8,
    )
    assert not ok


def test_fused_ineligible_non_complement_folds():
    """A fold whose train rows are NOT (union - its test rows) breaks the
    downdate identity (e.g. timeseries-style growing windows)."""
    tr1 = np.arange(0, 100)       # union - te1 would also include 150..199
    te1 = np.arange(100, 150)
    tr2 = np.arange(0, 150)
    te2 = np.arange(150, 200)
    inner = [[(np.arange(50), np.arange(50, 100))]] * 2
    ok = _full_cv_fused_eligible(
        "auto", True, np.logspace(-1, 3, 4), 1e-10, False, False,
        [(tr1, te1), (tr2, te2)], inner, 8,
    )
    assert not ok


def test_fused_chunked_matches_unchunked():
    """voxel_chunk_size streams the fused kernels in chunks (whole-brain
    memory path) — identical results, including the non-divisible tail."""
    X, Y = _problem()  # V=17, chunk 5 -> tail of 2
    m_whole, w_whole, a_whole = fit_nested_cv(X, Y, **KW)
    kw = dict(KW)
    m_chunk, w_chunk, a_chunk = fit_nested_cv(X, Y, voxel_chunk_size=5,
                                              **kw)
    assert np.allclose(m_chunk["correlations"], m_whole["correlations"],
                       atol=1e-5)
    assert np.allclose(a_chunk, a_whole)

    # Metrics-only chunked refit (the whole-brain configuration).
    m_nw, w_nw, _ = fit_nested_cv(X, Y, voxel_chunk_size=5,
                                  return_weights=False, **kw)
    assert w_nw is None
    assert np.allclose(m_nw["correlations"], m_whole["correlations"],
                       atol=1e-5)


def test_fused_chunked_permutation():
    X, Y = _problem()
    kw = dict(KW, significance="permutation", n_permutations=100,
              return_weights=False)
    m_chunk, _, _ = fit_nested_cv(X, Y, voxel_chunk_size=5, **kw)
    m_whole, _, _ = fit_nested_cv(X, Y, **kw)
    assert m_chunk["significance_method"] == "permutation"
    assert np.allclose(m_chunk["p_values"], m_whole["p_values"], atol=1e-9)


@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 virtual devices"
)
def test_fused_full_cv_with_mesh():
    X, Y = _problem()
    m_plain, w_plain, a_plain = fit_nested_cv(X, Y, **KW)
    m_mesh, w_mesh, a_mesh = fit_nested_cv(X, Y, n_devices=8, **KW)
    assert np.allclose(m_mesh["correlations"], m_plain["correlations"],
                       atol=1e-4)
    assert np.allclose(a_mesh, a_plain)
    assert np.allclose(w_mesh, w_plain, atol=1e-4)
