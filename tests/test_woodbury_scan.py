"""Woodbury alpha-scan: exactness vs the per-fold eigh scan, lmax accuracy,
and the method-resolution gates (parallel/step.py + models/ridge.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from litcoder_core_tpu.models.ridge import (
    lmax_downdate,
    score_alpha_grid,
    score_alpha_grid_woodbury,
)
from litcoder_core_tpu.parallel.step import (
    _resolve_scan_method,
    equal_size_folds,
    nested_cv_step,
)

rng = np.random.default_rng(11)

T, TP, D, V, A, F, CH = 400, 80, 48, 60, 10, 5, 10


@pytest.fixture(scope="module")
def problem():
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32) / np.sqrt(D)
    Y = (X @ wt + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    Xt = rng.normal(size=(TP, D)).astype(np.float32)
    Yt = (Xt @ wt + 0.5 * rng.normal(size=(TP, V))).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    tr, va = equal_size_folds(T, F, CH, seed=0)
    return X, Y, Xt, Yt, alphas, tr, va


def test_step_auto_matches_eigh(problem):
    """method='auto' (Woodbury scan) must reproduce the eigh scan: same
    per-voxel alpha selection, hence identical refit weights/correlations."""
    X, Y, Xt, Yt, alphas, tr, va = problem
    r_eigh = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="eigh")
    r_wb = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="auto")
    np.testing.assert_array_equal(np.asarray(r_eigh.best_alphas),
                                  np.asarray(r_wb.best_alphas))
    np.testing.assert_allclose(np.asarray(r_eigh.correlations),
                               np.asarray(r_wb.correlations), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_eigh.weights),
                               np.asarray(r_wb.weights), atol=1e-6)


def test_scan_scores_match_elementwise(problem):
    """The per-(fold, alpha) score CURVES (not just the argmax) agree with
    the eigh formulation to float32 roundoff, for corr and signed-R^2."""
    X, Y, _, _, alphas, tr, va = problem
    union = np.sort(va.ravel())
    Xu = X[union]
    G_u = Xu.T @ Xu
    lam, Q = np.linalg.eigh(G_u)
    XtY_u = Xu.T @ Y[union]

    for use_corr in (True, False):
        for f in range(F):
            Xva, Yva = X[va[f]], Y[va[f]]
            G_tr = G_u - Xva.T @ Xva
            XtY_tr = XtY_u - Xva.T @ Yva
            evals, evecs = np.linalg.eigh(G_tr)
            S = np.sqrt(np.maximum(evals[::-1], 0.0))
            Vh = evecs[:, ::-1].T
            good = S > 1e-10
            PVh = Xva @ Vh.T
            inv_s = np.where(good, 1.0 / np.where(good, S, 1.0), 0.0)
            UR = inv_s[:, None] * (Vh @ XtY_tr)
            nal = (alphas * S[0]).astype(np.float32)

            ref = np.asarray(score_alpha_grid(
                jnp.asarray(S, jnp.float32), jnp.asarray(good),
                jnp.asarray(PVh, jnp.float32), jnp.asarray(UR, jnp.float32),
                jnp.asarray(Yva), jnp.asarray(nal), use_corr=use_corr,
            ))
            got = np.asarray(score_alpha_grid_woodbury(
                jnp.asarray(lam, jnp.float32),
                jnp.asarray(Xva @ Q, jnp.float32),
                jnp.asarray(Q.T @ XtY_tr, jnp.float32),
                jnp.asarray(Yva), jnp.asarray(nal), use_corr=use_corr,
            ))
            np.testing.assert_allclose(got, ref, atol=5e-4), (f, use_corr)


def test_lmax_downdate_accuracy(problem):
    """Warm-started Lanczos lambda-max of each fold's downdated Gram is
    accurate to ~f32 precision (normalpha scale parity)."""
    X, _, _, _, _, _, va = problem
    union = np.sort(va.ravel())
    Xu = X[union]
    G_u = Xu.T @ Xu
    lam, Q = np.linalg.eigh(G_u)
    for f in range(F):
        Xva = X[va[f]]
        true = np.linalg.eigvalsh(G_u - Xva.T @ Xva)[-1]
        est = float(lmax_downdate(jnp.asarray(lam, jnp.float32),
                                  jnp.asarray(Xva @ Q, jnp.float32)))
        assert abs(est - true) / true < 1e-5, (f, est, true)


def test_lmax_downdate_degenerate_spectrum():
    """Clustered top eigenvalues (the power-iteration worst case) still
    resolve: any Ritz value inside the top cluster is within cluster width."""
    d = 64
    lam = np.ones(d, np.float32) * 100.0
    lam[: d // 2] = 1.0  # half the spectrum at 100 (degenerate top)
    P = (rng.normal(size=(8, d)) * 0.1).astype(np.float32)
    true = np.linalg.eigvalsh(np.diag(lam) - P.T @ P)[-1]
    est = float(lmax_downdate(jnp.asarray(lam), jnp.asarray(P)))
    assert abs(est - true) / true < 1e-4


def test_resolve_scan_method_gates():
    a = np.logspace(-1, 8, 10).astype(np.float32)
    assert _resolve_scan_method("auto", True, a, True) == "woodbury"
    # not complementary folds -> always eigh
    assert _resolve_scan_method("auto", False, a, True) == "eigh"
    # normalpha off: alpha scale unknown relative to the spectrum -> eigh
    assert _resolve_scan_method("auto", True, a, False) == "eigh"
    # zero / tiny alphas make I - K ill-conditioned (kappa ~ 1/a^2) -> eigh
    assert _resolve_scan_method("auto", True, np.array([0.0, 1.0]),
                                True) == "eigh"
    assert _resolve_scan_method("auto", True, np.array([1e-2, 1.0]),
                                True) == "eigh"
    # explicit overrides
    assert _resolve_scan_method("eigh", True, a, True) == "eigh"
    assert _resolve_scan_method("woodbury", True, a, True) == "woodbury"


def test_step_auto_single_alpha_and_rsq(problem):
    """Woodbury engages for single_alpha and use_corr=False too."""
    X, Y, Xt, Yt, alphas, tr, va = problem
    for kw in ({"single_alpha": True}, {"use_corr": False}):
        r_eigh = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va,
                                method="eigh", **kw)
        r_wb = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va,
                              method="auto", **kw)
        np.testing.assert_array_equal(np.asarray(r_eigh.best_alphas),
                                      np.asarray(r_wb.best_alphas))
        np.testing.assert_allclose(np.asarray(r_eigh.correlations),
                                   np.asarray(r_wb.correlations), atol=1e-6)
