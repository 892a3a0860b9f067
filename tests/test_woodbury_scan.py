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


def test_step_chol_scan_matches_eigh(problem):
    """The fused step's 'chol' scan (per-(fold, alpha) Cholesky of the
    downdated Gram; no eigensolve anywhere in the scan) must reproduce the
    eigh scan: identical alpha selection, matching correlations/weights —
    and fast_scan must not change selection on CPU (fp32 either way)."""
    X, Y, Xt, Yt, alphas, tr, va = problem
    r_eigh = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="eigh")
    r_chol = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="chol")
    np.testing.assert_array_equal(np.asarray(r_eigh.best_alphas),
                                  np.asarray(r_chol.best_alphas))
    np.testing.assert_allclose(np.asarray(r_eigh.correlations),
                               np.asarray(r_chol.correlations), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_eigh.weights),
                               np.asarray(r_chol.weights), atol=1e-6)
    r_fast = nested_cv_step(X, Y, Xt, Yt, alphas, tr, va, method="chol",
                            fast_scan=True)
    np.testing.assert_array_equal(np.asarray(r_fast.best_alphas),
                                  np.asarray(r_chol.best_alphas))


def test_step_chol_raises_on_noncomplement_folds(problem):
    """Forced 'chol' must not silently degrade to the spectral scan (same
    contract as forced 'woodbury')."""
    X, Y, Xt, Yt, alphas, tr, va = problem
    with pytest.raises(ValueError, match="chol"):
        nested_cv_step(X, Y, Xt, Yt, alphas, tr[:, : tr.shape[1] // 2], va,
                       method="chol")


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
    # non-negligible singcutoff masks spectra in the eigh scan -> eigh
    assert _resolve_scan_method("auto", True, a, True,
                                singcutoff=1e-3) == "eigh"
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


# ------------------------- fold-streaming Cholesky search (models.nested_cv)


def test_chol_search_matches_eigh_unequal_folds():
    """The Cholesky fold-streaming search must reproduce the eigh search
    for ARBITRARY fold shapes (the whole-brain northstar case: chunked
    folds with a remainder-absorbing last fold)."""
    from litcoder_core_tpu.models.folding import create_folds
    from litcoder_core_tpu.models.nested_cv import (
        _chol_search_eligible,
        _find_best_alphas,
    )

    r = np.random.default_rng(5)
    t, d, v = 430, 32, 50
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = (X @ r.normal(size=(d, v)).astype(np.float32) / np.sqrt(d)
         + 0.5 * r.normal(size=(t, v))).astype(np.float32)
    folds = create_folds(n_samples=t, fold_type="chunked", n_folds=5,
                         chunk_length=10, seed=0)
    shapes = {(len(tr), len(va)) for tr, va in folds}
    assert len(shapes) > 1  # genuinely unequal folds
    alphas = np.logspace(-1, 8, 10)
    assert _chol_search_eligible("auto", True, alphas, folds, d)

    best_chol = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                                  1e-10, None, method="auto")
    best_eigh = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                                  1e-10, None, method="eigh")
    np.testing.assert_array_equal(best_chol, best_eigh)


def test_chol_search_voxel_chunking_invariance():
    from litcoder_core_tpu.models.nested_cv import _find_best_alphas
    from litcoder_core_tpu.models.folding import create_folds

    r = np.random.default_rng(6)
    t, d, v = 200, 16, 37
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = (X @ r.normal(size=(d, v)).astype(np.float32)
         + r.normal(size=(t, v))).astype(np.float32)
    folds = create_folds(n_samples=t, fold_type="chunked", n_folds=4,
                         chunk_length=10, seed=1)
    alphas = np.logspace(-1, 6, 8)
    whole = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                              1e-10, None, method="chol")
    chunked = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                                1e-10, 16, method="chol")
    np.testing.assert_array_equal(whole, chunked)


def test_chol_eligibility_gates():
    from litcoder_core_tpu.models.nested_cv import _chol_search_eligible

    folds = [(np.arange(100), np.arange(100, 120))]
    a = np.logspace(-1, 8, 10)
    assert _chol_search_eligible("auto", True, a, folds, 32)
    assert _chol_search_eligible("chol", False, np.array([0.0]), folds, 32)
    # short-fat folds: Gram path too costly -> spectral search instead
    assert not _chol_search_eligible("auto", True, a, folds, 512)
    assert not _chol_search_eligible("auto", False, a, folds, 32)
    assert not _chol_search_eligible("auto", True, np.array([1e-3, 1.0]),
                                     folds, 32)
    assert not _chol_search_eligible("eigh", True, a, folds, 32)
    # non-default singcutoff changes eigh-scan masking -> not eligible
    assert not _chol_search_eligible("auto", True, a, folds, 32,
                                     singcutoff=1e-4)


def test_lmax_dense_accuracy():
    from litcoder_core_tpu.models.ridge import lmax_dense

    r = np.random.default_rng(7)
    # realistic decaying spectrum AND a flat (clustered) one
    for spec in (np.logspace(3, -2, 64), np.full(64, 50.0)):
        Qm, _ = np.linalg.qr(r.normal(size=(64, 64)))
        G = (Qm * spec) @ Qm.T
        G = ((G + G.T) / 2).astype(np.float32)
        true = np.linalg.eigvalsh(G)[-1]
        est = float(lmax_dense(jnp.asarray(G)))
        assert abs(est - true) / abs(true) < 1e-4, (spec[0], est, true)


def test_nested_cv_model_train_test_uses_chol_and_matches():
    """NestedCVModel default (method='auto') routes the inner search through
    the Cholesky path and matches method='eigh' end-to-end."""
    from litcoder_core_tpu.models.nested_cv import NestedCVModel

    r = np.random.default_rng(8)
    t, tp, d, v = 300, 60, 24, 40
    X = r.normal(size=(t, d)).astype(np.float32)
    wt = r.normal(size=(d, v)).astype(np.float32)
    Y = (X @ wt + 2 * r.normal(size=(t, v))).astype(np.float32)
    Xt = r.normal(size=(tp, d)).astype(np.float32)
    Yt = (Xt @ wt + 2 * r.normal(size=(tp, v))).astype(np.float32)

    m_auto, w_auto, a_auto = NestedCVModel(seed=0).fit_predict(
        X, Y, X_test=Xt, y_test=Yt, chunk_length=10)
    m_eigh, w_eigh, a_eigh = NestedCVModel(seed=0).fit_predict(
        X, Y, X_test=Xt, y_test=Yt, chunk_length=10, method="eigh")
    np.testing.assert_array_equal(a_auto, a_eigh)
    np.testing.assert_allclose(m_auto["correlations"], m_eigh["correlations"],
                               atol=1e-6)


def test_chol_complement_variant_matches_gather_form():
    """When folds cover all rows, the complement (gather-free) scorer must
    equal the gather form exactly; forcing the gather form on the same
    folds is the cross-check."""
    from litcoder_core_tpu.models.folding import create_folds
    from litcoder_core_tpu.models.nested_cv import (
        _folds_cover_all_rows,
        _find_best_alphas,
    )
    import litcoder_core_tpu.models.nested_cv as ncv

    r = np.random.default_rng(9)
    t, d, v = 400, 32, 45
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = (X @ r.normal(size=(d, v)).astype(np.float32)
         + r.normal(size=(t, v))).astype(np.float32)
    folds = create_folds(n_samples=t, fold_type="chunked", n_folds=5,
                         chunk_length=10, seed=0)
    assert _folds_cover_all_rows(folds, t)
    alphas = np.logspace(-1, 8, 10)
    a_complement = _find_best_alphas(X, Y, folds, alphas, False, True,
                                     True, 1e-10, 16, method="chol")

    # Force the gather form by monkeypatching the coverage check.
    orig = ncv._folds_cover_all_rows
    ncv._folds_cover_all_rows = lambda *a: False
    try:
        a_gather = _find_best_alphas(X, Y, folds, alphas, False, True,
                                     True, 1e-10, 16, method="chol")
    finally:
        ncv._folds_cover_all_rows = orig
    np.testing.assert_array_equal(a_complement, a_gather)


def test_folds_cover_all_rows_detection():
    from litcoder_core_tpu.models.nested_cv import _folds_cover_all_rows

    full = [(np.arange(10, 50), np.arange(0, 10))]
    assert _folds_cover_all_rows(full, 50)
    # trimmed folds leave gaps -> gather form
    gap = [(np.arange(12, 50), np.arange(0, 10))]
    assert not _folds_cover_all_rows(gap, 50)


def test_banded_gamma_scores_chol_matches_eigh():
    """Banded fast path: the Cholesky (gamma, alpha) scan must match the
    per-(gamma, fold) eigensolve scan and select the same bands."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    r = np.random.default_rng(12)
    t, tp, v = 300, 60, 30
    X1 = r.normal(size=(t, 12)).astype(np.float32)
    X2 = r.normal(size=(t, 8)).astype(np.float32)
    w1 = r.normal(size=(12, v)).astype(np.float32)
    Y = (X1 @ w1 + 0.5 * r.normal(size=(t, v))).astype(np.float32)
    Xt1 = r.normal(size=(tp, 12)).astype(np.float32)
    Xt2 = r.normal(size=(tp, 8)).astype(np.float32)
    Yt = (Xt1 @ w1 + 0.5 * r.normal(size=(tp, v))).astype(np.float32)

    kw = dict(X_tests=[Xt1, Xt2], y_test=Yt, n_gammas=3,
              chunk_length=10, n_inner_folds=3, seed=0)
    m_chol, w_chol, a_chol, g_chol = fit_banded_ridge(
        [X1, X2], Y, method="auto", **kw)
    m_eigh, w_eigh, a_eigh, g_eigh = fit_banded_ridge(
        [X1, X2], Y, method="eigh", **kw)
    np.testing.assert_array_equal(a_chol, a_eigh)
    np.testing.assert_array_equal(g_chol, g_eigh)
    np.testing.assert_allclose(m_chol["correlations"],
                               m_eigh["correlations"], atol=1e-5)


def test_full_cv_mode_chol_matches_eigh():
    """Full nested-CV mode (outer folds): default 'auto' inner searches run
    eigensolve-free and match method='eigh' end to end."""
    from litcoder_core_tpu.models.nested_cv import fit_nested_cv

    r = np.random.default_rng(13)
    t, d, v = 360, 20, 25
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = (X @ r.normal(size=(d, v)).astype(np.float32)
         + r.normal(size=(t, v))).astype(np.float32)
    kw = dict(n_outer_folds=3, n_inner_folds=3, chunk_length=10, seed=0)
    m_auto, _, a_auto = fit_nested_cv(X, Y, method="auto", **kw)
    m_eigh, _, a_eigh = fit_nested_cv(X, Y, method="eigh", **kw)
    np.testing.assert_allclose(a_auto, a_eigh, rtol=1e-6)
    np.testing.assert_allclose(m_auto["correlations"],
                               m_eigh["correlations"], atol=1e-5)
    assert m_auto["n_significant"] == m_eigh["n_significant"]


def test_chol_fast_scan_selects_same_alphas():
    """fast_scan (default-precision scan + search XtY) is an argmax over
    smooth curves — selection must match full precision on a
    well-conditioned problem."""
    from litcoder_core_tpu.models.folding import create_folds
    from litcoder_core_tpu.models.nested_cv import _find_best_alphas

    r = np.random.default_rng(14)
    t, d, v = 300, 24, 40
    X = r.normal(size=(t, d)).astype(np.float32)
    Y = (X @ r.normal(size=(d, v)).astype(np.float32)
         + 0.5 * r.normal(size=(t, v))).astype(np.float32)
    folds = create_folds(n_samples=t, fold_type="chunked", n_folds=3,
                         chunk_length=10, seed=0)
    alphas = np.logspace(-1, 8, 10)
    slow = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                             1e-10, None, method="chol")
    fast = _find_best_alphas(X, Y, folds, alphas, False, True, True,
                             1e-10, None, method="chol", fast_scan=True)
    assert np.mean(slow == fast) > 0.95  # ties may flip; selection stable


def test_banded_chol_refit_matches_spectral_weights():
    """The (gamma, alpha)-grouped Cholesky refit (auto path, eligible
    grids) must reproduce the spectral per-gamma-group refit's weights:
    (Gg + a^2 I)^-1 X^T y == V diag(S/(S^2+a^2)) S^-1 V^T X^T y for
    alpha > 0 with no spectral truncation in play."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    r = np.random.default_rng(21)
    t, tp, v = 320, 60, 41
    X1 = r.normal(size=(t, 14)).astype(np.float32)
    X2 = r.normal(size=(t, 6)).astype(np.float32)
    w1 = r.normal(size=(14, v)).astype(np.float32)
    Y = (X1 @ w1 + 0.6 * r.normal(size=(t, v))).astype(np.float32)
    Xt1 = r.normal(size=(tp, 14)).astype(np.float32)
    Xt2 = r.normal(size=(tp, 6)).astype(np.float32)
    Yt = (Xt1 @ w1 + 0.6 * r.normal(size=(tp, v))).astype(np.float32)

    kw = dict(X_tests=[Xt1, Xt2], y_test=Yt, n_gammas=4,
              chunk_length=10, n_inner_folds=4, seed=0)
    m_a, w_a, a_a, g_a = fit_banded_ridge([X1, X2], Y, method="auto", **kw)
    m_e, w_e, a_e, g_e = fit_banded_ridge([X1, X2], Y, method="eigh", **kw)
    np.testing.assert_array_equal(a_a, a_e)
    np.testing.assert_array_equal(g_a, g_e)
    scale = max(np.abs(w_e).max(), 1e-6)
    assert np.abs(w_a - w_e).max() / scale < 1e-4
    np.testing.assert_allclose(m_a["correlations"], m_e["correlations"],
                               atol=1e-5)


def test_lmax_dense_rank_deficient_gram():
    """f32 Lanczos breakdown regression: Grams of FIR-duplicated features
    are rank-deficient; once the Krylov space is exhausted the residual
    floors at ~eps_f32 * ||G||, and the old 1e-12 aliveness cutoff kept
    normalizing cancellation noise until the recurrence went NaN. The
    estimate must stay finite and accurate."""
    from litcoder_core_tpu.models.ridge import lmax_dense

    r = np.random.default_rng(5)
    base = r.normal(size=(140, 33)).astype(np.float32)
    X = np.concatenate([base, base], axis=1)  # rank 33 of D=66
    G = jnp.asarray(X.T @ X)
    true = float(np.linalg.eigvalsh(np.asarray(G, np.float64)).max())
    est = float(lmax_dense(G))
    assert np.isfinite(est)
    np.testing.assert_allclose(est, true, rtol=1e-5)
