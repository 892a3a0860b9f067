"""Ridge core tests: golden vs numpy-SVD reference formulas + properties."""

import numpy as np

from litcoder_core_tpu.models.ridge import (
    ridge_corr,
    ridge_corr_pred,
    ridge_fit,
)

rng = np.random.default_rng(3)


# ---- numpy oracle reproducing the reference math ---------------------------

def _zs_np(x):
    return (x - x.mean(0)) / (x.std(0, ddof=1) + 1e-8)


def _ridge_np(Rstim, Rresp, alphas, singcutoff=1e-30, normalpha=False):
    U, S, Vh = np.linalg.svd(Rstim, full_matrices=False)
    ngood = np.sum(S > singcutoff)
    U, S, Vh = U[:, :ngood], S[:ngood], Vh[:ngood]
    UR = U.T @ Rresp
    if np.isscalar(alphas):
        alphas = np.full(Rresp.shape[1], alphas)
    nalphas = alphas * S[0] if normalpha else alphas
    wt = np.zeros((Rstim.shape[1], Rresp.shape[1]))
    for ua in np.unique(nalphas):
        sel = nalphas == ua
        D = S / (S**2 + ua**2)
        wt[:, sel] = (Vh.T @ np.diag(D)) @ UR[:, sel]
    return wt


def _ridge_corr_np(Rstim, Pstim, Rresp, Presp, alphas, singcutoff=1e-30,
                   use_corr=True, normalpha=False):
    U, S, Vh = np.linalg.svd(Rstim, full_matrices=False)
    ngood = np.sum(S > singcutoff)
    U, S, Vh = U[:, :ngood], S[:ngood], Vh[:ngood]
    nalphas = [a * S[0] for a in alphas] if normalpha else alphas
    UR = U.T @ Rresp
    PVh = Pstim @ Vh.T
    zPresp = _zs_np(Presp)
    Prespvar = Presp.var(0, ddof=1)
    out = []
    for na in nalphas:
        D = S / (S**2 + na**2)
        pred = (PVh * D[None, :]) @ UR
        if use_corr:
            rc = (zPresp * _zs_np(pred)).mean(0)
        else:
            rsq = 1 - (Presp - pred).var(0, ddof=1) / Prespvar
            rc = np.sqrt(np.abs(rsq)) * np.sign(rsq)
        out.append(np.nan_to_num(rc))
    return np.stack(out)


def _data(T=120, Tp=40, D=9, V=15):
    Rstim = rng.normal(size=(T, D)).astype(np.float32)
    wt_true = rng.normal(size=(D, V)).astype(np.float32)
    Rresp = (Rstim @ wt_true + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    Pstim = rng.normal(size=(Tp, D)).astype(np.float32)
    Presp = (Pstim @ wt_true + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)
    return Rstim, Rresp, Pstim, Presp


def test_ridge_fit_matches_reference_scalar_alpha():
    Rstim, Rresp, _, _ = _data()
    for alpha in (0.1, 10.0, 1e4):
        ours = np.asarray(ridge_fit(Rstim, Rresp, alpha))
        ref = _ridge_np(Rstim, Rresp, alpha)
        assert np.allclose(ours, ref, atol=1e-3), alpha


def test_ridge_fit_matches_reference_per_voxel_alphas():
    Rstim, Rresp, _, _ = _data()
    valphas = rng.choice([0.1, 1.0, 100.0], size=Rresp.shape[1]).astype(
        np.float32
    )
    ours = np.asarray(ridge_fit(Rstim, Rresp, valphas, normalpha=True))
    ref = _ridge_np(Rstim, Rresp, valphas, normalpha=True)
    assert np.allclose(ours, ref, atol=1e-3)


def test_ridge_corr_matches_reference():
    Rstim, Rresp, Pstim, Presp = _data()
    alphas = np.logspace(-1, 4, 6).astype(np.float32)
    for use_corr in (True, False):
        for normalpha in (False, True):
            ours = np.asarray(ridge_corr(
                Rstim, Pstim, Rresp, Presp, alphas, use_corr=use_corr,
                normalpha=normalpha,
            ))
            ref = _ridge_corr_np(
                Rstim, Pstim, Rresp, Presp, alphas, use_corr=use_corr,
                normalpha=normalpha,
            )
            assert np.allclose(ours, ref, atol=2e-3), (use_corr, normalpha)


def test_ridge_corr_pred_matches_gridpoint():
    """Per-voxel-alpha scoring at a constant alpha equals the grid row."""
    Rstim, Rresp, Pstim, Presp = _data()
    alpha = 10.0
    grid = np.asarray(ridge_corr(
        Rstim, Pstim, Rresp, Presp, np.array([alpha]), normalpha=True
    ))
    pred = np.asarray(ridge_corr_pred(
        Rstim, Pstim, Rresp, Presp,
        np.full(Rresp.shape[1], alpha, np.float32), normalpha=True,
    ))
    assert np.allclose(grid[0], pred, atol=1e-4)


def test_ridge_alpha_zero_approaches_lstsq():
    """Property: alpha -> 0 recovers the least-squares solution."""
    Rstim, Rresp, _, _ = _data(T=200, D=6, V=4)
    ours = np.asarray(ridge_fit(Rstim, Rresp, 1e-6))
    lstsq = np.linalg.lstsq(Rstim, Rresp, rcond=None)[0]
    assert np.allclose(ours, lstsq, atol=1e-3)


def test_self_prediction_correlation_is_maximal():
    """Property: noiseless targets + tiny alpha -> r at the formula maximum.

    The reference's ridge_corr (ridge_regression.py:124-125) averages products
    of ddof=1 z-scores over n samples, so a PERFECT prediction scores
    (n-1)/n, not 1.0 — we reproduce that contract exactly.
    """
    Rstim, _, Pstim, _ = _data()
    n = Pstim.shape[0]
    wt_true = rng.normal(size=(Rstim.shape[1], 5)).astype(np.float32)
    Rresp = (Rstim @ wt_true).astype(np.float32)
    Presp = (Pstim @ wt_true).astype(np.float32)
    corrs = np.asarray(ridge_corr(
        Rstim, Pstim, Rresp, Presp, np.array([1e-5], np.float32)
    ))
    assert np.allclose(corrs, (n - 1) / n, atol=1e-3)


def test_singcutoff_masks_tiny_components():
    """A rank-deficient design must not blow up."""
    base = rng.normal(size=(80, 4)).astype(np.float32)
    Rstim = np.hstack([base, base[:, :2]])  # exact collinearity
    Rresp = rng.normal(size=(80, 3)).astype(np.float32)
    wt = np.asarray(ridge_fit(Rstim, Rresp, 1.0, singcutoff=1e-6))
    assert np.isfinite(wt).all()
