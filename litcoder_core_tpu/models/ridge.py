"""Batched SVD ridge regression — the compute core, TPU-first.

Re-designs reference encoding/models/ridge_regression.py (a torch port of the
HuthLab ridge) as pure jitted JAX programs:

- `ridge_svd`: the spectral stage. Two methods:
    * 'svd' — economy SVD of (T, D), singular values MASKED (zeroed) below
      `singcutoff` instead of truncated (ridge_utils.py:34-67 truncates, which
      gives dynamic shapes; masking is numerically identical because the ridge
      diagonal D = S/(S^2+a^2) vanishes for masked components, and keeps every
      shape static for XLA).
    * 'eigh' — eigendecompose the (D, D) Gram matrix X^T X instead: one MXU
      matmul + a small symmetric eigensolve, S = sqrt(eigvals),
      V = eigvecs, and U is NEVER materialized — U^T Y is computed as
      S^-1 V^T (X^T Y), again a pure matmul. For tall designs (T >> D, the
      encoding-model regime: ~27k TRs x ~3k FIR features) this replaces an
      O(T D^2) iterative SVD with MXU-saturating matmuls.
    * 'dual' — the mirror image for WIDE designs (D > T: all-layer
      concatenations, large-model features on short training sets):
      eigendecompose the (T, T) kernel matrix X X^T, U = eigvecs,
      S = sqrt(eigvals), Vh = S^-1 U^T X. Replaces the O(T^2 D) iterative
      wide SVD with one MXU matmul + a small symmetric eigensolve, exactly
      like 'eigh' but factoring whichever side is smaller. The reference's
      torch SVD (ridge_utils.py:34-67) covers wide shapes implicitly; this
      is its TPU-native small-side formulation.
    * 'auto' — eigh when T >= D, else dual.
- `ridge_corr`: the reference loops over the alpha grid in Python rebuilding
  diag-matmuls per alpha (ridge_regression.py:115-134); here the whole grid is
  one lax.map over a closed-over spectral state, each step a single fused
  matmul-plus-correlation. No SVD recomputation, no host sync.
- `ridge_fit`: the reference groups voxels by unique alpha in a Python loop
  with boolean gathers (ridge_regression.py:49-62); here the per-voxel ridge
  diagonal is a dense (k, V) broadcast and the solve is ONE (D_feat x k) @
  (k x V) MXU matmul — no data-dependent control flow at all.
- `ridge_corr_pred`: same dense formulation for per-voxel-alpha scoring
  (ridge_regression.py:144-216).

The spectral stage is factored out so the nested-CV driver computes it once
per fold and streams voxel chunks through the scoring stage — the feature
matrix and its factorization are tiny next to (T x 95k) response matrices.

All matmuls run at Precision.HIGHEST so float32 parity with the torch
reference holds on TPU (bf16 MXU passes would break the 1e-3 tolerance).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from litcoder_core_tpu.ops.stats import zscore

_HIGHEST = jax.lax.Precision.HIGHEST


class RidgeSVD(NamedTuple):
    """Spectral state shared by every voxel chunk of one fold."""

    U: Optional[jax.Array]    # (T, k) left vectors, or None (eigh path)
    S: jax.Array              # (k,) singular values
    Vh: jax.Array             # (k, D) right vectors
    good: jax.Array           # (k,) bool mask: S > singcutoff
    PVh: Optional[jax.Array]  # (Tp, k) validation stimuli in singular basis
    X: Optional[jax.Array]    # (T, D) training stimuli (for U-free products)


def svd_masked(X, singcutoff: float = 1e-10):
    """Economy SVD of (T, D) with tiny singular values masked to zero.

    Returns (U, S, Vh, good) where good = S > singcutoff; downstream math
    multiplies by `good` so masked components contribute exactly nothing,
    matching the reference's truncation (ridge_utils.py:44-47) with static
    shapes.
    """
    X = jnp.asarray(X, jnp.float32)
    U, S, Vh = jnp.linalg.svd(X, full_matrices=False)
    good = S > singcutoff
    return U, S, Vh, good


@partial(jax.jit, static_argnames=("singcutoff", "method"))
def ridge_svd(Rstim, Pstim=None, singcutoff: float = 1e-10,
              method: str = "auto") -> RidgeSVD:
    """Spectral stage: factor training stimuli, project validation stimuli."""
    Rstim = jnp.asarray(Rstim, jnp.float32)
    T, D = Rstim.shape
    if method == "auto":
        method = "eigh" if T >= D else "dual"

    if method == "dual":
        # Small-side factorization for wide designs: eig(X X^T) = U S^2 U^T
        # where X = U S Vh, so Vh = S^-1 U^T X. Nonzero spectrum identical
        # to the Gram path; masked (S <= singcutoff) rows of Vh are zeroed
        # so downstream products match the svd path's masking exactly.
        K = jnp.dot(Rstim, Rstim.T, precision=_HIGHEST)  # (T, T)
        evals, evecs = jnp.linalg.eigh(K)  # ascending
        S = jnp.sqrt(jnp.maximum(jnp.flip(evals), 0.0))
        U = jnp.flip(evecs, axis=1)
        good = S > singcutoff
        inv_s = jnp.where(good, 1.0 / jnp.where(good, S, 1.0), 0.0)
        Vh = inv_s[:, None] * jnp.dot(U.T, Rstim, precision=_HIGHEST)
        keepX = None
    elif method == "eigh":
        gram = jnp.dot(Rstim.T, Rstim, precision=_HIGHEST)  # (D, D)
        evals, evecs = jnp.linalg.eigh(gram)  # ascending
        evals = jnp.flip(evals)
        evecs = jnp.flip(evecs, axis=1)
        S = jnp.sqrt(jnp.maximum(evals, 0.0))
        Vh = evecs.T
        good = S > singcutoff
        U = None
        keepX = Rstim
    else:
        U, S, Vh, good = svd_masked(Rstim, singcutoff)
        keepX = None

    PVh = None
    if Pstim is not None:
        PVh = jnp.dot(jnp.asarray(Pstim, jnp.float32), Vh.T,
                      precision=_HIGHEST)
    return RidgeSVD(U, S, Vh, good, PVh, keepX)


def _ur_product(svd: RidgeSVD, Rresp):
    """UR = U^T Y: direct on the svd path; S^-1 V^T (X^T Y) on the eigh path
    (U never materialized)."""
    Rresp = jnp.asarray(Rresp, jnp.float32)
    if svd.U is not None:
        return jnp.dot(svd.U.T, Rresp, precision=_HIGHEST)
    XtY = jnp.dot(svd.X.T, Rresp, precision=_HIGHEST)     # (D, V)
    VtXtY = jnp.dot(svd.Vh, XtY, precision=_HIGHEST)       # (k, V)
    inv_s = jnp.where(svd.good, 1.0 / jnp.where(svd.good, svd.S, 1.0), 0.0)
    return inv_s[:, None] * VtXtY


def _normalize_alphas(alphas, svd: RidgeSVD, normalpha: bool):
    alphas = jnp.asarray(alphas, jnp.float32)
    return alphas * svd.S[0] if normalpha else alphas


def _shrinkage_per_voxel(svd: RidgeSVD, nalphas):
    """(k, V) ridge diagonal for per-voxel alphas."""
    return jnp.where(
        svd.good[:, None],
        svd.S[:, None] / (svd.S[:, None] ** 2 + nalphas[None, :] ** 2),
        0.0,
    )


@partial(jax.jit, static_argnames=("use_corr",))
def ridge_corr_from_svd(svd: RidgeSVD, Rresp, Presp, nalphas,
                        use_corr: bool = True):
    """Score an (A,) pre-normalized alpha grid for one voxel chunk.

    Args:
        svd: RidgeSVD of the fold's training stimuli (PVh required).
        Rresp: (Tr, Vc) training responses for this voxel chunk.
        Presp: (Tp, Vc) validation responses for this voxel chunk.

    Returns:
        (A, Vc) correlations (NaN -> 0), matching ridge_corr_torch
        (encoding/models/ridge_regression.py:104-141).
    """
    UR = _ur_product(svd, Rresp)  # (k, Vc)
    return score_alpha_grid(svd.S, svd.good, svd.PVh, UR, Presp, nalphas,
                            use_corr=use_corr)


def score_alpha_grid(S, good, PVh, UR, Presp, nalphas,
                     use_corr: bool = True, fast_scan: bool = False):
    """(A, Vc) alpha-grid scores from spectral products — the shared scoring
    core: pred_a = (PVh * D_a) @ UR, correlation (or signed R^2) against
    Presp, NaN -> 0 (ridge_regression.py:104-141 semantics). lax.map keeps
    peak memory at one (Tp, Vc) prediction; all A steps stay on device with
    the spectral products resident in HBM.

    fast_scan=True runs the prediction matmuls at default MXU precision
    (bf16 passes, fp32 accumulate): ~2-4x faster scans. Alpha SELECTION is
    an argmax over smooth score curves, so it tolerates this; the final
    refit stays full precision. Opt-in — off by default for reference
    parity."""
    Presp = jnp.asarray(Presp, jnp.float32)
    zPresp = zscore(Presp, axis=0)
    Prespvar = jnp.var(Presp, axis=0, ddof=1)
    scan_precision = jax.lax.Precision.DEFAULT if fast_scan else _HIGHEST

    def score_one_alpha(na):
        D = jnp.where(good, S / (S**2 + na**2), 0.0)
        pred = jnp.dot(PVh * D[None, :], UR, precision=scan_precision)
        return _score_predictions(pred, Presp, zPresp, Prespvar, use_corr)

    return jax.lax.map(score_one_alpha, jnp.asarray(nalphas, jnp.float32))


def _score_predictions(pred, Presp, zPresp, Prespvar, use_corr: bool):
    """Correlation (or signed R^2) of one alpha's predictions, NaN -> 0
    (ridge_regression.py:104-141 semantics). Shared by every scan variant."""
    if use_corr:
        rcorr = jnp.mean(zPresp * zscore(pred, axis=0), axis=0)
    else:
        resvar = jnp.var(Presp - pred, axis=0, ddof=1)
        rsq = 1.0 - resvar / Prespvar
        rcorr = jnp.sqrt(jnp.abs(rsq)) * jnp.sign(rsq)
    return jnp.nan_to_num(rcorr, nan=0.0, posinf=0.0, neginf=0.0)


def score_alpha_grid_woodbury(lam_u, P, UR0, Presp, nalphas,
                              use_corr: bool = True,
                              fast_scan: bool = False,
                              alpha_batch: int | None = None):
    """(A, Vc) alpha-grid scores WITHOUT a per-fold eigensolve.

    Works in the eigenbasis of the fold-scheme UNION Gram G_u = Q L Q^T
    (one eigh shared by every fold) instead of each fold's own training
    Gram. With B_a = G_u + a^2 I (diagonal in that basis) the Woodbury
    downdate for the fold's training Gram G_tr = G_u - Xva^T Xva gives

        pred_a = Xva (G_tr + a^2 I)^-1 XtY_tr
               = (I - K_a)^-1  P diag(1/(L+a^2)) UR0,

    where P = Xva Q, UR0 = Q^T XtY_tr and K_a = P diag(1/(L+a^2)) P^T.
    This is ALGEBRAICALLY IDENTICAL to the per-fold eigh path (including
    rank-deficient G_tr: XtY_tr lies in range(G_tr), so null components
    vanish either way) but replaces each fold's O(10 D^3) eigensolve — the
    dominant wall-clock cost of the fused step on TPU, where eigh runs far
    off the MXU roofline — with a (Tva, Tva) Cholesky per (fold, alpha),
    whose factor I - K_a is positive definite for every a > 0 because
    B_a > Xva^T Xva. Requires strictly positive (normalized) alphas; the
    caller gates on that (parallel/step.py picks this path only when the
    concrete alpha grid is safely positive).

    Args:
        lam_u: (D,) union-Gram eigenvalues (ascending or any order;
            clamped at 0 against eigh roundoff).
        P: (Tva, D) validation stimuli rotated into the union eigenbasis.
        UR0: (D, Vc) Q^T (X_tr^T Y_tr).
        Presp: (Tva, Vc) validation responses.
        nalphas: (A,) normalized per-fold alphas.
        alpha_batch: how many alphas to factor/solve/score TOGETHER.
            Per-alpha lax.map steps leave the MXU idle between ten small
            sequential Choleskys/solves; batching turns them into one
            batched factorization and ONE (Ab*Tva, D) @ (D, Vc) prediction
            matmul per chunk (~2x faster scans at bench shapes). The
            caller budgets Ab against the (Ab, Tva, Vc) prediction buffer
            (parallel/step.py); None keeps the memory-minimal one-alpha-
            at-a-time behavior.
    """
    Presp = jnp.asarray(Presp, jnp.float32)
    zPresp = zscore(Presp, axis=0)
    Prespvar = jnp.var(Presp, axis=0, ddof=1)
    scan_precision = jax.lax.Precision.DEFAULT if fast_scan else _HIGHEST
    lam = jnp.maximum(jnp.asarray(lam_u, jnp.float32), 0.0)
    t_va, d_dim = P.shape
    eye = jnp.eye(t_va, dtype=jnp.float32)
    nalphas = jnp.asarray(nalphas, jnp.float32)
    a_n = int(nalphas.shape[0])
    ab = 1 if alpha_batch is None else max(1, min(int(alpha_batch), a_n))

    def score_batch(nal_b):
        """(Ab,) alphas -> (Ab, Vc) scores, all Ab factored/solved/scored
        as one batched program."""
        d = 1.0 / (lam[None, :] + (nal_b * nal_b)[:, None])  # (Ab, D)
        Pt = P[None, :, :] * d[:, None, :]                   # (Ab, Tva, D)
        K = jnp.matmul(Pt, P.T[None, :, :], precision=_HIGHEST)
        L = jnp.linalg.cholesky(eye[None, :, :] - K)         # batched chol
        Z = jax.scipy.linalg.solve_triangular(L, Pt, lower=True)
        M = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), Z, lower=False)         # (Ab, Tva, D)
        pred = jnp.dot(M.reshape(-1, d_dim), UR0,
                       precision=scan_precision)             # (Ab*Tva, Vc)
        pred = pred.reshape(-1, t_va, pred.shape[-1])
        return jax.vmap(
            lambda p: _score_predictions(p, Presp, zPresp, Prespvar,
                                         use_corr)
        )(pred)

    if ab == a_n:
        return score_batch(nalphas)
    if ab == 1:
        return jax.lax.map(lambda na: score_batch(na[None])[0], nalphas)
    # Chunked: pad the grid to a multiple of Ab with repeats of the last
    # alpha (their scores are sliced off), lax.map over chunks.
    n_chunks = -(-a_n // ab)
    pad = n_chunks * ab - a_n
    nal_p = (jnp.concatenate([nalphas,
                              jnp.broadcast_to(nalphas[-1:], (pad,))])
             if pad else nalphas)
    out = jax.lax.map(score_batch, nal_p.reshape(n_chunks, ab))
    return out.reshape(n_chunks * ab, -1)[:a_n]


def _lanczos_lmax(matvec, v0, m: int):
    """Largest eigenvalue of a symmetric operator via m-step Lanczos with
    full reorthogonalization (f32 Lanczos loses orthogonality fast without
    it). Deterministic: fixed start vector, fixed step count. m is clamped
    to the operator dimension, and Krylov breakdown (the invariant
    subspace is exhausted, beta ~ 0) zeroes the remaining iterations —
    dividing a near-zero residual by its norm would inject junk directions
    whose Ritz values can exceed the true spectrum."""
    m = min(m, v0.shape[0])
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-30)
    basis = jnp.zeros((m, v0.shape[0]), jnp.float32)
    diag = jnp.zeros(m, jnp.float32)
    off = jnp.zeros(m, jnp.float32)

    def body(i, carry):
        basis, diag, off, v, v_prev, b_prev, scale = carry
        w = matvec(v)
        a = jnp.dot(w, v, precision=_HIGHEST)
        w = w - a * v - b_prev * v_prev
        w = w - jnp.dot(basis.T, jnp.dot(basis, w, precision=_HIGHEST),
                        precision=_HIGHEST)
        b = jnp.linalg.norm(w)
        scale = jnp.maximum(scale, jnp.abs(a))
        # f32 breakdown test: after the Krylov space is exhausted (rank-
        # deficient Grams — e.g. FIR-duplicated features), the residual
        # norm floors at ~eps_f32 * ||G|| ~ 1e-7 * scale, far above an
        # f64-style 1e-12 cutoff; normalizing that cancellation noise used
        # to feed junk directions whose recurrence blew up to NaN.
        alive = b > 1e-6 * jnp.maximum(scale, 1.0)
        v_next = jnp.where(alive, w / jnp.maximum(b, 1e-30), 0.0)
        b = jnp.where(alive, b, 0.0)
        # Once dead, stay dead: a dead step writes zero rows, and zeroed
        # diag/off entries cannot re-arm the recurrence.
        return (basis.at[i].set(v), diag.at[i].set(a), off.at[i].set(b),
                v_next, v, b, scale)

    init = (basis, diag, off, v0, jnp.zeros_like(v0),
            jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32))
    _, diag, off, _, _, _, _ = jax.lax.fori_loop(0, m, body, init)
    idx = jnp.arange(m - 1)
    tri = (jnp.diag(diag)
           .at[idx, idx + 1].set(off[:m - 1])
           .at[idx + 1, idx].set(off[:m - 1]))
    return jnp.linalg.eigvalsh(tri)[-1]


def lmax_downdate(lam_u, P, m: int = 24):
    """Largest eigenvalue of diag(lam_u) - P^T P (a fold's training Gram in
    the union eigenbasis) via Lanczos.

    Used for the reference's per-fold `normalpha` scale S[0] = sqrt(lmax)
    (ridge_regression.py:39-43) on the Woodbury path, where no per-fold
    eigendecomposition exists. Warm start: the union Gram's own top
    eigendirection (the basis vector of the largest lam_u) — the downdate
    removes ~1/F of the data, so the top eigenvector barely rotates and
    Rayleigh-Ritz over the Krylov space converges to f32 precision in a
    handful of steps.
    """
    lam = jnp.asarray(lam_u, jnp.float32)

    def matvec(w):
        return lam * w - jnp.dot(
            P.T, jnp.dot(P, w, precision=_HIGHEST), precision=_HIGHEST
        )

    v0 = jnp.zeros(lam.shape[0], jnp.float32).at[jnp.argmax(lam)].set(1.0)
    return _lanczos_lmax(matvec, v0, m)


def lmax_update(lam_u, P, m: int = 24):
    """Largest eigenvalue of diag(lam_u) + P^T P via Lanczos.

    The UPDATE twin of lmax_downdate: with P = X_rem Q holding the few
    training rows OUTSIDE the fold-scheme union rotated into the union
    eigenbasis, diag(lam_u) + P^T P is the FULL training Gram — this gives
    the refit's `normalpha` scale S[0] = sqrt(lmax) without a second
    eigendecomposition (parallel/step.py fused refit). Same warm start as
    the downdate: the union top eigendirection (adding ~2% of the rows
    barely rotates it)."""
    lam = jnp.asarray(lam_u, jnp.float32)

    def matvec(w):
        return lam * w + jnp.dot(
            P.T, jnp.dot(P, w, precision=_HIGHEST), precision=_HIGHEST
        )

    v0 = jnp.zeros(lam.shape[0], jnp.float32).at[jnp.argmax(lam)].set(1.0)
    return _lanczos_lmax(matvec, v0, m)


def lmax_dense(G, m: int = 64):
    """Largest eigenvalue of a dense symmetric PSD matrix via Lanczos.

    Cold start (one power step from the all-ones vector, which is almost
    never orthogonal to the top eigenvector of a Gram matrix); m=64 with
    full reorthogonalization resolves realistic Gram spectra to ~f32
    precision — accuracy is locked against eigh in tests. Replaces a full
    eigendecomposition when only the `normalpha` scale is needed."""
    G = jnp.asarray(G, jnp.float32)

    def matvec(w):
        return jnp.dot(G, w, precision=_HIGHEST)

    v0 = jnp.dot(G, jnp.ones(G.shape[0], jnp.float32), precision=_HIGHEST)
    return _lanczos_lmax(matvec, v0, m)


@jax.jit
def ridge_fit_from_svd(svd: RidgeSVD, Rresp, nalphas):
    """Weights for one voxel chunk given pre-normalized per-voxel alphas."""
    UR = _ur_product(svd, Rresp)
    D = _shrinkage_per_voxel(svd, jnp.asarray(nalphas, jnp.float32))
    return jnp.dot(svd.Vh.T, D * UR, precision=_HIGHEST)  # (D_feat, Vc)


# ---------------------------------------------------------------------------
# Reference-parity wrappers (one-call forms mirroring ridge_regression.py).
# ---------------------------------------------------------------------------


def ridge_fit(Rstim, Rresp, valphas, singcutoff: float = 1e-30,
              normalpha: bool = False, method: str = "svd"):
    """Ridge weights with scalar or per-voxel alphas: (D, V).

    Drop-in for ridge_torch (encoding/models/ridge_regression.py:9-63).
    """
    Rresp = jnp.asarray(Rresp, jnp.float32)
    svd = ridge_svd(Rstim, None, singcutoff=singcutoff, method=method)
    valphas = jnp.atleast_1d(jnp.asarray(valphas, jnp.float32))
    if valphas.shape[0] == 1:
        valphas = jnp.broadcast_to(valphas, (Rresp.shape[1],))
    nalphas = _normalize_alphas(valphas, svd, normalpha)
    return ridge_fit_from_svd(svd, Rresp, nalphas)


def ridge_corr(Rstim, Pstim, Rresp, Presp, alphas, singcutoff: float = 1e-30,
               use_corr: bool = True, normalpha: bool = False,
               method: str = "svd"):
    """(A, V) alpha-grid scores. Drop-in for ridge_corr_torch
    (encoding/models/ridge_regression.py:66-141)."""
    svd = ridge_svd(Rstim, Pstim, singcutoff=singcutoff, method=method)
    nalphas = _normalize_alphas(alphas, svd, normalpha)
    return ridge_corr_from_svd(svd, Rresp, Presp, nalphas, use_corr=use_corr)


def ridge_corr_pred(Rstim, Pstim, Rresp, Presp, valphas,
                    singcutoff: float = 1e-30, use_corr: bool = True,
                    normalpha: bool = True, method: str = "svd"):
    """(V,) held-out scores with per-voxel alphas. Drop-in for
    ridge_corr_pred_torch (encoding/models/ridge_regression.py:144-216)."""
    svd = ridge_svd(Rstim, Pstim, singcutoff=singcutoff, method=method)
    nalphas = _normalize_alphas(
        jnp.asarray(valphas, jnp.float32), svd, normalpha
    )
    return _ridge_corr_pred_from_svd(
        svd, jnp.asarray(Rresp, jnp.float32), jnp.asarray(Presp, jnp.float32),
        nalphas, use_corr,
    )


@partial(jax.jit, static_argnames=("use_corr",))
def _ridge_corr_pred_from_svd(svd: RidgeSVD, Rresp, Presp, nalphas,
                              use_corr: bool = True):
    UR = _ur_product(svd, Rresp)  # (k, V)
    D = _shrinkage_per_voxel(svd, nalphas)  # (k, V)
    pred = jnp.dot(svd.PVh, D * UR, precision=_HIGHEST)  # (Tp, V)
    if use_corr:
        corr = jnp.mean(zscore(Presp, axis=0) * zscore(pred, axis=0), axis=0)
    else:
        resvar = jnp.var(Presp - pred, axis=0, ddof=1)
        rsq = 1.0 - resvar / jnp.var(Presp, axis=0, ddof=1)
        corr = jnp.sqrt(jnp.abs(rsq)) * jnp.sign(rsq)
    return jnp.nan_to_num(corr, nan=0.0, posinf=0.0, neginf=0.0)


def predict(Pstim, wt):
    """X_test @ wt at full precision (nested_cv.py:151,251)."""
    return jnp.dot(
        jnp.asarray(Pstim, jnp.float32), jnp.asarray(wt, jnp.float32),
        precision=_HIGHEST,
    )
