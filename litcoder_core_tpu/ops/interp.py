"""Interpolation kernels for temporal downsampling, TPU-first.

Reference behavior: encoding/downsample/interpdata.py builds the Lanczos/sinc
kernel matrix one output-row at a time in a Python loop
(interpdata.py:110-113) and then matmuls. Here the kernel matrix is one
broadcasted expression over (newtime[:, None] - oldtime[None, :]) and the
apply is a single MXU matmul — the whole downsample is one fused jitted
program.
"""

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def lanczosfun(cutoff, t, window: int = 3):
    """Lanczos kernel at times `t` (any shape) with `window` lobes.

    Matches encoding/downsample/interpdata.py:45-63: value 1 at t==0, zero
    outside |t*cutoff| > window.
    """
    t = jnp.asarray(t, jnp.float32) * cutoff
    pi = jnp.pi
    safe_t = jnp.where(t == 0.0, 1.0, t)
    val = (
        window
        * jnp.sin(pi * safe_t)
        * jnp.sin(pi * safe_t / window)
        / (pi**2 * safe_t**2)
    )
    val = jnp.where(t == 0.0, 1.0, val)
    return jnp.where(jnp.abs(t) > window, 0.0, val)


def sincfun(B, t, window=jnp.inf, causal: bool = False, renorm: bool = True):
    """Sinc kernel row(s) with cutoff B; per-row renormalization.

    Matches encoding/downsample/interpdata.py:29-42 applied row-wise: `t` is
    (..., n_old) and renorm normalizes over the last axis.
    """
    t = jnp.asarray(t, jnp.float32)
    val = 2 * B * jnp.sin(2 * jnp.pi * B * t) / (2 * jnp.pi * B * t + 1e-20)
    val = jnp.where(jnp.abs(t) > window / (2 * B), 0.0, val)
    if causal:
        val = jnp.where(t < 0.0, 0.0, val)
    if renorm:
        s = jnp.sum(val, axis=-1, keepdims=True)
        val = jnp.where(s != 0.0, val / jnp.where(s == 0.0, 1.0, s), val)
    return val


def lanczos_matrix(oldtime, newtime, window: int = 3, cutoff_mult: float = 1.0):
    """Dense (n_new, n_old) Lanczos interpolation matrix."""
    oldtime = jnp.asarray(oldtime, jnp.float32)
    newtime = jnp.asarray(newtime, jnp.float32)
    cutoff = 1.0 / jnp.mean(jnp.diff(newtime)) * cutoff_mult
    return lanczosfun(cutoff, newtime[:, None] - oldtime[None, :], window)


def lanczosinterp2D(data, oldtime, newtime, window: int = 3,
                    cutoff_mult: float = 1.0, rectify: bool = False):
    """Lanczos-interpolate columns of (n_old, n_feat) `data` onto `newtime`.

    Matches encoding/downsample/interpdata.py:87-126 including the `rectify`
    pos/neg split (hstack of negative-clipped and positive-clipped parts).
    """
    data = jnp.asarray(data, jnp.float32)
    sincmat = lanczos_matrix(oldtime, newtime, window, cutoff_mult)
    if rectify:
        neg = jnp.dot(sincmat, jnp.minimum(data, 0.0), precision=_HIGHEST)
        pos = jnp.dot(sincmat, jnp.maximum(data, 0.0), precision=_HIGHEST)
        return jnp.concatenate([neg, pos], axis=1)
    return jnp.dot(sincmat, data, precision=_HIGHEST)


def sincinterp2D(data, oldtime, newtime, cutoff_mult: float = 1.0,
                 window: int = 1, causal: bool = False, renorm: bool = True):
    """Sinc-interpolate columns of `data` onto `newtime`
    (encoding/downsample/interpdata.py:66-84)."""
    data = jnp.asarray(data, jnp.float32)
    oldtime = jnp.asarray(oldtime, jnp.float32)
    newtime = jnp.asarray(newtime, jnp.float32)
    cutoff = 1.0 / jnp.mean(jnp.diff(newtime)) * cutoff_mult
    sincmat = sincfun(
        cutoff, newtime[:, None] - oldtime[None, :], window, causal, renorm
    )
    return jnp.dot(sincmat, data, precision=_HIGHEST)


def interpdata(data, oldtime, newtime):
    """Columnwise linear interpolation (encoding/downsample/interpdata.py:11-26),
    vectorized over columns instead of the reference's per-column loop."""
    data = jnp.asarray(data, jnp.float32)
    interp_col = jax.vmap(
        lambda col: jnp.interp(jnp.asarray(newtime), jnp.asarray(oldtime), col),
        in_axes=1,
        out_axes=1,
    )
    return interp_col(data)


@jax.jit
def _gabor_real_imag(data, oldtimes, newtimes, freqs, sigma):
    """Real/imag Gabor products as two real matmuls (complex dtypes are not
    supported on all TPU backends, so the complex view is assembled on host).

    data may be (n_old,) or (n_feat, n_old); returns (cprod, sprod) with
    shape (..., n_new, n_freqs).
    """
    data = jnp.asarray(data, jnp.float32)
    oldtimes = jnp.asarray(oldtimes, jnp.float32)
    newtimes = jnp.asarray(newtimes, jnp.float32)
    freqs = jnp.asarray(freqs, jnp.float32)
    # (n_freqs, n_old) carrier banks.
    phase = oldtimes[None, :] * freqs[:, None] * 2.0 * jnp.pi
    sinvals = jnp.sin(phase)
    cosvals = jnp.cos(phase)
    # (..., n_new, n_old) Gaussian-windowed data. NOTE: the reference divides
    # by 2*sigma^2 *inside* an extra 0.5 factor; reproduce exactly.
    gauss = jnp.exp(
        -0.5 * (oldtimes[None, :] - newtimes[:, None]) ** 2 / (2.0 * sigma**2)
    )
    windowed = gauss[None, :, :] * data[:, None, :] if data.ndim == 2 \
        else gauss * data[None, :]
    sprod = jnp.matmul(windowed, sinvals.T, precision=_HIGHEST)
    cprod = jnp.matmul(windowed, cosvals.T, precision=_HIGHEST)
    return cprod, sprod


def gabor_xfm(data, oldtimes, newtimes, freqs, sigma):
    """Gabor transform of a 1-D signal -> (n_new, n_freqs) complex.

    Matches encoding/downsample/interpdata.py:129-140 but vectorized over
    output times: one matmul pair instead of a per-time Python loop.
    """
    import numpy as np

    cprod, sprod = _gabor_real_imag(data, oldtimes, newtimes, freqs, sigma)
    return np.asarray(cprod) + 1j * np.asarray(sprod)


def gabor_xfm2D(data, oldtimes, newtimes, freqs, sigma):
    """Row-wise Gabor transform of (n_feat, n_old) -> (n_feat*n_freqs, n_new)
    matching encoding/downsample/interpdata.py:143-145 (vstack of transposes)."""
    import numpy as np

    cprod, sprod = _gabor_real_imag(
        jnp.atleast_2d(jnp.asarray(data, jnp.float32)),
        oldtimes, newtimes, freqs, sigma,
    )
    out = np.asarray(cprod) + 1j * np.asarray(sprod)  # (F, n_new, n_freqs)
    out = np.transpose(out, (0, 2, 1))  # (F, n_freqs, n_new)
    return out.reshape(-1, out.shape[-1])
