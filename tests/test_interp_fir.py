"""Golden tests: interpolation kernels and FIR vs the reference's numpy math.

The reference formulas (encoding/downsample/interpdata.py,
encoding/features/FIR_expander.py) are reproduced here in plain numpy as the
oracle; our jitted versions must match elementwise.
"""

import numpy as np

from litcoder_core_tpu.ops.fir import make_delayed
from litcoder_core_tpu.ops.interp import (
    gabor_xfm2D,
    interpdata,
    lanczosfun,
    lanczosinterp2D,
    sincinterp2D,
)

rng = np.random.default_rng(1)


# ---- numpy oracles (reference formulas) ------------------------------------

def _lanczosfun_np(cutoff, t, window=3):
    t = np.atleast_1d(t * cutoff).astype(np.float64)
    val = (window * np.sin(np.pi * t) * np.sin(np.pi * t / window)
           / (np.pi**2 * t**2))
    val[t == 0] = 1.0
    val[np.abs(t) > window] = 0.0
    return val


def _lanczosinterp2D_np(data, oldtime, newtime, window=3, cutoff_mult=1.0,
                        rectify=False):
    cutoff = 1 / np.mean(np.diff(newtime)) * cutoff_mult
    sincmat = np.zeros((len(newtime), len(oldtime)))
    for ndi in range(len(newtime)):
        sincmat[ndi, :] = _lanczosfun_np(cutoff, newtime[ndi] - oldtime, window)
    if rectify:
        return np.hstack([
            sincmat @ np.clip(data, -np.inf, 0),
            sincmat @ np.clip(data, 0, np.inf),
        ])
    return sincmat @ data


def _sincfun_np(B, t, window=np.inf, causal=False, renorm=True):
    val = 2 * B * np.sin(2 * np.pi * B * t) / (2 * np.pi * B * t + 1e-20)
    val[np.abs(t) > window / (2 * B)] = 0
    if causal:
        val[t < 0] = 0
    if not np.sum(val) == 0.0 and renorm:
        val = val / np.sum(val)
    return val


def _sincinterp2D_np(data, oldtime, newtime, cutoff_mult=1.0, window=1,
                     causal=False, renorm=True):
    cutoff = 1 / np.mean(np.diff(newtime)) * cutoff_mult
    sincmat = np.zeros((len(newtime), len(oldtime)))
    for ndi in range(len(newtime)):
        sincmat[ndi, :] = _sincfun_np(
            cutoff, newtime[ndi] - oldtime, window, causal, renorm
        )
    return sincmat @ data


def _gabor_xfm_np(data, oldtimes, newtimes, freqs, sigma):
    sinvals = np.vstack([np.sin(oldtimes * f * 2 * np.pi) for f in freqs])
    cosvals = np.vstack([np.cos(oldtimes * f * 2 * np.pi) for f in freqs])
    outvals = np.zeros((len(newtimes), len(freqs)), dtype=np.complex128)
    for ti, t in enumerate(newtimes):
        gaussvals = np.exp(-0.5 * (oldtimes - t) ** 2 / (2 * sigma**2)) * data
        outvals[ti, :] = cosvals @ gaussvals + 1j * (sinvals @ gaussvals)
    return outvals


def _make_delayed_np(stim, delays, circpad=False):
    nt, ndim = stim.shape
    dstims = []
    for d in delays:
        dstim = np.zeros((nt, ndim))
        if d < 0:
            dstim[:d, :] = stim[-d:, :]
            if circpad:
                dstim[d:, :] = stim[:-d, :]
        elif d > 0:
            dstim[d:, :] = stim[:-d, :]
            if circpad:
                dstim[:d, :] = stim[-d:, :]
        else:
            dstim = stim.copy()
        dstims.append(dstim)
    return np.hstack(dstims)


# ---- tests ------------------------------------------------------------------

def _times():
    oldtime = np.sort(rng.uniform(0, 100, size=230)).astype(np.float32)
    newtime = np.arange(1.0, 99.0, 2.0, dtype=np.float32)
    return oldtime, newtime


def test_lanczosfun_matches_reference():
    t = np.linspace(-5, 5, 301)
    ours = np.asarray(lanczosfun(0.7, t, window=3))
    ref = _lanczosfun_np(0.7, t, window=3)
    assert np.allclose(ours, ref, atol=1e-5)


def test_lanczos_interp_matches_reference():
    oldtime, newtime = _times()
    data = rng.normal(size=(len(oldtime), 17)).astype(np.float32)
    ours = np.asarray(lanczosinterp2D(data, oldtime, newtime))
    ref = _lanczosinterp2D_np(data, oldtime, newtime)
    assert np.allclose(ours, ref, atol=1e-4)


def test_lanczos_rectify_matches_reference():
    oldtime, newtime = _times()
    data = rng.normal(size=(len(oldtime), 5)).astype(np.float32)
    ours = np.asarray(lanczosinterp2D(data, oldtime, newtime, rectify=True))
    ref = _lanczosinterp2D_np(data, oldtime, newtime, rectify=True)
    assert ours.shape == (len(newtime), 10)
    assert np.allclose(ours, ref, atol=1e-4)


def test_sinc_interp_matches_reference():
    oldtime, newtime = _times()
    data = rng.normal(size=(len(oldtime), 6)).astype(np.float32)
    for causal in (False, True):
        for renorm in (False, True):
            ours = np.asarray(sincinterp2D(
                data, oldtime, newtime, window=1, causal=causal, renorm=renorm
            ))
            ref = _sincinterp2D_np(
                data, oldtime, newtime, window=1, causal=causal, renorm=renorm
            )
            assert np.allclose(ours, ref, atol=1e-4), (causal, renorm)


def test_gabor_matches_reference():
    oldtime, newtime = _times()
    data = rng.normal(size=(3, len(oldtime))).astype(np.float32)
    freqs = np.array([0.1, 0.25, 0.5], np.float32)
    ours = np.asarray(gabor_xfm2D(data, oldtime, newtime, freqs, sigma=2.0))
    ref = np.vstack([
        _gabor_xfm_np(d, oldtime, newtime, freqs, 2.0).T for d in data
    ])
    assert np.allclose(np.abs(ours), np.abs(ref), atol=1e-3)


def test_linear_interp_matches_numpy():
    oldtime, newtime = _times()
    data = rng.normal(size=(len(oldtime), 4)).astype(np.float32)
    ours = np.asarray(interpdata(data, oldtime, newtime))
    ref = np.stack(
        [np.interp(newtime, oldtime, data[:, c]) for c in range(4)], axis=1
    )
    assert np.allclose(ours, ref, atol=1e-5)


def test_make_delayed_matches_reference():
    stim = rng.normal(size=(31, 3)).astype(np.float32)
    for delays in ([1, 2, 3, 4], [0], [-2, 0, 2], [-1, 3]):
        for circpad in (False, True):
            ours = np.asarray(make_delayed(stim, delays, circpad))
            ref = _make_delayed_np(stim, delays, circpad)
            assert np.allclose(ours, ref, atol=1e-6), (delays, circpad)
