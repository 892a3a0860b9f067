"""Fused Pallas kernel parity vs the two-stage reference pipeline."""

import numpy as np

from litcoder_core_tpu.ops.fir import make_delayed
from litcoder_core_tpu.ops.interp import lanczosinterp2D
from litcoder_core_tpu.ops.pallas_kernels import lanczos_fir

rng = np.random.default_rng(13)


def _case(t_w=230, dim=17, t_tr=49):
    data = rng.normal(size=(t_w, dim)).astype(np.float32)
    data_times = np.sort(rng.uniform(0, 100, t_w)).astype(np.float32)
    tr_times = np.linspace(1.0, 99.0, t_tr).astype(np.float32)
    return data, data_times, tr_times


def test_fused_matches_two_stage():
    data, data_times, tr_times = _case()
    delays = [1, 2, 3, 4]
    fused = np.asarray(lanczos_fir(data, data_times, tr_times, delays))
    two_stage = np.asarray(make_delayed(
        lanczosinterp2D(data, data_times, tr_times), delays
    ))
    assert fused.shape == two_stage.shape == (49, 17 * 4)
    assert np.allclose(fused, two_stage, atol=1e-4)


def test_fused_zero_and_negative_delays():
    data, data_times, tr_times = _case(dim=5)
    for delays in ([0], [-2, 0, 3]):
        fused = np.asarray(lanczos_fir(data, data_times, tr_times, delays))
        ref = np.asarray(make_delayed(
            lanczosinterp2D(data, data_times, tr_times), delays
        ))
        assert np.allclose(fused, ref, atol=1e-4), delays


def test_fused_wide_features():
    """Feature dim spanning several 128-lane tiles."""
    data, data_times, tr_times = _case(dim=300)
    fused = np.asarray(lanczos_fir(data, data_times, tr_times, [1, 2]))
    ref = np.asarray(make_delayed(
        lanczosinterp2D(data, data_times, tr_times), [1, 2]
    ))
    assert fused.shape == (49, 600)
    assert np.allclose(fused, ref, atol=1e-4)
