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


def test_xla_formulation_matches_fused():
    from litcoder_core_tpu.ops.pallas_kernels import lanczos_fir_xla

    rng = np.random.default_rng(3)
    data = rng.normal(size=(90, 7)).astype(np.float32)
    dt = np.sort(rng.uniform(0, 60, 90)).astype(np.float32)
    tt = (np.arange(25, dtype=np.float32)) * 2.4 + 1.0
    ours = np.asarray(lanczos_fir_xla(data, dt, tt, delays=(0, 1, 2, -1)))
    two_stage = make_delayed(
        lanczosinterp2D(data, dt, tt), [0, 1, 2, -1]
    )
    np.testing.assert_allclose(ours, two_stage, atol=1e-5)


def test_dispatch_large_shapes_use_xla_path():
    """Shapes whose kernel matrix exceeds the single-block VMEM budget must
    still produce correct output (dispatched to the XLA formulation)."""
    rng = np.random.default_rng(4)
    t_w, t_tr = 4600, 512   # K_pad ~ 9.4 MB > 8 MB budget
    data = rng.normal(size=(t_w, 3)).astype(np.float32)
    dt = np.sort(rng.uniform(0, 1000, t_w)).astype(np.float32)
    tt = (np.arange(t_tr, dtype=np.float32)) * (1000.0 / t_tr)
    out = np.asarray(lanczos_fir(data, dt, tt, delays=(1, 2)))
    two_stage = make_delayed(lanczosinterp2D(data, dt, tt), [1, 2])
    np.testing.assert_allclose(out, np.asarray(two_stage), atol=1e-4)
