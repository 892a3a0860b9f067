"""Fused Lanczos+FIR vs the two-stage pipeline at LeBel story scale.

Two-stage (reference flow, encoding/downsample/interpdata.py:110-124 then
encoding/features/FIR_expander.py:24-43): Lanczos kernel matmul on device,
base matrix materialized to host, FIR delay-stack in host numpy, delayed
matrix re-uploaded for the ridge stage that consumes it — exactly the data
flow of AbstractTrainer(fused_downsample_fir=False).

Fused (ops.pallas_kernels.lanczos_fir): one device program emits the
delayed design matrix directly; the base never leaves the device and the
output is already where the ridge solve wants it.

Both paths start from device-resident inputs and end with the delayed
matrix device-resident (a scalar fetch forces execution each iteration —
required on the tunneled backend, where block_until_ready alone reports
0 ms). Prints one JSON line with both walls and the speedup.

Run: python benchmarks/fused_lanczos_fir.py
"""

import json
import time

import numpy as np

# LeBel-ish story scale: ~2k words, GPT-2-small features, ~1k TRs, 4 delays.
T_W, D, T_TR = 2048, 768, 1024
DELAYS = (1, 2, 3, 4)
ITERS = 10


def main():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(T_W, D)).astype(np.float32)
    data_times = np.sort(rng.uniform(0, T_TR * 2.0, T_W)).astype(np.float32)
    tr_times = (np.arange(T_TR) * 2.0 + 1.0).astype(np.float32)

    from _artifacts import ensure_backend


    ensure_backend()  # fail fast on a down tunnel


    import jax
    import jax.numpy as jnp

    from litcoder_core_tpu.features.fir_expander import FIR
    from litcoder_core_tpu.ops.interp import lanczosinterp2D
    from litcoder_core_tpu.ops.pallas_kernels import lanczos_fir

    d, dt, tt = jax.device_put((data, data_times, tr_times))

    def two_stage():
        base = np.asarray(lanczosinterp2D(d, dt, tt, window=3,
                                          cutoff_mult=1.0))  # device -> host
        delayed = FIR.make_delayed(base, list(DELAYS))       # host numpy
        out = jnp.asarray(delayed)                           # host -> device
        return float(out.sum()), out

    def fused():
        out = lanczos_fir(d, dt, tt, delays=DELAYS)          # stays on device
        return float(out.sum()), out

    # Warm up (compile) + parity check.
    s_ref, ref = two_stage()
    s_got, got = fused()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, _ = two_stage()
        assert s == s_ref
    wall_two = (time.perf_counter() - t0) / ITERS

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, _ = fused()
        assert s == s_got
    wall_fused = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "metric": "fused_lanczos_fir_speedup",
        "value": round(wall_two / wall_fused, 2),
        "unit": (f"x vs two-stage (T_w={T_W}, D={D}, T_tr={T_TR}, "
                 f"delays={len(DELAYS)}; two_stage={wall_two * 1e3:.1f}ms, "
                 f"fused={wall_fused * 1e3:.1f}ms, "
                 f"platform={jax.devices()[0].platform})"),
    }))


if __name__ == "__main__":
    main()
