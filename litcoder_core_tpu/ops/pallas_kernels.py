"""Pallas TPU kernels for fused hot ops.

`lanczos_fir_fused`: Lanczos downsampling to TRs + FIR delay stacking in ONE
kernel (the north-star fusion — BASELINE.json: "Lanczos downsampling to TRs
and FIR.make_delayed HRF delay stacking become fused XLA/Pallas kernels").

Design: for a feature tile, compute the downsampled base tile with one MXU
dot (K @ data_tile) and emit every FIR-shifted copy from VMEM — the base
matrix (T_tr x D) never round-trips through HBM between the two stages, and
the delayed copies are written exactly once. Grid is 1-D over feature tiles;
the kernel is delay-unrolled (delays are static).

Falls back to interpret mode off-TPU so the same code path is testable on
the virtual CPU mesh.
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from litcoder_core_tpu.ops.interp import lanczos_matrix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lanczos_fir_kernel(k_ref, data_ref, out_ref, *, delays, n_tr):
    """One feature tile: base = K @ data, then delay-shifted writes.

    Refs:
        k_ref: (T_tr_pad, T_w_pad) kernel matrix (VMEM).
        data_ref: (T_w_pad, TILE_D) feature tile (VMEM).
        out_ref: (T_tr_pad, n_delays, TILE_D) delayed copies (VMEM).
    """
    # HIGHEST precision: fp32 accumulation on the MXU (default bf16 passes
    # broke 1e-3 parity with the reference pipeline).
    base = jnp.dot(k_ref[:], data_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (T_tr_pad, TILE_D)
    rows = jax.lax.broadcasted_iota(jnp.int32, base.shape, 0)
    n_rows = base.shape[0]
    for j, d in enumerate(delays):
        # pltpu.roll requires a non-negative shift; a negative delay is the
        # same circular shift modulo the (static, padded) row count.
        shift = d % n_rows
        shifted = pltpu.roll(base, shift, axis=0) if shift != 0 else base
        if d > 0:
            valid = rows >= d
        elif d < 0:
            valid = rows < n_tr + d
        else:
            valid = None
        # Rows past n_tr are padding; zero them too so the caller's slice of
        # the first n_tr rows is exact and the pad region stays clean.
        pad_ok = rows < n_tr
        mask = pad_ok if valid is None else (valid & pad_ok)
        out_ref[:, j, :] = jnp.where(mask, shifted, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("delays", "window", "cutoff_mult", "interpret"),
)
def lanczos_fir_fused(data, data_times, tr_times,
                      delays: Sequence[int] = (1, 2, 3, 4),
                      window: int = 3, cutoff_mult: float = 1.0,
                      interpret: bool = False):
    """Fused Lanczos downsample + FIR delay expansion.

    Args:
        data: (T_w, D) word-level features.
        data_times: (T_w,) word times.  tr_times: (T_tr,) TR times.
        delays: static FIR delays (reference FIR.make_delayed semantics,
            zero-padded shifts).

    Returns:
        (T_tr, D * len(delays)) delayed design matrix, column blocks ordered
        by delay exactly like FIR.make_delayed(lanczosinterp2D(...)).
    """
    data = jnp.asarray(data, jnp.float32)
    t_w, dim = data.shape
    t_tr = tr_times.shape[0]
    n_delays = len(delays)

    K = lanczos_matrix(data_times, tr_times, window, cutoff_mult)

    # Pad every axis to TPU tile granularity (fp32: 8 x 128).
    t_tr_pad = _round_up(t_tr, 8)
    t_w_pad = _round_up(t_w, 128)
    tile_d = 128
    dim_pad = _round_up(dim, tile_d)

    K_pad = jnp.zeros((t_tr_pad, t_w_pad), jnp.float32).at[:t_tr, :t_w].set(K)
    data_pad = jnp.zeros((t_w_pad, dim_pad), jnp.float32).at[:t_w, :dim].set(
        data
    )

    grid = (dim_pad // tile_d,)
    out = pl.pallas_call(
        functools.partial(_lanczos_fir_kernel, delays=tuple(delays),
                          n_tr=t_tr),
        out_shape=jax.ShapeDtypeStruct((t_tr_pad, n_delays, dim_pad),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_tr_pad, t_w_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_w_pad, tile_d), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tr_pad, n_delays, tile_d),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K_pad, data_pad)

    # (T_tr, n_delays, D) -> (T_tr, n_delays * D) matching hstack-by-delay.
    return out[:t_tr, :, :dim].reshape(t_tr, n_delays * dim)


# The single-block kernel holds K (t_tr_pad x t_w_pad), one data tile, and
# one output tile in VMEM at once; past this K budget Mosaic would fail to
# place the blocks (~16 MB VMEM/core on v5e), so larger problems dispatch to
# the XLA formulation below, which XLA tiles arbitrarily.
_VMEM_K_BUDGET_BYTES = 8 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("delays", "window", "cutoff_mult")
)
def lanczos_fir_xla(data, data_times, tr_times,
                    delays: Sequence[int] = (1, 2, 3, 4),
                    window: int = 3, cutoff_mult: float = 1.0):
    """Same fusion as lanczos_fir_fused in pure XLA: the FIR shift commutes
    with the interpolation matmul, so each delayed block is (shifted K) @
    data — one stacked MXU matmul, no intermediate base matrix in HBM."""
    data = jnp.asarray(data, jnp.float32)
    t_tr = tr_times.shape[0]
    K = lanczos_matrix(data_times, tr_times, window, cutoff_mult)
    rows = jnp.arange(t_tr)
    blocks = []
    for d in delays:
        Kd = jnp.roll(K, d, axis=0) if d else K
        if d > 0:
            Kd = jnp.where((rows >= d)[:, None], Kd, 0.0)
        elif d < 0:
            Kd = jnp.where((rows < t_tr + d)[:, None], Kd, 0.0)
        blocks.append(Kd)
    K_all = jnp.concatenate(blocks, axis=0)  # (n_delays * T_tr, T_w)
    out = jnp.dot(K_all, data, precision=jax.lax.Precision.HIGHEST)
    n_delays = len(delays)
    # (n_delays, T_tr, D) -> (T_tr, n_delays * D) matching hstack-by-delay.
    return (out.reshape(n_delays, t_tr, data.shape[1])
            .transpose(1, 0, 2)
            .reshape(t_tr, n_delays * data.shape[1]))


def lanczos_fir(data, data_times, tr_times, delays=(1, 2, 3, 4),
                window: int = 3, cutoff_mult: float = 1.0):
    """Dispatch: Pallas on TPU (interpret mode elsewhere) while the kernel
    matrix fits the single-block VMEM budget; XLA formulation beyond it."""
    t_tr_pad = _round_up(int(tr_times.shape[0]), 8)
    t_w_pad = _round_up(int(jnp.asarray(data).shape[0]), 128)
    if t_tr_pad * t_w_pad * 4 > _VMEM_K_BUDGET_BYTES:
        return lanczos_fir_xla(
            jnp.asarray(data), jnp.asarray(data_times),
            jnp.asarray(tr_times), delays=tuple(int(d) for d in delays),
            window=window, cutoff_mult=cutoff_mult,
        )
    on_tpu = jax.devices()[0].platform == "tpu"
    return lanczos_fir_fused(
        jnp.asarray(data), jnp.asarray(data_times), jnp.asarray(tr_times),
        delays=tuple(int(d) for d in delays), window=window,
        cutoff_mult=cutoff_mult, interpret=not on_tpu,
    )
