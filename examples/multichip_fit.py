"""Multi-chip voxel-sharded fit through the USER-FACING model API.

The mesh is a constructor argument of the model — no separate parallel
API to learn (the TPU-native analogue of the reference's in-fit `use_gpu`
device knob, encoding/models/nested_cv.py:84-95). Works identically on a
real TPU slice and on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_fit.py
"""

import os

import numpy as np

# The tunneled TPU plugin ignores the JAX_PLATFORMS env var; only the
# config knob forces CPU (cf. examples/tp_extraction.py).
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax

    from litcoder_core_tpu import NestedCVModel

    n = len(jax.devices())
    print(f"{n} {jax.devices()[0].platform} device(s)")

    rng = np.random.default_rng(0)
    T, Tp, D, V = 600, 150, 24, 1001  # V deliberately not divisible by n
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + 2 * rng.normal(size=(T, V))).astype(np.float32)
    X_test = rng.normal(size=(Tp, D)).astype(np.float32)
    y_test = (X_test @ wt + 2 * rng.normal(size=(Tp, V))).astype(np.float32)

    # Single knob: n_devices. Responses, weights, per-voxel alphas and
    # metrics shard over the voxel axis; the solve needs zero collectives.
    model = NestedCVModel(seed=0, n_devices=n)
    metrics, weights, best_alphas = model.fit_predict(
        X, Y, X_test=X_test, y_test=y_test,
        chunk_length=20, n_inner_folds=5,
    )
    print(f"median r = {metrics['median_score']:.3f}  "
          f"significant = {metrics['n_significant']}/{V}  "
          f"weights {weights.shape}")

    # Full nested CV shards the same way (and runs the fused
    # outer-fold-streaming path when folds are complement-structured).
    metrics_cv, _, _ = model.fit_predict(
        X, Y, chunk_length=20, n_outer_folds=3, n_inner_folds=3,
    )
    print(f"full-CV median r = {metrics_cv['median_score']:.3f}")


if __name__ == "__main__":
    main()
