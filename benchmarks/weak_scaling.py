"""Weak-scaling microbench: fixed voxels-per-device over a growing mesh.

Per SURVEY.md §5.8 the voxel-sharded nested-CV solve has zero tensor
collectives, so weak scaling should be near-flat: doubling devices while
doubling voxels should hold wall time ~constant (per-device work fixed;
X/spectral state replicated). Runs on virtual CPU devices by default so it
is executable anywhere; on a real multi-chip TPU slice the same script
measures ICI-backed scaling.

Run: python benchmarks/weak_scaling.py [--devices 1 2 4 8]
     [--vox_per_device 2048]
Prints one JSON line per mesh size plus a summary line with the weak-
scaling efficiency wall(1 device) / wall(max devices).
"""

import argparse
import json
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+",
                        default=[1, 2, 4, 8])
    parser.add_argument("--vox_per_device", type=int, default=2048)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--tpu", action="store_true",
                        help="use the real platform instead of forcing the "
                             "virtual CPU mesh")
    parser.add_argument("--out", default=None,
                        help="append the per-mesh records + summary to this "
                             "JSON file (the PARITY.md artifact)")
    args = parser.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))

    import jax.numpy as jnp
    import numpy as np

    from litcoder_core_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_voxels,
    )
    from litcoder_core_tpu.parallel.step import (
        equal_size_folds,
        nested_cv_step,
    )

    T, TP, D, A, F, CHUNK = 2048, 256, 256, 10, 5, 20
    rng = np.random.default_rng(0)
    X = rng.normal(size=(T, D)).astype(np.float32)
    X_test = rng.normal(size=(TP, D)).astype(np.float32)
    alphas = np.logspace(-1, 8, A).astype(np.float32)
    train_idx, val_idx = equal_size_folds(T, F, CHUNK, seed=0)

    records = []
    walls = {}
    for n in args.devices:
        mesh = make_mesh(n)
        V = args.vox_per_device * n
        Y = rng.normal(size=(T, V)).astype(np.float32)
        Y_test = rng.normal(size=(TP, V)).astype(np.float32)
        Xr = replicate(X, mesh)
        Xtr = replicate(X_test, mesh)
        Ys = shard_voxels(Y, mesh)
        Yts = shard_voxels(Y_test, mesh)

        def run():
            out = nested_cv_step(Xr, Ys, Xtr, Yts, alphas, train_idx,
                                 val_idx, method="eigh")
            return float(jnp.sum(out.correlations))  # forces execution

        s0 = run()  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            assert run() == s0
        walls[n] = (time.perf_counter() - t0) / args.iters
        record = {
            "metric": "weak_scaling_wall_seconds",
            "devices": n,
            "voxels": V,
            "platform": jax.devices()[0].platform,
            "shard_voxels_per_device": V // n,
            "value": round(walls[n], 3),
            "unit": f"s/step (T={T}, D={D}, vox/device="
                    f"{args.vox_per_device})",
        }
        records.append(record)
        print(json.dumps(record), flush=True)

    n_min, n_max = min(walls), max(walls)
    summary = {
        "metric": "weak_scaling_efficiency",
        "value": round(walls[n_min] / walls[n_max], 3),
        "unit": f"wall({n_min} dev)/wall({n_max} dev) at fixed vox/device "
                f"(1.0 = perfect)",
    }
    if not args.tpu:
        # Virtual CPU devices SHARE the host's physical cores, so total
        # work grows with the mesh while compute does not — sub-1.0
        # efficiency here reflects the fake backend, not ICI traffic (the
        # compiled solve has zero tensor collectives; see
        # tests/test_parallel.py::test_compiled_sharded_step_has_no_tensor_collectives).
        summary["note"] = ("virtual CPU mesh: devices share host cores; "
                           "efficiency is only meaningful on real chips")
    records.append(summary)
    print(json.dumps(summary))
    if args.out:
        from _artifacts import append_records

        append_records(args.out, records)


if __name__ == "__main__":
    main()
