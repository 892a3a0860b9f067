"""Device-mesh construction and voxel-axis sharding helpers.

1-D mesh over the voxel axis: per-voxel ridge problems are independent
(SURVEY.md §5.8), so Y/(alphas)/(weights)/(metrics) shard over 'vox' with
zero ICI traffic in the solve; X and the spectral state replicate.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VOX_AXIS = "vox"


def make_mesh(n_devices: Optional[int] = None,
              devices=None, axis: str = VOX_AXIS) -> Mesh:
    """1-D mesh over `axis` using the first n_devices JAX devices.

    Raises RuntimeError when fewer than n_devices exist — silently
    truncating would build a mis-sized mesh and fail later with an opaque
    sharding error (this bit the round-1 driver dry run)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise RuntimeError(
                    f"make_mesh({n_devices}) needs {n_devices} devices but "
                    f"only {len(devices)} exist (platform="
                    f"{devices[0].platform}); provision more (e.g. "
                    f"jax.config.update('jax_num_cpu_devices', "
                    f"{n_devices}) before JAX initializes)"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def resolve_voxel_mesh(mesh, n_devices: Optional[int], who: str = "fit"):
    """Resolve the user-facing mesh knobs into a 1-D voxel mesh (or None).

    This is the TPU-native analogue of the reference's in-fit device knob
    (use_gpu + device selection, encoding/models/nested_cv.py:84-95): the
    mesh is an argument of the FIT, not a separate power-user API. Shared
    by fit_nested_cv and fit_banded_ridge.
    """
    if mesh is None and n_devices is None:
        return None
    if mesh is None:
        mesh = make_mesh(n_devices)
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"{who} expects a 1-D (voxel) mesh; got axes {mesh.axis_names}"
        )
    if n_devices is not None and mesh.devices.size != n_devices:
        raise ValueError(
            f"mesh has {mesh.devices.size} devices but n_devices="
            f"{n_devices} was requested; pass one or the other"
        )
    return mesh


def shard_voxels(array, mesh: Mesh, axis: str = VOX_AXIS):
    """Place an array with its LAST axis sharded over the mesh.

    Works for (T, V) responses, (V,) alphas, (D, V) weights. The voxel count
    must be a multiple of the mesh size (pad with `pad_voxels` first).
    """
    ndim = np.ndim(array)
    spec = P(*([None] * (ndim - 1) + [axis]))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(array, mesh: Mesh):
    """Fully replicate an array over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P()))
