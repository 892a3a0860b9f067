"""Scale-out layer: device meshes and voxel-sharded nested-CV ridge.

The reference has no distributed layer at all (SURVEY.md §2.3-2.4: single
process, no collectives). The TPU-native design shards the embarrassingly
parallel VOXEL axis across chips over ICI: responses Y, per-voxel alphas,
weights, and metrics are sharded; stimuli X and its spectral factorization
are replicated; the solve itself needs zero communication, and only scalar
metric reductions (median/counts) gather.
"""

from litcoder_core_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_voxels,
    VOX_AXIS,
)
from litcoder_core_tpu.parallel.step import (
    make_nested_cv_step,
    nested_cv_step,
    pad_voxels,
)
from litcoder_core_tpu.parallel.tp import (
    make_lm_mesh,
    shard_lm_params,
    DATA_AXIS,
    MODEL_AXIS,
)

__all__ = [
    "make_mesh", "shard_voxels", "replicate", "VOX_AXIS",
    "make_nested_cv_step", "nested_cv_step", "pad_voxels",
    "make_lm_mesh", "shard_lm_params", "DATA_AXIS", "MODEL_AXIS",
]
