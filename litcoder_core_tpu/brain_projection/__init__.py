"""Brain projection: volume->surface (fsaverage5) and volume flattening."""

from litcoder_core_tpu.brain_projection.project import (
    BaseBrainDataProcessor,
    SurfaceData,
    SurfaceProcessor,
    VolumeData,
    VolumeProcessor,
)
from litcoder_core_tpu.brain_projection.simple_cache import (
    SimpleSurfaceCache,
    get_surface_cache,
)

__all__ = [
    "BaseBrainDataProcessor", "SurfaceData", "SurfaceProcessor",
    "VolumeData", "VolumeProcessor", "SimpleSurfaceCache",
    "get_surface_cache",
]
