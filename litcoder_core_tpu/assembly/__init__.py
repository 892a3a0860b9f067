"""Data layer: story records, assemblies, loaders, and dataset processors."""

from litcoder_core_tpu.assembly.story_data import StoryData
from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.assembly_loader import (
    AssemblyLoader,
    AssemblyLoaderError,
    load_assembly,
    save_assembly,
)

__all__ = [
    "StoryData",
    "SimpleNeuroidAssembly",
    "AssemblyLoader",
    "AssemblyLoaderError",
    "load_assembly",
    "save_assembly",
]
