"""Data layer: story records, assemblies, loaders, and dataset processors."""

from litcoder_core_tpu.assembly.story_data import StoryData
from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.assembly_loader import (
    AssemblyLoader,
    AssemblyLoaderError,
    load_assembly,
    save_assembly,
)
from litcoder_core_tpu.assembly.assembly_generator import AssemblyGenerator
from litcoder_core_tpu.assembly.base_processor import BaseAssemblyGenerator
from litcoder_core_tpu.assembly.lebel_processor import LebelAssemblyGenerator
from litcoder_core_tpu.assembly.lpp_processor import LPPAssemblyGenerator
from litcoder_core_tpu.assembly.narratives_processor import (
    NarrativesAssemblyGenerator,
)

__all__ = [
    "StoryData",
    "SimpleNeuroidAssembly",
    "AssemblyLoader",
    "AssemblyLoaderError",
    "load_assembly",
    "save_assembly",
    "AssemblyGenerator",
    "BaseAssemblyGenerator",
    "LebelAssemblyGenerator",
    "LPPAssemblyGenerator",
    "NarrativesAssemblyGenerator",
]
