"""litcoder_core_tpu — a TPU-native (JAX/XLA/Pallas) brain-encoding-model framework.

Re-implements the full capability surface of LITcoder (GT-LIT-Lab/litcoder_core,
see /root/reference) with a TPU-first architecture:

- the nested-CV SVD ridge solve is a single batched, jitted linear-algebra
  program (vmapped over folds x alphas, shardable over the voxel axis),
- Lanczos/sinc downsampling and FIR delay expansion are fused matmul kernels,
- voxelwise Pearson r / p-values / Fisher combination / BH-FDR run on device
  as array programs (the reference looped serially on host,
  reference: encoding/models/nested_cv.py:418-477),
- feature extractors run batched forwards instead of one-text-at-a-time
  Python loops (reference: encoding/features/language_model.py:72-81).

Public API mirrors the reference's user-facing names:
AssemblyGenerator, FeatureExtractorFactory, Downsampler, NestedCVModel,
AbstractTrainer, FIR, load_assembly/save_assembly.
"""

__version__ = "0.1.0"

from litcoder_core_tpu.downsample.downsampling import Downsampler
from litcoder_core_tpu.features.fir_expander import FIR
from litcoder_core_tpu.models.nested_cv import NestedCVModel, fit_nested_cv
from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.story_data import StoryData
from litcoder_core_tpu.assembly.assembly_loader import load_assembly, save_assembly
from litcoder_core_tpu.features.factory import FeatureExtractorFactory
from litcoder_core_tpu.trainer import AbstractTrainer

__all__ = [
    "Downsampler",
    "FIR",
    "NestedCVModel",
    "fit_nested_cv",
    "SimpleNeuroidAssembly",
    "StoryData",
    "load_assembly",
    "save_assembly",
    "FeatureExtractorFactory",
    "AbstractTrainer",
    "__version__",
]
