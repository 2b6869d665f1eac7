"""taiwan_whisper_tpu — TPU-native Whisper distillation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
pipeline forbes110/taiwan-whisper (K2D): pseudo-labelling, 30 s segmentation
with timestamp tokens, hallucination prefiltering, knowledge distillation and
evaluation — designed for TPU meshes (data/model axes) rather than ported
from the reference's CUDA/NCCL stack.
"""

__version__ = "0.1.0"

from .models.config import DtypePolicy, WhisperConfig, get_config  # noqa: F401
