"""autoawq_tpu — TPU-native AWQ (activation-aware weight quantization).

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of
casper-hansen/AutoAWQ: W4A16 post-training quantization with AWQ scale/clip
search, packed-int4 Pallas linear kernels, a fused functional inference
runtime, GSPMD sharding over TPU meshes, and HF-ecosystem-compatible
checkpoints.
"""

__version__ = "0.1.0"

from autoawq_tpu.config import AwqConfig  # noqa: F401
from autoawq_tpu.api import (  # noqa: F401
    AutoAWQForCausalLM,
    AwqCausalLM,
    AwqLlavaModel,
)
from autoawq_tpu.models.config import ModelConfig  # noqa: F401
