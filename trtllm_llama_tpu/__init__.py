"""trtllm_llama_tpu — TPU-native quantized LLaMA inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
TRT2022/trtllm-llama reference (TensorRT-LLM July-2023 + LLaMA quantization
stack). See SURVEY.md for the reference map and README.md for design.
"""

from .config import EngineConfig, ModelConfig
from .parallel.mapping import Mapping
from .quantization.mode import QuantMode

__version__ = "0.1.0"

__all__ = ["EngineConfig", "ModelConfig", "Mapping", "QuantMode", "__version__"]
