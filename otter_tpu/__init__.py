"""otter_tpu: TPU-native multimodal in-context instruction-tuning framework.

Brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
Luodian/Otter (Flamingo-style VLMs + Fuyu/OtterHD), designed TPU-first.
"""

__version__ = "0.1.0"

from otter_tpu.api import (
    FlamingoForConditionalGeneration,
    OtterForConditionalGeneration,
)
from otter_tpu.config import (
    FuyuConfig,
    GenerationConfig,
    OtterConfig,
    ParallelConfig,
    PerceiverConfig,
    TextConfig,
    VisionConfig,
    otter_llama7b_video,
    otter_mpt7b,
)
