from otter_tpu.models.clip import CLIPVisionModel
from otter_tpu.models.decoder import Decoder, init_cache
from otter_tpu.models.otter import OtterVLM, make_otter_cache
from otter_tpu.models.perceiver import PerceiverResampler
from otter_tpu.models.xattn import GatedCrossAttentionBlock
