from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.masks import (
    alibi_bias,
    alibi_slopes,
    media_cross_attention_mask,
    DEFAULT_MASK_VALUE,
)
