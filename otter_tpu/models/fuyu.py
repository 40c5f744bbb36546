"""Fuyu/OtterHD: encoder-free VLM (flax.linen).

Rebuild of `FuyuForCausalLM` (reference `fuyu/modeling_fuyu.py:19-144`):
variable-resolution image patches linearly projected
(`vision_embed_tokens`, :32) and placed into the Persimmon token stream at
placeholder positions. The reference's per-batch-element python scatter
(`gather_continuous_embeddings`, :44-77) becomes a vectorized
take_along_axis + where inside the decoder (static shapes, jit-friendly).

The Persimmon-8B decoder (reference `fuyu/modeling_persimmon.py`) is the
unified Decoder with arch="persimmon": per-head QK-layernorm, partial
rotary, squared-ReLU MLP — the reference's fused CUDA ops
(fused_layer_norm / fused_mlp_func sqrelu / fused rotary, :28-32,191-193,
303-310) are XLA fusions + the Pallas flash-attention kernel here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.config import FuyuConfig
from otter_tpu.models.decoder import Decoder, init_cache


class FuyuVLM(nn.Module):
    cfg: FuyuConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False   # per-layer gradient checkpointing (training)

    @nn.compact
    def __call__(self, input_ids, *, image_patches=None,
                 image_patches_indices=None, attention_mask=None,
                 positions=None, cache=None, cache_pos=None, kv_valid=None,
                 head_last_only=False):
        """input_ids [B, S]; image_patches [B, P, patch_size²·C] f32;
        image_patches_indices [B, S] int32 (-1 = text token, >=0 = index
        into image_patches). Returns (logits, new_cache)."""
        c = self.cfg
        merge = None
        if image_patches is not None and cache_pos is None:
            patch_emb = nn.Dense(c.text.hidden_size, dtype=self.dtype,
                                 name="vision_embed_tokens")(
                image_patches.astype(self.dtype))          # [B, P, H]
            idx = jnp.clip(image_patches_indices, 0, None)  # [B, S]
            gathered = jnp.take_along_axis(
                patch_emb, idx[..., None], axis=1)          # [B, S, H]
            merge = (gathered, image_patches_indices >= 0)
        logits, new_cache = Decoder(c.text, dtype=self.dtype,
                                    remat=self.remat,
                                    name="language_model")(
            input_ids, merge_embeds=merge, attention_mask=attention_mask,
            positions=positions, cache=cache, cache_pos=cache_pos,
            kv_valid=kv_valid, head_last_only=head_last_only)
        return logits, new_cache


def make_fuyu_cache(cfg: FuyuConfig, batch: int, max_len: int,
                    dtype=jnp.bfloat16) -> Dict[str, Any]:
    return init_cache(cfg.text, batch, max_len, dtype)
