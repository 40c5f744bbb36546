"""CLIP ViT vision tower (flax.linen).

TPU-native rebuild of the reference's xformers-accelerated CLIP
(`xformers_model/clip.py:50-453`): conv patch embedding + class token +
learned position embeddings, pre-LN, N encoder layers (LN → MHA → LN → MLP,
quick_gelu), attention running through the Pallas flash kernel. As in HF/the
reference, `last_hidden_state` is returned WITHOUT the post-layernorm (that
is only applied to the pooled CLS, `xformers_model/clip.py:434-436`), and
Otter consumes `[:, 1:, :]` (drops CLS, `modeling_otter.py:991`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.config import VisionConfig
from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.layers import ACTIVATIONS, layer_norm


class CLIPAttention(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h, d = c.num_attention_heads, c.head_dim
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype,
                                      name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):  # [B, S, D*H] -> [B, H, S, D]
            b, s, _ = t.shape
            return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

        out = multi_head_attention(split(q), split(k), split(v))
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + CLIPAttention(c, self.dtype, name="self_attn")(
            ln("layer_norm1")(x))
        residual = x
        y = ln("layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = ACTIVATIONS[c.hidden_act](y)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(y)
        return residual + y


class CLIPVisionModel(nn.Module):
    """pixel_values [B, C, H, W] (CHW to match the reference data pipeline)
    -> last_hidden_state [B, 1+P, D]."""

    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        b = pixel_values.shape[0]
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)  # NHWC
        patches = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding")(x)
        patches = patches.reshape(b, -1, c.hidden_size)     # [B, P, D]

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)          # [B, 1+P, D]

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1 + c.num_patches, c.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)[None]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(x)
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(c, self.dtype, name=f"layers_{i}")(x)
        # post_layernorm exists in checkpoints (applied to pooled CLS only);
        # declare it so weight conversion round-trips.
        _pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                               name="post_layernorm")(x[:, 0])
        return x
