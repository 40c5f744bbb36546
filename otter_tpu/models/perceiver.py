"""PerceiverResampler (flax.linen).

Rebuild of `OtterPerceiverResampler` / `OtterPerceiverBlock`
(reference `modeling_otter.py:129-235`): learned latents cross-attend to
vision tokens, with the latents concatenated into the key/value set, optional
frame embeddings (video) and media-time embeddings, and a final LayerNorm.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.config import PerceiverConfig
from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.layers import gelu


class PerceiverBlock(nn.Module):
    cfg: PerceiverConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents, kv_mask=None):
        """x: [B*T, n1, D] media tokens; latents: [B*T, n2, D].
        kv_mask: optional [B*T, n1] bool — False tokens (padded frames in
        mixed still+video batches) are excluded from attention."""
        c = self.cfg
        inner = c.dim_head * c.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        dense = lambda feat, name: nn.Dense(feat, use_bias=False,
                                            dtype=self.dtype, name=name)

        x_n = ln("norm_media")(x)
        residual = latents
        lat_n = ln("norm_latents")(latents)

        q = dense(inner, "to_q")(lat_n)
        kv_input = jnp.concatenate([x_n, lat_n], axis=-2)
        kv = dense(inner * 2, "to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        q_ids = kv_ids = None
        if kv_mask is not None:
            bt, n2 = latents.shape[:2]
            kv_ids = jnp.concatenate(
                [kv_mask.astype(jnp.int32),
                 jnp.ones((bt, n2), jnp.int32)], axis=-1)
            q_ids = jnp.ones((bt, n2), jnp.int32)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.heads, c.dim_head).transpose(0, 2, 1, 3)

        out = multi_head_attention(split(q), split(k), split(v),
                                   q_ids=q_ids, kv_ids=kv_ids,
                                   ids_mode="eq",
                                   sm_scale=c.dim_head ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        out = dense(c.dim, "to_out")(out) + residual

        residual = out
        y = ln("ff_norm")(out)
        y = dense(c.dim * c.ff_mult, "ff_up")(y)
        y = gelu(y)
        y = dense(c.dim, "ff_down")(y)
        return y + residual


class PerceiverResampler(nn.Module):
    cfg: PerceiverConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frame_mask=None):
        """x: [B, T, F, v, D] vision features -> [B, T, n_latents, D].
        frame_mask: optional [B, T, F] bool — padded frames (mixed
        still+video requests, model_worker.py:181-206 extended) are
        excluded from the latent attention."""
        c = self.cfg
        b, t, f, v, d = x.shape
        x = x.astype(self.dtype)
        kv_mask = None
        if frame_mask is not None:
            kv_mask = jnp.repeat(frame_mask.reshape(b * t, f), v, axis=-1)

        if c.max_num_frames is not None:
            frame_embs = self.param("frame_embs", nn.initializers.normal(1.0),
                                    (c.max_num_frames, d), jnp.float32)
            x = x + frame_embs[:f].astype(self.dtype)[None, None, :, None, :]
        x = x.reshape(b, t, f * v, d)
        if c.max_num_media is not None:
            media_embs = self.param("media_time_embs",
                                    nn.initializers.normal(1.0),
                                    (c.max_num_media, 1, d), jnp.float32)
            x = x + media_embs[:t].astype(self.dtype)[None]

        latents = self.param("latents", nn.initializers.normal(1.0),
                             (c.num_latents, d), jnp.float32)
        lat = jnp.broadcast_to(latents.astype(self.dtype),
                               (b * t, c.num_latents, d))
        x = x.reshape(b * t, f * v, d)
        for i in range(c.depth):
            lat = PerceiverBlock(c, self.dtype, name=f"layers_{i}")(
                x, lat, kv_mask)
        lat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(lat)
        return lat.reshape(b, t, c.num_latents, d)
