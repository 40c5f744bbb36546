"""Tanh-gated masked cross-attention block (flax.linen).

Rebuild of `OtterMaskedCrossAttention` / `OtterGatedCrossAttentionBlock`
(reference `modeling_otter.py:238-395`). The media-location mask logic
(`:296-330`) is computed OUTSIDE the block as integer ids (text_time vs
media_time) and enforced inside the Pallas kernel via the "eq"/"ge" id
comparison; the post-softmax zeroing for text with no preceding media
(`:326-330`) becomes the `out_keep` multiply.

Gates initialize to 0 so a freshly added block is an identity (Flamingo).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.layers import gelu


class MaskedCrossAttention(nn.Module):
    dim: int
    dim_visual: int
    dim_head: int = 64
    heads: int = 8
    only_attend_immediate_media: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: str = None    # int8: q/kv/out projections at 1 byte/weight

    @nn.compact
    def __call__(self, x, media, q_ids=None, kv_ids=None, out_keep=None):
        """x: [B, S_txt, D_txt]; media: [B, T_img, n, D_vis];
        q_ids: [B, S_txt] text_time; kv_ids: [B, T_img*n] media_time."""
        from otter_tpu.ops.quant import make_dense
        inner = self.dim_head * self.heads
        b, t_img, n, _ = media.shape
        dense = lambda feat, name: make_dense(
            self.quant, feat, use_bias=False, dtype=self.dtype, name=name)

        x_n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        q = dense(inner, "to_q")(x_n)
        media_flat = media.reshape(b, t_img * n, -1)
        kv = dense(inner * 2, "to_kv")(media_flat)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            bb, s, _ = t.shape
            return t.reshape(bb, s, self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        out = multi_head_attention(
            split(q), split(k), split(v),
            q_ids=q_ids, kv_ids=kv_ids,
            ids_mode="eq" if self.only_attend_immediate_media else "ge",
            sm_scale=self.dim_head ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        if out_keep is not None:
            out = out * out_keep[..., None].astype(out.dtype)
        return dense(self.dim, "to_out")(out)


class GatedCrossAttentionBlock(nn.Module):
    dim: int
    dim_visual: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    only_attend_immediate_media: bool = True
    dtype: jnp.dtype = jnp.float32
    # int8 weight-only quantization of the FF pair (the per-block 4d^2
    # weight read dominates the xattn decode cost; measured 4.3 ms/step
    # inline in bf16 on the MPT-7B vs 1.4 ms ideal int8)
    quant: str = None

    @nn.compact
    def __call__(self, x, media, q_ids=None, kv_ids=None, out_keep=None):
        import jax
        attn_gate = self.param("attn_gate", nn.initializers.zeros, (1,),
                               jnp.float32)
        ff_gate = self.param("ff_gate", nn.initializers.zeros, (1,),
                             jnp.float32)
        attn = MaskedCrossAttention(
            self.dim, self.dim_visual, self.dim_head, self.heads,
            self.only_attend_immediate_media, self.dtype,
            quant=self.quant, name="attn")(
                x, media, q_ids, kv_ids, out_keep)
        x = attn * jnp.tanh(attn_gate).astype(x.dtype) + x

        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ff_norm")(x)
        tokens = 1
        for s in y.shape[:-1]:
            tokens *= s
        if self.quant in ("int8", "int4"):
            from otter_tpu.ops.quant import (Int4Dense, Int4Kernel,
                                             Int8Dense, Int8Kernel,
                                             int4_mlp, int8_mlp)
            four = self.quant == "int4"
            if tokens <= 32:   # decode: one fused launch, 1 or 0.5 B/weight
                KH, mlp_fn = ((Int4Kernel, int4_mlp) if four
                              else (Int8Kernel, int8_mlp))
                kw1 = {"pack_axis": 0} if four else {}
                kw2 = {"pack_axis": 1} if four else {}
                kq1, s1 = KH(self.dim * self.ff_mult,
                             name="ff_up", **kw1)(self.dim)
                kq2, s2 = KH(self.dim, name="ff_down", **kw2)(
                    self.dim * self.ff_mult)
                y = mlp_fn(y.reshape(tokens, self.dim).astype(self.dtype),
                           kq1, s1, kq2, s2, act="gelu",
                           interpret=jax.default_backend() != "tpu")
                y = y.reshape(x.shape[:-1] + (self.dim,))
            elif four:         # prefill/training: XLA in-graph unpack
                y = Int4Dense(self.dim * self.ff_mult, pack_axis=0,
                              dtype=self.dtype, name="ff_up")(y)
                y = gelu(y)
                y = Int4Dense(self.dim, pack_axis=1, dtype=self.dtype,
                              name="ff_down")(y)
            else:              # prefill/training: XLA convert-then-dot
                y = Int8Dense(self.dim * self.ff_mult, use_bias=False,
                              dtype=self.dtype, name="ff_up")(y)
                y = gelu(y)
                y = Int8Dense(self.dim, use_bias=False, dtype=self.dtype,
                              name="ff_down")(y)
        else:
            y = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, name="ff_up")(y)
            y = gelu(y)
            y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="ff_down")(y)
        return y * jnp.tanh(ff_gate).astype(x.dtype) + residual
