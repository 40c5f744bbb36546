"""IDEFICS vision-language model (flax.linen).

TPU-native rebuild of HF `IdeficsForVisionText2Text`, the third model
family the reference trains and evaluates
(`/root/reference/pipeline/train/instruction_following.py:331-427`,
`/root/reference/pipeline/train/train_utils.py:143-152`
`get_image_attention_mask`, `/root/reference/pipeline/benchmarks/models/idefics.py`).

Architecture: CLIP-style ViT tower (full sequence incl. CLS) -> perceiver
resampler at the VISION embed dim -> LLaMA trunk with gated cross-attention
blocks BEFORE every `cross_layer_interval`-th layer (idefics interleaves at
idx % interval == 0, unlike flamingo's (idx+1) % n == 0), decoupled
embedding/lm_head for the trainable additional vocab, per-head RMS q/k
norms after rope.

Cross-attention visibility is per-token/per-image: each text token attends
only to the MOST RECENT preceding image, reset by eos
(`image_attention_mask_for_packed_input_ids` +
`incremental_to_binary_attention_mask` in HF processing_idefics.py) — here
computed in-model from input_ids as a vectorized cumulative op, so the
jitted generation engine drives this model unchanged.

Exposes the OtterVLM call signature: (vision_x, lang_x, ...) ->
(logits, cache, vis_latents).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from otter_tpu.config import IdeficsModelConfig, IdeficsPerceiverConfig
from otter_tpu.models.clip import CLIPVisionModel
from otter_tpu.models.decoder import (DecoderLayer, PerHeadLN, PerHeadRMS,
                                      RMSNormModule)
from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.masks import DEFAULT_MASK_VALUE


def image_attention_incremental(ids: jnp.ndarray, image_token_id: int,
                                eos_token_id: int) -> jnp.ndarray:
    """[B, S] token ids -> [B, S] int index of the most recent preceding
    image (-1 = none attendable). Vectorized port of HF
    `image_attention_mask_for_packed_input_ids`: an eos blanks the window
    until the next image token."""
    b, s = ids.shape
    is_img = ids == image_token_id
    is_eod = ids == eos_token_id
    count = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    img_last = jax.lax.cummax(jnp.where(is_img, pos, -1), axis=1)
    eod_last = jax.lax.cummax(jnp.where(is_eod, pos, -1), axis=1)
    # an eos affects only STRICTLY LATER tokens
    eod_prev = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), eod_last[:, :-1]], axis=1)
    seen_eod = (eod_prev >= 0) & (eod_prev >= img_last)
    return jnp.where(seen_eod, -1, count)


def incremental_to_binary(incr: jnp.ndarray, num_images: int) -> jnp.ndarray:
    """[B, S] incremental index -> [B, S, N] one-hot binary mask (HF
    `incremental_to_binary_attention_mask`; indices outside [0, N) drop)."""
    valid = (incr >= 0) & (incr < num_images)
    onehot = jax.nn.one_hot(jnp.clip(incr, 0, num_images - 1), num_images,
                            dtype=jnp.bool_)
    return onehot & valid[..., None]


class IdeficsPerceiverAttention(nn.Module):
    """Latents query a concat(context, latents) sequence (HF
    perceiver.py IdeficsPerceiverAttention)."""

    cfg: IdeficsPerceiverConfig
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context, latents):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        context = ln("context_layer_norm")(context)
        latents = ln("latents_layer_norm")(latents)
        dense = lambda feat, name: nn.Dense(feat, use_bias=False,
                                            dtype=self.dtype, name=name)
        inner = c.n_heads * c.head_dim
        q = dense(inner, "q_proj")(latents)
        kv_in = jnp.concatenate([context, latents], axis=1)
        k = dense(inner, "k_proj")(kv_in)
        v = dense(inner, "v_proj")(kv_in)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.n_heads, c.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if c.qk_layer_norms:
            # HF uses nn.LayerNorm(head_dim) here (with bias)
            q = PerHeadLN(dtype=self.dtype, name="q_layer_norm")(q)
            k = PerHeadLN(dtype=self.dtype, name="k_layer_norm")(k)
        out = multi_head_attention(q, k, v, sm_scale=c.head_dim ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return dense(self.embed_dim, "output_proj")(out)


class IdeficsPerceiverMLP(nn.Module):
    """LN -> fc -> ReLU -> c_proj, all bias-free, at 4x the vision dim."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        x = nn.Dense(4 * self.embed_dim, use_bias=False, dtype=self.dtype,
                     name="fc")(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                        name="c_proj")(x)


class IdeficsPerceiver(nn.Module):
    """[B*N, S_img, D_vis] -> [B*N, n_latents, D_vis]."""

    cfg: IdeficsPerceiverConfig
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        latents = self.param("latents", nn.initializers.normal(1.0),
                             (c.n_latents, self.embed_dim), jnp.float32)
        lat = jnp.broadcast_to(latents.astype(self.dtype)[None],
                               (x.shape[0], c.n_latents, self.embed_dim))
        for i in range(c.depth):
            lat = lat + IdeficsPerceiverAttention(
                c, self.embed_dim, self.dtype, name=f"blocks_{i}_attn")(x, lat)
            lat = lat + IdeficsPerceiverMLP(
                self.embed_dim, self.dtype, name=f"blocks_{i}_mlp")(lat)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(lat)


class IdeficsGatedXAttn(nn.Module):
    """Gated cross-attention block (HF IdeficsGatedCrossAttentionLayer):
    pre-RMSNorm cross-attn with tanh(alpha) gates, token rows attending no
    image zeroed, SwiGLU MLP with its own gate."""

    cfg: IdeficsModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_hidden, img_bias, keep_gate):
        c = self.cfg
        t = c.text
        h, d = t.num_attention_heads, t.head_dim
        dense = lambda feat, name: nn.Dense(feat, use_bias=False,
                                            dtype=self.dtype, name=name)
        alpha_shape = ((1,) if c.alpha_type == "float"
                       else (1, 1, t.hidden_size))
        a_attn = self.param("alpha_cross_attn", nn.initializers.zeros,
                            alpha_shape, jnp.float32)
        a_dense = self.param("alpha_dense", nn.initializers.zeros,
                             alpha_shape, jnp.float32)

        residual = x
        y = RMSNormModule(eps=t.norm_eps, dtype=self.dtype,
                          name="input_layernorm")(x)
        q = dense(h * d, "q_proj")(y)
        k = dense(h * d, "k_proj")(image_hidden)
        v = dense(h * d, "v_proj")(image_hidden)

        def split(tens):
            b, s, _ = tens.shape
            return tens.reshape(b, s, h, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if c.qk_layer_norms:
            # no rope in cross attention; RMS q/k norms per head
            q = PerHeadRMS(eps=t.norm_eps, dtype=self.dtype,
                           name="q_layer_norm")(q)
            k = PerHeadRMS(eps=t.norm_eps, dtype=self.dtype,
                           name="k_layer_norm")(k)
        out = multi_head_attention(q, k, v, bias=img_bias,
                                   sm_scale=d ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        out = dense(t.hidden_size, "o_proj")(out)
        # zero rows for tokens attending no images (cross_attention_gate)
        out = jnp.where(keep_gate[..., None], out, 0.0)
        x = residual + jnp.tanh(a_attn).astype(out.dtype) * out

        residual = x
        y = RMSNormModule(eps=t.norm_eps, dtype=self.dtype,
                          name="post_attention_layernorm")(x)
        gate = jax.nn.silu(dense(t.mlp_dim, "gate_proj")(y))
        up = dense(t.mlp_dim, "up_proj")(y)
        mlp = dense(t.hidden_size, "down_proj")(gate * up)
        return residual + jnp.tanh(a_dense).astype(mlp.dtype) * mlp


class IdeficsVLM(nn.Module):
    """forward: (vision_x [B,N,C,H,W] or [B,T,F,C,H,W], lang_x [B,S]) ->
    (logits [B,S,V+add], cache, vis_latents [B,N,m,D_vis])."""

    cfg: IdeficsModelConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, vision_x, lang_x, attention_mask=None,
                 attend_previous: bool = True, vis_latents=None,
                 cache=None, cache_pos=None, kv_valid=None, positions=None,
                 media_counts=None, image_attention_mask=None,
                 vision_mask=None, head_last_only=False):
        c = self.cfg
        t = c.text

        if vis_latents is None:
            if vision_x.ndim == 6:  # Otter-pipeline [B,T,F,...] -> N = T*F
                b = vision_x.shape[0]
                vision_x = vision_x.reshape((b, -1) + vision_x.shape[3:])
            b, n = vision_x.shape[:2]
            flat = vision_x.reshape((b * n,) + vision_x.shape[2:])
            feats = CLIPVisionModel(c.vision, self.dtype,
                                    name="vision_encoder")(flat)
            # FULL sequence, CLS kept (IdeficsModel uses last_hidden_state)
            if c.use_resampler:
                feats = IdeficsPerceiver(
                    c.perceiver, c.vision.hidden_size, self.dtype,
                    name="perceiver")(feats)
            vis_latents = feats.reshape((b, n) + feats.shape[1:])
        b, n, m, dv = vis_latents.shape
        image_hidden = vis_latents.reshape(b, n * m, dv)

        decoding = cache is not None and cache_pos is not None
        s = lang_x.shape[1]
        if image_attention_mask is None:
            if decoding:
                # generated tokens attend the most recent prompt image
                idx = (media_counts - 1).astype(jnp.int32)          # [B]
                iam = incremental_to_binary(
                    jnp.broadcast_to(idx[:, None], (b, s)), n)
            else:
                incr = image_attention_incremental(
                    lang_x, c.media_token_id, c.eos_token_id)
                iam = incremental_to_binary(incr, n)                # [B,S,N]
        else:
            iam = image_attention_mask.astype(bool)
        # [B,S,N] -> [B,S,N*m] (images-major, matching image_hidden layout)
        iam_lat = jnp.repeat(iam, m, axis=-1)
        img_bias = jnp.where(iam_lat, 0.0, DEFAULT_MASK_VALUE)[:, None]
        keep_gate = jnp.any(iam_lat, axis=-1)                       # [B,S]

        # decoupled embedding (IdeficsDecoupledEmbedding)
        wte = nn.Embed(t.vocab_size, t.hidden_size, dtype=self.dtype,
                       name="wte")
        x = wte(jnp.clip(lang_x, 0, t.vocab_size - 1))
        if c.additional_vocab_size:
            add_emb = nn.Embed(c.additional_vocab_size, t.hidden_size,
                               dtype=self.dtype, name="additional_embedding")
            xa = add_emb(jnp.clip(lang_x - t.vocab_size, 0,
                                  c.additional_vocab_size - 1))
            x = jnp.where((lang_x >= t.vocab_size)[..., None], xa, x)

        attn_ids = None
        if not decoding and attention_mask is not None:
            attn_ids = attention_mask.astype(jnp.int32)

        layer_cls = DecoderLayer
        if self.remat and cache is None:
            # prevent_cse must stay True (default): without the barrier
            # XLA CSEs the rematerialized forward away (see decoder.py)
            layer_cls = nn.remat(DecoderLayer, static_argnums=())

        cur_cache = cache
        for i in range(t.num_hidden_layers):
            if i % c.cross_layer_interval == 0:
                x = IdeficsGatedXAttn(c, self.dtype, name=f"xattn_{i}")(
                    x, image_hidden, img_bias, keep_gate)
            x, lc = layer_cls(t, self.dtype, name=f"layers_{i}")(
                x, positions=positions, attn_ids=attn_ids, bias=None,
                cache=cur_cache, kv_valid=kv_valid, cache_pos=cache_pos,
                layer=i)
            if cur_cache is not None and lc is not None:
                cur_cache = lc
        new_cache = cur_cache if cache is not None else None

        x = RMSNormModule(eps=t.norm_eps, dtype=self.dtype, name="norm_f")(x)
        if head_last_only:
            # prefill paths need only the next-token logits (see
            # Decoder.head_last_only)
            x = x[:, -1:]
        # decoupled lm_head (IdeficsDecoupledLinear)
        logits = nn.Dense(t.vocab_size, use_bias=False, dtype=self.dtype,
                          name="lm_head")(x)
        if c.additional_vocab_size:
            extra = nn.Dense(c.additional_vocab_size, use_bias=False,
                             dtype=self.dtype, name="additional_fc")(x)
            logits = jnp.concatenate([logits, extra], axis=-1)
        return logits, new_cache, vis_latents
