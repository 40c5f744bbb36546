"""Mask and bias construction for the attention kernels.

Covers the three mask families the reference composes on GPU:
  - ALiBi slopes/bias (reference `src/otter_ai/models/mpt/attention.py:449-464`)
  - key-padding masks (`modeling_mpt.py:135-145`)
  - Flamingo media-location cross-attention masks
    (`src/otter_ai/models/otter/modeling_otter.py:296-330`)

All functions are jit-friendly (static shapes, no Python branching on traced
values) and return either additive biases or boolean masks consumed by
`otter_tpu.ops.attention`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-but-finite negative for masked logits. Matches the flash-attention
# convention (-0.7 * finfo.max) to avoid exp(-inf - -inf) NaNs inside the
# online-softmax kernel.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """Per-head ALiBi slopes, matching `gen_slopes` (mpt/attention.py:449-456).

    For non-power-of-two head counts the odd-indexed slopes are interleaved
    first, exactly as the reference does.
    """
    ceil_pow2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, ceil_pow2 + 1, dtype=jnp.float32) * (alibi_bias_max / ceil_pow2)
    slopes = 1.0 / jnp.power(2.0, m)
    if ceil_pow2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes  # [n_heads]


def alibi_bias(n_heads: int, seq_len: int, *, full: bool = False,
               alibi_bias_max: float = 8.0, dtype=jnp.float32) -> jnp.ndarray:
    """Dense ALiBi bias [1, H, 1|S, S] matching `build_alibi_bias`
    (mpt/attention.py:457-464). Causal form depends only on the key position
    (softmax-shift-equivalent to the relative form); `full` gives the
    symmetric -|i-j| form used for prefix-LM / non-causal attention.
    """
    k = jnp.arange(1 - seq_len, 1, dtype=jnp.int32).reshape(1, 1, 1, seq_len)
    if full:
        q = jnp.arange(1 - seq_len, 1, dtype=jnp.int32).reshape(1, 1, seq_len, 1)
        rel = -jnp.abs(k - q)
    else:
        rel = k
    slopes = alibi_slopes(n_heads, alibi_bias_max).reshape(1, n_heads, 1, 1)
    return (rel.astype(jnp.float32) * slopes).astype(dtype)


def causal_mask(s_q: int, s_k: int) -> jnp.ndarray:
    """Boolean [s_q, s_k] mask, True where attention is allowed. Aligned to the
    *end* of the key sequence (for q appended after cached keys), matching
    `scaled_multihead_dot_product_attention` (mpt/attention.py:69-77)."""
    q_pos = jnp.arange(s_q)[:, None] + (s_k - s_q)
    k_pos = jnp.arange(s_k)[None, :]
    return k_pos <= q_pos


def padding_mask_bias(attention_mask: jnp.ndarray,
                      mask_value: float = DEFAULT_MASK_VALUE) -> jnp.ndarray:
    """[B, S] int/bool key-padding mask -> additive [B, 1, 1, S] bias."""
    m = attention_mask.astype(bool)
    return jnp.where(m, 0.0, mask_value)[:, None, None, :].astype(jnp.float32)


def media_cross_attention_mask(
    media_locations: jnp.ndarray,   # [B, T_txt] bool: token == <image>
    num_media: int,                 # T_img (static)
    *,
    only_attend_immediate_media: bool = True,
    attend_previous: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Text→media attention mask for the gated cross-attention blocks.

    Re-derivation of `OtterMaskedCrossAttention.forward`
    (modeling_otter.py:296-330) as a pure function:

      text_time[b, i] = cumulative count of media tokens up to and including i
      media_time[t]   = t + 1
      allowed[b,i,t]  = (text_time == media_time)  if only immediate
                        (text_time >= media_time)  otherwise

    `attend_previous=False` shifts non-media text one media forward and zeroes
    positions past the last media (`modeling_otter.py:303-311`).

    Returns:
      allowed: bool [B, T_txt, T_img] — True where the text token may attend
               to latents of that media slot.
      out_keep: bool [B, T_txt] — False where the attention *output* must be
               zeroed (text with no preceding media, only-immediate mode;
               `modeling_otter.py:326-330`).
    """
    media_locations = media_locations.astype(bool)
    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)
    if not attend_previous:
        text_time = jnp.where(media_locations, text_time, text_time + 1)
        n_media = jnp.sum(media_locations.astype(jnp.int32), axis=-1, keepdims=True)
        text_time = jnp.where(text_time > n_media, 0, text_time)

    media_time = jnp.arange(1, num_media + 1, dtype=jnp.int32)  # [T_img]
    tt = text_time[:, :, None]            # [B, T_txt, 1]
    mt = media_time[None, None, :]        # [1, 1, T_img]
    allowed = (tt == mt) if only_attend_immediate_media else (tt >= mt)

    if only_attend_immediate_media:
        out_keep = text_time > 0
    else:
        out_keep = jnp.ones_like(text_time, dtype=bool)
    return allowed, out_keep


def media_attention_ids(
    media_locations: jnp.ndarray,   # [B, T_txt] bool
    num_media: int,
    num_latents: int,
    *,
    only_attend_immediate_media: bool = True,
    attend_previous: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Media mask as integer ids for the flash kernel's eq/ge comparison.

    Returns (q_ids [B, T_txt], kv_ids [B, T_img*n], out_keep [B, T_txt]).
    Same semantics as `media_cross_attention_mask` but O(S) instead of
    O(S * T_img * n) — the kernel compares ids per tile.
    """
    media_locations = media_locations.astype(bool)
    b = media_locations.shape[0]
    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)
    if not attend_previous:
        text_time = jnp.where(media_locations, text_time, text_time + 1)
        n_media = jnp.sum(media_locations.astype(jnp.int32), axis=-1,
                          keepdims=True)
        text_time = jnp.where(text_time > n_media, 0, text_time)

    media_ids = jnp.repeat(jnp.arange(1, num_media + 1, dtype=jnp.int32),
                           num_latents)
    kv_ids = jnp.broadcast_to(media_ids, (b, num_media * num_latents))
    if only_attend_immediate_media:
        out_keep = text_time > 0
    else:
        out_keep = jnp.ones_like(text_time, dtype=bool)
    return text_time, kv_ids, out_keep


def expand_media_mask_to_latents(allowed: jnp.ndarray, num_latents: int) -> jnp.ndarray:
    """[B, T_txt, T_img] -> [B, 1, T_txt, T_img*n] (broadcast over heads)."""
    b, t_txt, t_img = allowed.shape
    expanded = jnp.repeat(allowed, num_latents, axis=-1)
    return expanded[:, None, :, :]


def mask_to_bias(mask: jnp.ndarray,
                 mask_value: float = DEFAULT_MASK_VALUE) -> jnp.ndarray:
    """Boolean mask (True=keep) -> additive f32 bias."""
    return jnp.where(mask, 0.0, mask_value).astype(jnp.float32)
