"""Pure-jnp reference attention.

This is the numerics ground truth the Pallas kernels are tested against
(SURVEY.md §4: kernel-vs-reference numerics tests across head dims), and the
fallback path on non-TPU backends. Mirrors the math of the reference's
`scaled_multihead_dot_product_attention` (mpt/attention.py:22-84): f32 logits,
additive bias, boolean masks filled with a large negative, f32 softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE, causal_mask


def mha_reference(
    q: jnp.ndarray,                    # [B, H, S_q, D]
    k: jnp.ndarray,                    # [B, H_kv, S_k, D]
    v: jnp.ndarray,                    # [B, H_kv, S_k, D]
    bias: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, S_q, S_k]
    mask: Optional[jnp.ndarray] = None,   # bool, True = attend
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> jnp.ndarray:
    b, h, s_q, d = q.shape
    h_kv, s_k = k.shape[1], k.shape[2]
    if h_kv != h:  # MQA/GQA: broadcast kv heads over query-head groups
        group = h // h_kv
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, mask_value)
    if causal:
        cm = causal_mask(s_q, s_k)[None, None]
        logits = jnp.where(cm, logits, mask_value)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
