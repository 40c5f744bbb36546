"""Ring attention: sequence-parallel attention over a mesh axis.

Long-context headroom beyond the reference (SURVEY.md §5: sequence
parallelism is absent there; §7 stage 9 schedules it): Q and KV are sharded
along the sequence dimension across the mesh axis; KV blocks rotate around
the ring via `ppermute` while each device accumulates its queries'
online-softmax statistics — communication is point-to-point over ICI and
overlaps with the local attention compute (XLA latency-hiding scheduler).

Implemented with shard_map over an existing mesh axis; the local block
attention reuses the flash kernel on TPU (jnp reference elsewhere) through
ops.attention.multi_head_attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE


def _local_attention_stats(q, k, v, q_offset, kv_offset, *, causal,
                           sm_scale, mask_value=DEFAULT_MASK_VALUE):
    """Block attention returning (out_unnormalized, m, l) for online
    combination. q [B,H,Sq,D], k/v [B,H,Sk,D]; offsets are the global
    positions of the first row/col."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if causal:
        rows = q_offset + jnp.arange(q.shape[2])[:, None]
        cols = kv_offset + jnp.arange(k.shape[2])[None, :]
        logits = jnp.where((cols <= rows)[None, None], logits, mask_value)
    m = jnp.max(logits, axis=-1, keepdims=True)           # [B,H,Sq,1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out, m, l


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   *, mesh: Mesh, axis: str = "fsdp",
                   causal: bool = True,
                   sm_scale: Optional[float] = None) -> jnp.ndarray:
    """q/k/v [B, H, S, D] with S sharded over `axis`; returns [B, H, S, D]
    with the same sharding. The ring rotates KV by one neighbor per step
    (jax.lax.ppermute), N-1 steps total."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    n = mesh.shape[axis]
    s_total = q.shape[2]
    assert s_total % n == 0, (s_total, n)
    chunk = s_total // n

    def local_fn(q_l, k_l, v_l):
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk

        def step(carry, i):
            k_blk, v_blk, acc, m, l = carry
            src = (idx - i) % n          # which shard this block came from
            kv_off = src * chunk
            out_b, m_b, l_b = _local_attention_stats(
                q_l, k_blk, v_blk, q_off, kv_off, causal=causal,
                sm_scale=scale)
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_b - m_new)
            acc = acc * alpha + out_b * beta
            l = l * alpha + l_b * beta
            m = m_new
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (k_blk, v_blk, acc, m, l), None

        # derive init carries from q_l so shard_map marks them as varying
        # over the ring axis (scan requires carry types to match exactly)
        acc0 = q_l.astype(jnp.float32) * 0.0
        m0 = acc0[..., :1] - jnp.inf
        l0 = acc0[..., :1]
        (k_blk, v_blk, acc, m, l), _ = jax.lax.scan(
            step, (k_l, v_l, acc0, m0, l0), jnp.arange(n))
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_l.dtype)

    spec = P(None, None, axis, None)
    return jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
