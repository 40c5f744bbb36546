"""Ring attention: sequence-parallel attention over a mesh axis.

Long-context headroom beyond the reference (SURVEY.md §5: sequence
parallelism is absent there; §7 stage 9 schedules it): Q and KV are sharded
along the sequence dimension across the mesh axis; KV blocks rotate around
the ring via `ppermute` while each device accumulates its queries'
online-softmax statistics — communication is point-to-point over ICI and
overlaps with the local attention compute (XLA latency-hiding scheduler).

Supports the full decoder self-attention surface of the training path
(models/decoder.py Decoder.__call__):
  - causal masking with global offsets,
  - COLUMN-FORM additive bias [B|1, H|1, 1, S] (the decoder's ALiBi form,
    mpt/attention.py:457-464 equivalent): per-row-uniform shifts cancel in
    the online softmax exactly as in a single softmax, and the bias block
    rotates around the ring with its KV block,
  - eq/ge segment-id masks ([B, S] ids; kv ids rotate with KV).

Implemented with shard_map over a mesh axis (default the dedicated "seq"
axis, parallel/mesh.py); batch stays sharded over (data, fsdp) and heads
over "tensor" inside the shard_map, so sp composes with dp/fsdp/tp without
involuntary all-gathers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE


def _local_attention_stats(q, k, v, q_offset, kv_offset, *, causal,
                           sm_scale, bias=None, q_ids=None, kv_ids=None,
                           ids_mode="eq", mask_value=DEFAULT_MASK_VALUE):
    """Block attention returning (out_unnormalized, m, l) for online
    combination. q [B,H,Sq,D], k/v [B,H_kv,Sk,D] (MQA/GQA kv heads are
    broadcast here, inside the remat, so the ring rotates and the scan
    carries only the model's actual H_kv heads); offsets are the global
    positions of the first row/col. bias [B|1,H|1,1,Sk] column-form."""
    h, h_kv = q.shape[1], k.shape[1]
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=1)
        v = jnp.repeat(v, h // h_kv, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    allowed = None
    if causal:
        rows = q_offset + jnp.arange(q.shape[2])[:, None]
        cols = kv_offset + jnp.arange(k.shape[2])[None, :]
        allowed = (cols <= rows)[None, None]
    if q_ids is not None:
        qi = q_ids[:, None, :, None].astype(jnp.int32)
        ki = kv_ids[:, None, None, :].astype(jnp.int32)
        idm = (qi == ki) if ids_mode == "eq" else (qi >= ki)
        allowed = idm if allowed is None else (allowed & idm)
    if allowed is not None:
        logits = jnp.where(allowed, logits, mask_value)
    m = jnp.max(logits, axis=-1, keepdims=True)           # [B,H,Sq,1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out, m, l


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   *, mesh: Mesh, axis: str = "seq",
                   causal: bool = True,
                   sm_scale: Optional[float] = None,
                   bias: Optional[jnp.ndarray] = None,
                   q_ids: Optional[jnp.ndarray] = None,
                   kv_ids: Optional[jnp.ndarray] = None,
                   ids_mode: str = "eq") -> jnp.ndarray:
    """q/k/v [B, H, S, D] with S sharded over `axis`; returns [B, H, S, D]
    with the same sharding. The ring rotates KV (and the column bias /
    kv_ids blocks with it) by one neighbor per step (jax.lax.ppermute),
    N-1 rotations total.

    bias must be COLUMN-FORM [B|1, H|1, 1, S]: a per-column additive term
    (ALiBi relative-to-last-row). Row-dependent biases would need [Sq, Sk]
    blocks; the decoder never produces one outside the decode path.
    """
    from otter_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    n = mesh.shape[axis]
    b, h, s_total = q.shape[0], q.shape[1], q.shape[2]
    assert s_total % n == 0, (s_total, n)
    if bias is not None:
        assert bias.ndim == 4 and bias.shape[2] == 1, bias.shape
    if (q_ids is None) != (kv_ids is None):
        raise ValueError("q_ids and kv_ids must be passed together")
    chunk = s_total // n
    has_bias, has_ids = bias is not None, q_ids is not None

    # batch/head specs mirror the ambient activation sharding so sp
    # composes with dp/fsdp/tp (a None here would all-gather those dims)
    batch_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS)
                       if a != axis and a in mesh.shape)

    def dim(size, names):
        """Use `names` for this dim only when it divides; else replicate."""
        if not names:
            return None
        sz = 1
        for a in (names if isinstance(names, tuple) else (names,)):
            sz *= mesh.shape.get(a, 1)
        return names if sz > 1 and size % sz == 0 else None

    bspec = dim(b, batch_axes)
    tsize = mesh.shape.get(TENSOR_AXIS, 1)
    hspec = dim(h, TENSOR_AXIS) if tsize > 1 else None
    h_kv = k.shape[1]
    kv_hspec = dim(h_kv, TENSOR_AXIS) if tsize > 1 else None

    qkv_spec = P(bspec, hspec, axis, None)
    kv_spec = P(bspec, kv_hspec, axis, None)
    operands = [q, k, v]
    in_specs = [qkv_spec, kv_spec, kv_spec]
    if has_bias:
        operands.append(bias)
        in_specs.append(P(dim(bias.shape[0], batch_axes),
                          dim(bias.shape[1], TENSOR_AXIS)
                          if tsize > 1 else None, None, axis))
    if has_ids:
        operands.extend([q_ids, kv_ids])
        ids_spec = P(dim(q_ids.shape[0], batch_axes), axis)
        in_specs.extend([ids_spec, ids_spec])

    def local_fn(*args):
        it = iter(args)
        q_l, k_l, v_l = next(it), next(it), next(it)
        bias_l = next(it) if has_bias else None
        qid_l = next(it) if has_ids else None
        kid_l = next(it) if has_ids else None
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk
        perm = [(j, (j + 1) % n) for j in range(n)]

        # rematerialize each block's stats in the backward pass: without
        # this, AD through the scan persists every block's [B,H,Sq,Sk]
        # probability matrix — O(S²/n) per device per layer, the exact
        # quadratic footprint sequence parallelism exists to avoid. With
        # it, the residuals are the rotated KV blocks and O(S·D) carries.
        # (The scan still saves each step's rotated KV pair, i.e. the
        # full global KV of ONE layer while that layer's backward runs —
        # a per-layer transient under the trainers' per-layer remat. A
        # two-pass custom VJP that re-rotates KV in backward would cut
        # it to O(S·D/N); scheduled, not yet needed at validated scales.)
        local_stats = jax.checkpoint(
            lambda q_, k_, v_, kv_off, b_, ki_: _local_attention_stats(
                q_, k_, v_, q_off, kv_off, causal=causal, sm_scale=scale,
                bias=b_, q_ids=qid_l, kv_ids=ki_, ids_mode=ids_mode))

        def merge(acc, m, l, out_b, m_b, l_b):
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_b - m_new)
            return (acc * alpha + out_b * beta, m_new,
                    l * alpha + l_b * beta)

        # own (diagonal) block first, then N-1 rotate-then-compute steps:
        # no dead final rotation, and the online stats start from real
        # values (no -inf bootstrap carry)
        acc, m, l = local_stats(q_l, k_l, v_l, q_off, bias_l, kid_l)

        def step(carry, i):
            k_blk, v_blk, bias_blk, kid_blk, acc, m, l = carry
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            if bias_blk is not None:
                bias_blk = jax.lax.ppermute(bias_blk, axis, perm)
            if kid_blk is not None:
                kid_blk = jax.lax.ppermute(kid_blk, axis, perm)
            src = (idx - i) % n          # which shard this block came from
            kv_off = src * chunk
            out_b, m_b, l_b = local_stats(q_l, k_blk, v_blk, kv_off,
                                          bias_blk, kid_blk)
            acc, m, l = merge(acc, m, l, out_b, m_b, l_b)
            return (k_blk, v_blk, bias_blk, kid_blk, acc, m, l), None

        (_, _, _, _, acc, m, l), _ = jax.lax.scan(
            step, (k_l, v_l, bias_l, kid_l, acc, m, l),
            jnp.arange(1, n))
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_l.dtype)

    return jax.shard_map(local_fn, mesh=mesh,
                         in_specs=tuple(in_specs),
                         out_specs=qkv_spec)(*operands)
