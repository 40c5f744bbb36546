"""Attention dispatcher: Pallas kernel on TPU, jnp reference elsewhere.

The models call this single entry point; it replaces the reference's
`attn_config["attn_impl"]` torch/flash/triton selection
(`src/otter_ai/models/mpt/attention.py:22-222`).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from otter_tpu.ops import attention_ref, flash_attention as fa
from otter_tpu.ops.masks import DEFAULT_MASK_VALUE

# sequence-parallel routing state: a stack of (mesh, axis) pushed by the
# `sequence_parallel` context manager (set by the train step while TRACING
# its jitted step — the decision is baked into the traced graph, so the
# context must wrap the first call that triggers tracing). Thread-local:
# a serving thread tracing a prefill must not see a trainer thread's ring
# routing (and vice versa).
import threading


class _SeqParallelState(threading.local):
    def __init__(self):
        self.stack = []


_SEQ_PARALLEL = _SeqParallelState()


@contextlib.contextmanager
def sequence_parallel(mesh, axis: str = "seq"):
    """Route eligible causal self-attention through the ring-attention
    sequence-parallel path (ops/ring_attention.py) while tracing under
    this context. Eligible = causal, full-sequence (S_q == S_kv > 1,
    i.e. training/prefill, never cached decode), S divisible by the mesh's
    `axis` extent, and any additive bias in column form [.., 1, S] (the
    decoder's ALiBi form). Everything else falls through to the normal
    impl untouched."""
    if mesh.shape.get(axis, 1) <= 1:
        yield
        return
    _SEQ_PARALLEL.stack.append((mesh, axis))
    try:
        yield
    finally:
        _SEQ_PARALLEL.stack.pop()


def _maybe_ring(q, k, v, bias, q_ids, kv_ids, ids_mode, causal, sm_scale):
    """The ring path when the sequence_parallel context applies, else None."""
    if not _SEQ_PARALLEL.stack or not causal:
        return None
    mesh, axis = _SEQ_PARALLEL.stack[-1]
    n = mesh.shape[axis]
    s_q, s_k = q.shape[2], k.shape[2]
    if s_q != s_k or s_q <= 1:
        return None
    if s_q % n != 0:
        # silent fallthrough here would run FULL attention on
        # seq-sharded activations — the exact O(S²) footprint (plus a
        # GSPMD KV all-gather) sp exists to avoid, with no diagnostic
        raise ValueError(
            f"sequence_parallel: sequence length {s_q} is not divisible "
            f"by the '{axis}' mesh axis ({n}); pad the sequence to a "
            f"multiple of sp or lower --sp")
    if bias is not None and not (bias.ndim == 4 and bias.shape[2] == 1):
        return None
    from otter_tpu.ops.ring_attention import ring_attention
    return ring_attention(q, k, v, mesh=mesh, axis=axis, causal=True,
                          sm_scale=sm_scale, bias=bias, q_ids=q_ids,
                          kv_ids=kv_ids, ids_mode=ids_mode)


def _default_impl() -> str:
    # OTTER_ATTN_IMPL=ref forces the naive XLA einsum-softmax-einsum path
    # on TPU too — the A/B lever for quantifying what the Pallas kernel
    # buys (the reference's OtterHD headline is exactly this comparison:
    # flash-attn-2 + fused ops vs the vanilla HF implementation,
    # docs/OtterHD.md:33-39; tools/bench_train_otterhd.py)
    import os
    forced = os.environ.get("OTTER_ATTN_IMPL")
    if forced:
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "ref"


def multi_head_attention(
    q: jnp.ndarray,                      # [B, H, S_q, D]
    k: jnp.ndarray,                      # [B, H_kv, S_k, D]
    v: jnp.ndarray,                      # [B, H_kv, S_k, D]
    *,
    bias: Optional[jnp.ndarray] = None,  # [B|1, H|1, S_q|1, S_k] additive
    q_ids: Optional[jnp.ndarray] = None,   # int32 [B, S_q]
    kv_ids: Optional[jnp.ndarray] = None,  # int32 [B, S_k]
    ids_mode: str = "eq",
    causal: bool = False,
    sm_scale: Optional[float] = None,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    impl = impl or _default_impl()
    # ring first, BEFORE the MQA/GQA head broadcast: the ring rotates and
    # carries the model's actual kv heads (broadcast happens inside its
    # remat'd local block), h/h_kv times less ICI traffic and residual
    # memory for multiquery models
    ring = _maybe_ring(q, k, v, bias, q_ids, kv_ids, ids_mode, causal,
                       sm_scale)
    if ring is not None:
        return ring

    h, h_kv = q.shape[1], k.shape[1]
    if h_kv != h:  # MQA/GQA: replicate kv heads (falcon multiquery)
        k = jnp.repeat(k, h // h_kv, axis=1)
        v = jnp.repeat(v, h // h_kv, axis=1)

    # Sub-tile workloads (decode-time gated xattn: q_len 1 against 64
    # perceiver latents; speculative verify windows: q_len gamma+1) sit
    # below the kernel's 8x128 minimum tile — the pallas_call launch floor
    # dwarfs the math, and the standalone kernel blocks XLA from fusing
    # the projections around it. The einsum path inlines into the
    # surrounding graph instead (measured on the decode-xattn ablation:
    # the q_len=1 Pallas launch is the block's single largest cost).
    # (an explicit OTTER_ATTN_IMPL=pallas keeps the kernel even here — the
    # A/B lever for measuring exactly this routing decision)
    import os
    if (impl == "pallas" and q.shape[2] <= 8 and k.shape[2] <= 256
            and os.environ.get("OTTER_ATTN_IMPL") != "pallas"):
        impl = "ref"

    if impl == "pallas":
        return fa.flash_attention(
            q, k, v, bias, q_ids, kv_ids, causal=causal, sm_scale=sm_scale,
            ids_mode=ids_mode, interpret=interpret)
    elif impl == "ref":
        mask = None
        if q_ids is not None:
            qi = q_ids[:, None, :, None].astype(jnp.int32)
            ki = kv_ids[:, None, None, :].astype(jnp.int32)
            mask = (qi == ki) if ids_mode == "eq" else (qi >= ki)
        return attention_ref.mha_reference(
            q, k, v, bias=bias, mask=mask, causal=causal, sm_scale=sm_scale,
            mask_value=DEFAULT_MASK_VALUE)
    raise ValueError(f"unknown attention impl {impl!r}")
