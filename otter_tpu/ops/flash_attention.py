"""Pallas TPU flash-attention kernel family.

TPU-native replacement for the reference's four attention backends
(`src/otter_ai/models/mpt/flash_attn_triton.py:57-1014` Triton kernel,
flash-attn CUDA, xformers `memory_efficient_attention`, and the torch
fallback `mpt/attention.py:22-84`). One kernel covers:

  - causal self-attention (decoder)
  - additive bias (ALiBi `mpt/attention.py:457-464`; arbitrary biases)
  - integer-id masks compared per (q, kv) pair:
      mode "eq": segment-id padding masks, and the Flamingo
                 only-attend-immediate-media mask
      mode "ge": the attend-all-previous-media mask
    (re-deriving `modeling_otter.py:296-330` as an id comparison instead of a
    materialized (S_q, S_kv) mask)
  - non-causal (ViT / perceiver) attention
  - fwd + bwd (custom VJP, separate dKV and dQ kernels, LSE residuals)

Design follows the blockwise online-softmax scheme of JAX's reference TPU
flash attention (jax.experimental.pallas.ops.tpu.flash_attention): f32
softmax statistics in VMEM scratch, lane-replicated LSE residuals, causal
tile skipping, transposes folded into MXU dot_generals in the backward pass.

Bias gradients are NOT computed (all biases in this framework — ALiBi,
padding, media masks — are non-trainable); the VJP returns zeros for bias.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE

NUM_LANES = 128
NUM_SUBLANES = 8
# kv-id value that matches nothing under "eq" or "ge" against any real q id.
PAD_ID = jnp.iinfo(jnp.int32).max // 2


class BlockSizes(NamedTuple):
    # defaults from a v5e sweep on the triangle grid (b4 h32 s2048 d128
    # causal+ALiBi: fwd 1.80 ms / 76 TFLOP/s, fwd+bwd 4.15 ms / 116 TFLOP/s
    # causal accounting)
    block_q: int = 1024
    block_k: int = 1024
    block_q_dkv: int = 1024
    block_k_dkv: int = 512
    block_q_dq: int = 1024
    block_k_dq: int = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fit_block(pref: int, n: int) -> int:
    """Largest power-of-two block <= pref that divides n (n is a multiple of
    MIN 128, so 128 always fits)."""
    b = min(pref, n)
    while n % b != 0:
        b //= 2
    return max(b, 1)


def _id_mask(q_ids, kv_ids, ids_mode: str):
    """q_ids: [bq, 1] col, kv_ids: [1, bk] row -> bool [bq, bk] (True=attend)."""
    if ids_mode == "eq":
        return q_ids == kv_ids
    elif ids_mode == "ge":
        return q_ids >= kv_ids
    raise ValueError(f"ids_mode={ids_mode}")


# ─────────────────────────────── forward ───────────────────────────────


def _fwd_kernel(*refs, causal: bool, sm_scale: float, ids_mode: str,
                has_bias: bool, has_ids: bool, bcast_bias_q: bool,
                mask_value: float, num_kv_blocks: int,
                block_q: int, block_k: int, triangle: bool):
    it = iter(refs)
    map_ref = next(it) if triangle else None
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    bias_ref = next(it) if has_bias else None
    q_ids_ref = next(it) if has_ids else None
    kv_ids_ref = next(it) if has_ids else None
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)

    if triangle:
        # flattened lower-triangle grid: only valid causal tiles are ever
        # visited, so dead tiles cost no grid step (the clamped-DMA scheme
        # below still paid the per-step floor for skipped tiles — measured
        # at the full-grid wall time despite doing half the FLOPs)
        t = pl.program_id(2)
        qi = map_ref[0, t]
        ki = map_ref[1, t]
    else:
        qi = pl.program_id(2)
        ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal and not triangle:
        # run only if some q position >= first k position of this tile
        should_run = ((qi + 1) * block_q - 1) >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        # base-2 softmax: q arrives pre-scaled by sm_scale*log2(e) and the
        # bias pre-scaled by log2(e) (one VPU pass + one transcendental
        # saved per tile vs scale-multiply + natural exp)
        q = q_ref[0, 0]                       # [bq, d]
        k = k_ref[0, 0]                       # [bk, d]
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
        if has_bias:
            b = bias_ref[0, 0]                # [bq|1, bk]
            s += b.astype(jnp.float32)

        mask = None
        if has_ids:
            qids = q_ids_ref[0][:, :1]        # [bq, 1]
            kids = kv_ids_ref[0][:1, :]       # [1, bk]
            mask = _id_mask(qids, kids, ids_mode)
        if causal:
            rows = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            cols = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
                + ki * block_k
            cmask = cols <= rows
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s = jnp.where(mask, s, mask_value)

        m_prev = m_scr[...]                   # [bq, 128] lane-replicated
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # [bq, 1]
        m_next = jnp.maximum(m_prev, lax.broadcast_in_dim(
            m_curr, (block_q, NUM_LANES), (0, 1)))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - lax.broadcast_in_dim(
            m_next[:, :1], (block_q, block_k), (0, 1)))
        l_curr = jnp.sum(p, axis=1, keepdims=True)       # [bq, 1]
        l_next = alpha * l_prev + lax.broadcast_in_dim(
            l_curr, (block_q, NUM_LANES), (0, 1))
        m_scr[...] = m_next
        l_scr[...] = l_next

        d = q.shape[-1]
        v = v_ref[0, 0]
        o_curr = lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * lax.broadcast_in_dim(
            alpha[:, :1], (block_q, d), (0, 1)) + o_curr

    if causal:
        last_k = jnp.minimum(num_kv_blocks - 1,
                             ((qi + 1) * block_q - 1) // block_k)
    else:
        last_k = num_kv_blocks - 1

    @pl.when(ki == last_k)
    def _store():
        d = o_ref.shape[-1]
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * lax.broadcast_in_dim(
            l_inv[:, :1], (block_q, d), (0, 1))).astype(o_ref.dtype)
        # internals are base-2; the stored LSE stays in natural-log units
        # (the backward kernels recompute with natural exp):
        # lse = ln2 * (m2 + log2 l)
        lse = 0.6931471805599453 * (
            m_scr[...] + jnp.log2(jnp.where(l == 0.0, 1.0, l)))
        lse_ref[0, 0] = lse.astype(lse_ref.dtype)


def _triangle_maps(num_q: int, num_kv: int, bq: int, bk: int):
    """Flat enumeration of the valid causal tiles, row-major: for each q
    block i, kv blocks 0..last_k(i). Returns an int32 [2, T] (qi; ki)."""
    qis, kis = [], []
    for i in range(num_q):
        lk = min(num_kv - 1, ((i + 1) * bq - 1) // bk)
        for j in range(lk + 1):
            qis.append(i)
            kis.append(j)
    import numpy as np
    return np.asarray([qis, kis], dtype=np.int32)


def _fwd(q, k, v, bias, q_ids, kv_ids, *, causal, sm_scale, ids_mode,
         block_sizes: BlockSizes, mask_value, interpret, triangle=True):
    batch, heads, s_q, d = q.shape
    s_k = k.shape[2]
    # base-2 softmax: fold sm_scale*log2(e) into q and log2(e) into the
    # bias so the kernel skips the scale pass and uses exp2
    LOG2E = 1.4426950408889634
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    if bias is not None:
        bias = bias * jnp.asarray(LOG2E, bias.dtype)
    bq = _fit_block(block_sizes.block_q, s_q)
    bk = _fit_block(block_sizes.block_k, s_k)
    num_q, num_kv = s_q // bq, s_k // bk
    has_bias = bias is not None
    has_ids = q_ids is not None
    bcast_bias_q = has_bias and bias.shape[2] == 1
    triangle = triangle and causal and num_q * num_kv > 1

    if triangle:
        # flattened lower-triangle grid (splash-attention style): the grid
        # visits ONLY valid causal tiles, driven by a scalar-prefetched
        # [2, T] (qi; ki) lookup table. The clamped-DMA scheme (else branch)
        # elides dead tiles' loads but still pays their grid-step floor —
        # measured at the full-grid wall time despite half the FLOPs.
        tri = _triangle_maps(num_q, num_kv, bq, bk)
        num_steps = tri.shape[1]
        grid = (batch, heads, num_steps)

        def q_i(b, h, t, m):
            return (b, h, m[0, t], 0)

        def kv_i(b, h, t, m):
            return (b, h, m[1, t], 0)
    else:
        grid = (batch, heads, num_q, num_kv)

        if causal:
            # skipped upper-triangle tiles clamp their kv block index to the
            # last VALID block of the row: consecutive identical block
            # indices make Mosaic elide the DMA, so dead tiles cost no
            # bandwidth (but still a grid step each).
            def kv_j(i, j):
                return jnp.minimum(j, ((i + 1) * bq - 1) // bk)
        else:
            def kv_j(i, j):
                return j

        def q_i(b, h, i, j):
            return (b, h, i, 0)

        def kv_i(b, h, i, j):
            return (b, h, kv_j(i, j), 0)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_i),
        pl.BlockSpec((1, 1, bk, d), kv_i),
        pl.BlockSpec((1, 1, bk, d), kv_i),
    ]
    args = [q, k, v]
    if has_bias:
        bb, bh = bias.shape[0], bias.shape[1]
        bq_bias = 1 if bcast_bias_q else bq

        def bias_i(*ix, bb=bb, bh=bh, bc=bcast_bias_q):
            b, h = ix[0], ix[1]
            qb, kb = q_i(*ix)[2], kv_i(*ix)[2]
            return (b if bb > 1 else 0, h if bh > 1 else 0,
                    0 if bc else qb, kb)

        in_specs.append(pl.BlockSpec((1, 1, bq_bias, bk), bias_i))
        args.append(bias)
    if has_ids:
        # q_ids: [B, S_q, NUM_LANES] lane-replicated; kv_ids: [B, NUM_SUBLANES, S_k]
        def qids_i(*ix):
            return (ix[0], q_i(*ix)[2], 0)

        def kids_i(*ix):
            return (ix[0], 0, kv_i(*ix)[2])

        in_specs.append(pl.BlockSpec((1, bq, NUM_LANES), qids_i))
        in_specs.append(pl.BlockSpec((1, NUM_SUBLANES, bk), kids_i))
        args.extend([q_ids, kv_ids])

    out_shape = [
        jax.ShapeDtypeStruct((batch, heads, s_q, d), q.dtype),
        jax.ShapeDtypeStruct((batch, heads, s_q, NUM_LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, d), q_i),
        pl.BlockSpec((1, 1, bq, NUM_LANES), q_i),
    ]

    kernel = functools.partial(
        _fwd_kernel, causal=causal, sm_scale=sm_scale, ids_mode=ids_mode,
        has_bias=has_bias, has_ids=has_ids, bcast_bias_q=bcast_bias_q,
        mask_value=mask_value, num_kv_blocks=num_kv, block_q=bq, block_k=bk,
        triangle=triangle)

    scratch_shapes = [
        pltpu.VMEM((bq, NUM_LANES), jnp.float32),
        pltpu.VMEM((bq, NUM_LANES), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]

    if triangle:
        o, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(tri, *args)
    else:
        o, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(*args)
    return o, lse


# ─────────────────────────────── backward ───────────────────────────────


def _bwd_dkv_kernel(*refs, causal: bool, sm_scale: float, ids_mode: str,
                    has_bias: bool, has_ids: bool, bcast_bias_q: bool,
                    mask_value: float, num_q_blocks: int,
                    block_q: int, block_k: int, triangle: bool):
    it = iter(refs)
    map_ref = next(it) if triangle else None
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    bias_ref = next(it) if has_bias else None
    q_ids_ref = next(it) if has_ids else None
    kv_ids_ref = next(it) if has_ids else None
    lse_ref = next(it)
    di_ref = next(it)
    do_ref = next(it)
    dk_ref = next(it)
    dv_ref = next(it)
    dk_scr = next(it)
    dv_scr = next(it)

    if triangle:
        t = pl.program_id(2)
        ki = map_ref[0, t]
        qi = map_ref[1, t]
        # first valid q block for this kv column
        first_q = (ki * block_k) // block_q
    else:
        ki = pl.program_id(2)
        qi = pl.program_id(3)
        first_q = 0

    @pl.when(qi == first_q)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal and not triangle:
        should_run = ((qi + 1) * block_q - 1) >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]                        # [bq, d]
        k = k_ref[0, 0]                        # [bk, d]
        v = v_ref[0, 0]
        do = do_ref[0, 0]                      # [bq, d]
        lse = lse_ref[0, 0]                    # [bq, 128]
        di = di_ref[0, 0]                      # [bq, 128]

        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
        if sm_scale != 1.0:
            s *= sm_scale
        if has_bias:
            s += bias_ref[0, 0].astype(jnp.float32)

        mask = None
        if has_ids:
            qids = q_ids_ref[0][:, :1]
            kids = kv_ids_ref[0][:1, :]
            mask = _id_mask(qids, kids, ids_mode)
        if causal:
            rows = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            cols = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
                + ki * block_k
            cmask = cols <= rows
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s = jnp.where(mask, s, mask_value)

        p = jnp.exp(s - lax.broadcast_in_dim(lse[:, :1], (block_q, block_k),
                                             (0, 1)))
        # dv[bk, d] += p^T @ do  (transpose folded into the MXU contraction)
        dv_scr[...] += lax.dot_general(
            p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp[bq, bk] = do @ v^T
        dp = lax.dot_general(do.astype(jnp.float32), v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - lax.broadcast_in_dim(di[:, :1], (block_q, block_k),
                                            (0, 1)))
        if sm_scale != 1.0:
            ds *= sm_scale
        # dk[bk, d] += ds^T @ q
        dk_scr[...] += lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(*refs, causal: bool, sm_scale: float, ids_mode: str,
                   has_bias: bool, has_ids: bool, bcast_bias_q: bool,
                   mask_value: float, num_kv_blocks: int,
                   block_q: int, block_k: int, triangle: bool):
    it = iter(refs)
    map_ref = next(it) if triangle else None
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    bias_ref = next(it) if has_bias else None
    q_ids_ref = next(it) if has_ids else None
    kv_ids_ref = next(it) if has_ids else None
    lse_ref = next(it)
    di_ref = next(it)
    do_ref = next(it)
    dq_ref = next(it)
    dq_scr = next(it)

    if triangle:
        t = pl.program_id(2)
        qi = map_ref[0, t]
        ki = map_ref[1, t]
    else:
        qi = pl.program_id(2)
        ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if causal and not triangle:
        should_run = ((qi + 1) * block_q - 1) >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]

        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s *= sm_scale
        if has_bias:
            s += bias_ref[0, 0].astype(jnp.float32)

        mask = None
        if has_ids:
            qids = q_ids_ref[0][:, :1]
            kids = kv_ids_ref[0][:1, :]
            mask = _id_mask(qids, kids, ids_mode)
        if causal:
            rows = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            cols = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
                + ki * block_k
            cmask = cols <= rows
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s = jnp.where(mask, s, mask_value)

        p = jnp.exp(s - lax.broadcast_in_dim(lse[:, :1], (block_q, block_k),
                                             (0, 1)))
        dp = lax.dot_general(do.astype(jnp.float32), v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - lax.broadcast_in_dim(di[:, :1], (block_q, block_k),
                                            (0, 1)))
        if sm_scale != 1.0:
            ds *= sm_scale
        dq_scr[...] += lax.dot_general(ds, k.astype(jnp.float32),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    if causal and triangle:
        last_k = jnp.minimum(num_kv_blocks - 1,
                             ((qi + 1) * block_q - 1) // block_k)
    else:
        last_k = num_kv_blocks - 1

    @pl.when(ki == last_k)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_pallas_call(kernel, *, grid4, q_block_idx, kv_block_idx, triangle,
                     tri_map, in_specs_fn, out_shape,
                     scratch_shapes, interpret, args):
    """Shared launch plumbing for the two backward kernels: full 4-d grid
    or flattened triangle grid with a scalar-prefetched map."""
    if triangle:
        grid = (grid4[0], grid4[1], tri_map.shape[1])
        in_specs, o_specs = in_specs_fn(q_block_idx, kv_block_idx)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=o_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(tri_map, *args)
    in_specs, o_specs = in_specs_fn(q_block_idx, kv_block_idx)
    return pl.pallas_call(
        kernel,
        grid=grid4,
        in_specs=in_specs,
        out_specs=o_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*args)


def _bwd(causal, sm_scale, ids_mode, block_sizes, mask_value, interpret,
         res, g, triangle=True):
    q, k, v, bias, q_ids, kv_ids, o, lse = res
    if lse.ndim == 3:   # compact [b,h,s] residual -> lane-replicated
        lse = jnp.broadcast_to(lse[..., None],
                               (*lse.shape, NUM_LANES))
    do = g
    batch, heads, s_q, d = q.shape
    s_k = k.shape[2]
    bq_dkv = _fit_block(block_sizes.block_q_dkv, s_q)
    bk_dkv = _fit_block(block_sizes.block_k_dkv, s_k)
    bq_dq = _fit_block(block_sizes.block_q_dq, s_q)
    bk_dq = _fit_block(block_sizes.block_k_dq, s_k)
    has_bias = bias is not None
    has_ids = q_ids is not None
    bcast_bias_q = has_bias and bias.shape[2] == 1
    triangle = triangle and causal

    # di = rowsum(o * do), lane-replicated like lse
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1, keepdims=True)                    # [b, h, s_q, 1]
    di = jnp.broadcast_to(di, (*di.shape[:3], NUM_LANES))

    common = dict(causal=causal, sm_scale=sm_scale, ids_mode=ids_mode,
                  has_bias=has_bias, has_ids=has_ids,
                  bcast_bias_q=bcast_bias_q, mask_value=mask_value)

    def specs_for(bq, bk, q_idx, kv_idx):
        """in_specs (q,k,v,[bias],[ids],lse,di,do) given index functions that
        return the q/kv block index from the grid indices."""
        def qb(*ix):
            return (ix[0], ix[1], q_idx(*ix), 0)

        def kb(*ix):
            return (ix[0], ix[1], kv_idx(*ix), 0)

        bspecs = [
            pl.BlockSpec((1, 1, bq, d), qb),
            pl.BlockSpec((1, 1, bk, d), kb),
            pl.BlockSpec((1, 1, bk, d), kb),
        ]
        if has_bias:
            bb, bh = bias.shape[0], bias.shape[1]
            bq_bias = 1 if bcast_bias_q else bq

            def bias_idx(*ix, bb=bb, bh=bh, bc=bcast_bias_q):
                return (ix[0] if bb > 1 else 0, ix[1] if bh > 1 else 0,
                        0 if bc else q_idx(*ix), kv_idx(*ix))

            bspecs.append(pl.BlockSpec((1, 1, bq_bias, bk), bias_idx))
        if has_ids:
            bspecs.append(pl.BlockSpec(
                (1, bq, NUM_LANES), lambda *ix: (ix[0], q_idx(*ix), 0)))
            bspecs.append(pl.BlockSpec(
                (1, NUM_SUBLANES, bk), lambda *ix: (ix[0], 0, kv_idx(*ix))))
        bspecs.extend([
            pl.BlockSpec((1, 1, bq, NUM_LANES), qb),
            pl.BlockSpec((1, 1, bq, NUM_LANES), qb),
            pl.BlockSpec((1, 1, bq, d), qb),
        ])
        return bspecs, qb, kb

    def make_args():
        a = [q, k, v]
        if has_bias:
            a.append(bias)
        if has_ids:
            a.extend([q_ids, kv_ids])
        a.extend([lse, di, do])
        return a

    # ── dK/dV: kv-major iteration, q innermost per kv column ──
    num_q, num_kv = s_q // bq_dkv, s_k // bk_dkv
    if triangle:
        # column-major triangle: for each ki, all valid qi (ascending)
        import numpy as np
        kis, qis = [], []
        for j in range(num_kv):
            for i in range(num_q):
                if (i + 1) * bq_dkv - 1 >= j * bk_dkv:
                    kis.append(j)
                    qis.append(i)
        tri_dkv = np.asarray([kis, qis], dtype=np.int32)

        def q_idx_dkv(b, h, t, m):
            return m[1, t]

        def kv_idx_dkv(b, h, t, m):
            return m[0, t]
    else:
        tri_dkv = None

        def q_idx_dkv(b, h, j, i):
            return i

        def kv_idx_dkv(b, h, j, i):
            return j

    def in_specs_dkv(q_idx, kv_idx):
        bspecs, qb, kb = specs_for(bq_dkv, bk_dkv, q_idx, kv_idx)
        return bspecs, [pl.BlockSpec((1, 1, bk_dkv, d), kb),
                        pl.BlockSpec((1, 1, bk_dkv, d), kb)]

    dk, dv = _bwd_pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q_blocks=num_q,
                          block_q=bq_dkv, block_k=bk_dkv,
                          triangle=triangle, **common),
        grid4=(batch, heads, num_kv, num_q),
        q_block_idx=q_idx_dkv, kv_block_idx=kv_idx_dkv,
        triangle=triangle, tri_map=tri_dkv,
        in_specs_fn=in_specs_dkv,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk_dkv, d), jnp.float32),
            pltpu.VMEM((bk_dkv, d), jnp.float32),
        ],
        interpret=interpret,
        args=make_args(),
    )

    # ── dQ: q-major iteration, kv innermost per q row ──
    num_q, num_kv = s_q // bq_dq, s_k // bk_dq
    if triangle:
        tri_dq = _triangle_maps(num_q, num_kv, bq_dq, bk_dq)

        def q_idx_dq(b, h, t, m):
            return m[0, t]

        def kv_idx_dq(b, h, t, m):
            return m[1, t]
    else:
        tri_dq = None

        def q_idx_dq(b, h, i, j):
            return i

        def kv_idx_dq(b, h, i, j):
            return j

    def in_specs_dq(q_idx, kv_idx):
        bspecs, qb, kb = specs_for(bq_dq, bk_dq, q_idx, kv_idx)
        return bspecs, pl.BlockSpec((1, 1, bq_dq, d), qb)

    dq = _bwd_pallas_call(
        functools.partial(_bwd_dq_kernel, num_kv_blocks=num_kv,
                          block_q=bq_dq, block_k=bk_dq,
                          triangle=triangle, **common),
        grid4=(batch, heads, num_q, num_kv),
        q_block_idx=q_idx_dq, kv_block_idx=kv_idx_dq,
        triangle=triangle, tri_map=tri_dq,
        in_specs_fn=in_specs_dq,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq_dq, d), jnp.float32)],
        interpret=interpret,
        args=make_args(),
    )

    dbias = jnp.zeros_like(bias) if bias is not None else None
    dq_ids = jnp.zeros_like(q_ids) if q_ids is not None else None
    dkv_ids = jnp.zeros_like(kv_ids) if kv_ids is not None else None
    return dq, dk, dv, dbias, dq_ids, dkv_ids


@functools.lru_cache(maxsize=None)
def _make_flash_attention(causal: bool, sm_scale: float, ids_mode: str,
                          block_sizes: BlockSizes, mask_value: float,
                          interpret: bool):
    @jax.custom_vjp
    def fa(q, k, v, bias, q_ids, kv_ids):
        o, _ = _fwd(q, k, v, bias, q_ids, kv_ids, causal=causal,
                    sm_scale=sm_scale, ids_mode=ids_mode,
                    block_sizes=block_sizes, mask_value=mask_value,
                    interpret=interpret)
        return o

    def fa_fwd(q, k, v, bias, q_ids, kv_ids):
        o, lse = _fwd(q, k, v, bias, q_ids, kv_ids, causal=causal,
                      sm_scale=sm_scale, ids_mode=ids_mode,
                      block_sizes=block_sizes, mask_value=mask_value,
                      interpret=interpret)
        # Persist the LSE residual compactly: the kernel emits it
        # lane-replicated [b,h,s,128] f32 (64 MB/layer at b8 s1024 h16),
        # but only lane 0 is meaningful. [b,h,s] stores at 1/128th; _bwd
        # re-broadcasts it as a transient.
        return o, (q, k, v, bias, q_ids, kv_ids, o, lse[..., 0])

    def fa_bwd(res, g):
        return _bwd(causal, sm_scale, ids_mode, block_sizes, mask_value,
                    interpret, res, g)

    fa.defvjp(fa_fwd, fa_bwd)
    return fa


def flash_attention(
    q: jnp.ndarray,                      # [B, H, S_q, D]
    k: jnp.ndarray,                      # [B, H, S_k, D]
    v: jnp.ndarray,                      # [B, H, S_k, D]
    bias: Optional[jnp.ndarray] = None,  # [B|1, H|1, S_q|1, S_k]
    q_ids: Optional[jnp.ndarray] = None,   # int32 [B, S_q]
    kv_ids: Optional[jnp.ndarray] = None,  # int32 [B, S_k]
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    ids_mode: str = "eq",
    block_sizes: Optional[BlockSizes] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: bool = False,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Fused multi-head attention. Pads S_q/S_k/D to TPU-friendly sizes,
    launches the Pallas kernels, and slices the result back.

    When padding S_k on a non-causal call, kv ids are synthesized so padded
    keys are masked (PAD_ID never matches under "eq"/"ge").

    return_lse=True returns (out, lse [B,H,S_q] natural-log) and skips the
    custom-VJP wrapper — this path is NOT differentiable; it exists for
    callers that own their backward (ring attention's two-pass VJP merges
    normalized per-block outputs by their lse).
    """
    batch, heads, s_q, d = q.shape
    s_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    block_sizes = block_sizes or BlockSizes()
    if causal and s_q != s_k:
        raise ValueError("causal flash attention requires s_q == s_k "
                         "(use the decode kernel for cached decoding)")

    # pad head dim to a multiple of 128 (CLIP 64, perceiver 16/64, persimmon 64)
    d_pad = max(NUM_LANES, _cdiv(d, NUM_LANES) * NUM_LANES)
    # pad sequence dims to a multiple of 128; per-kernel block sizes are then
    # fitted down to divide the padded lengths (_fit_block)
    s_q_pad = _cdiv(s_q, NUM_LANES) * NUM_LANES
    s_k_pad = _cdiv(s_k, NUM_LANES) * NUM_LANES
    if causal:
        s_q_pad = s_k_pad = max(s_q_pad, s_k_pad)

    needs_kv_mask = (s_k_pad != s_k) and not causal
    if needs_kv_mask and kv_ids is None:
        q_ids = jnp.zeros((batch, s_q), jnp.int32)
        kv_ids = jnp.zeros((batch, s_k), jnp.int32)
        ids_mode = "eq" if ids_mode not in ("eq", "ge") else ids_mode

    def pad(x, target_len, axis, value=0):
        if x is None or x.shape[axis] == target_len:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, target_len - x.shape[axis])
        return jnp.pad(x, widths, constant_values=value)

    qp = pad(pad(q, s_q_pad, 2), d_pad, 3)
    kp = pad(pad(k, s_k_pad, 2), d_pad, 3)
    vp = pad(pad(v, s_k_pad, 2), d_pad, 3)
    bp = None
    if bias is not None:
        bp = bias.astype(jnp.float32)
        if bp.shape[2] != 1:
            bp = pad(bp, s_q_pad, 2)
        bp = pad(bp, s_k_pad, 3)   # zeros fine: padded keys masked elsewhere

    qidp = kidp = None
    if q_ids is not None:
        qidp = pad(q_ids.astype(jnp.int32), s_q_pad, 1)
        kidp = pad(kv_ids.astype(jnp.int32), s_k_pad, 1, value=PAD_ID)
        # lane/sublane-replicated layouts for clean TPU tiling
        qidp = jnp.broadcast_to(qidp[:, :, None], (batch, s_q_pad, NUM_LANES))
        kidp = jnp.broadcast_to(kidp[:, None, :],
                                (batch, NUM_SUBLANES, s_k_pad))

    if return_lse:
        o, lse = _fwd(qp, kp, vp, bp, qidp, kidp, causal=causal,
                      sm_scale=float(sm_scale), ids_mode=ids_mode,
                      block_sizes=block_sizes,
                      mask_value=float(mask_value), interpret=interpret)
        # kernel lse is lane-replicated [B,H,S,128]; lane 0 is the value
        return o[:, :, :s_q, :d], lse[:, :, :s_q, 0]

    fa = _make_flash_attention(causal, float(sm_scale), ids_mode,
                               block_sizes,
                               float(mask_value), interpret)
    # biases/ids are non-trainable inputs
    if bp is not None:
        bp = lax.stop_gradient(bp)
    o = fa(qp, kp, vp, bp, qidp, kidp)
    return o[:, :, :s_q, :d]
