"""Pallas decode attention: q_len==1 against a contiguous KV cache.

The XLA einsum decode path reads the full max_len cache every step; this
kernel skips KV blocks beyond the per-row valid length (the paged-attention
length-guard pattern, jax.experimental.pallas.ops.tpu.paged_attention),
which matters once serving contexts grow: HBM traffic scales with the
actual context, not the cache allocation.

Layout: q [B, H, D], k/v cache [B, H, L, D], lengths [B] (valid entries,
i.e. pos+1). Additive bias per (b, h) column supported (ALiBi decode form).

Multi-head blocking (`block_h` heads per grid step): every grid step pays a
fixed ~4 µs Mosaic overhead regardless of its read size; a many-small-heads
model (persimmon: 64 heads of d=64) at one head per step is grid-floor
bound, not bandwidth bound — 64 heads x 5 KV blocks x 36 layers ≈ 11.5k
grid steps ≈ 46 ms/decode-step at full-HD (the measured 3x-off-roofline
OtterHD gap, BENCH_NOTES r2). Folding block_h heads into one grid step
divides the step count; the per-head dots run back-to-back on the already
VMEM-resident block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE

NUM_LANES = 128


def _default_block_h(h: int, d: int, block_k: int, itemsize: int = 2
                     ) -> int:
    """Heads per grid step: target ~1 MB of k-block per step so the
    HBM read per grid step dwarfs the per-step floor, capped so (k, v,
    double-buffering) stays well under VMEM.

    Tuned on-chip at 7B dims b8/H32/d128/L2048 (round 4,
    tools/bench_decode_blocks.py): the former 0.5 MB target put the
    int8 cache at 51% of its bandwidth SOL (grid-step floor bound,
    8192 steps/decode-step); the 1 MB target lands int8 at 81% and
    bf16 at 90% with the block_k=min(1024, L) default below. Larger
    blocks (2048x8 int8: 112% of nominal SOL) win another ~27% on
    full caches but halve the block-skip granularity the continuous
    batcher's short rows rely on, and push VMEM limits at bf16."""
    target = max(1, (1024 * 1024) // max(1, block_k * d * itemsize))
    bh = 1
    while bh * 2 <= target and h % (bh * 2) == 0:
        bh *= 2
    return bh


def decode_attention(q, k, v, lengths, bias=None, starts=None, *,
                     k_scale=None, v_scale=None, kv_bits: int = 8,
                     layer: Optional[int] = None,
                     sm_scale=None, block_k: Optional[int] = None,
                     block_h: Optional[int] = None,
                     mask_value: float = DEFAULT_MASK_VALUE,
                     dispatch_full: Optional[bool] = None,
                     interpret: bool = False):
    """q [B, H, D]; k/v [B, H, L, D]; lengths [B] int32; optional column
    bias [B|1, H|1, L] (ALiBi decode form). -> [B, H, D].

    Stacked-cache mode (`layer` given): k/v are the FULL stacked cache
    [B, n_layers, H, L, D] (k_scale/v_scale [B, n_layers, H, L]) and the
    layer is selected in the BlockSpec index maps — the kernel reads its
    blocks straight out of the stacked buffer. Slicing the layer outside
    (`cache[:, layer]`) is a STRIDED slice that XLA materializes for every
    layer: one full extra cache read+write per decode step (measured
    ~1.2 ms/step on the 7B at b8 — most of the former "carry cost").

    int8 KV cache: pass k/v as int8 with per-position scales k_scale /
    v_scale [B, H, L] (symmetric row-wise max-abs quantization). The cache
    is read at 1 byte/entry and dequantized in-register: the k scale is
    applied to the [8, block_k] logits AFTER the q.k dot (per-key-row
    scaling commutes with the contraction) and the v scale is folded into
    the probability row before the p.v dot — no [block_k, d] dequantized
    block is ever materialized.

    Grid (B, H/block_h, L//block_k); the single query row is replicated to
    the 8-sublane minimum tile; KV blocks past `lengths[b]` or before
    `starts[b]` (left padding) are skipped entirely (no HBM read).
    """
    int4 = kv_bits == 4 and k_scale is not None
    bsz, h, d = q.shape
    # int4: k and v are NIBBLE-FUSED in one [.., L, D] int8 array (k in
    # the low nibbles, v in the high — quant.quantize_kv_int4). The
    # caller passes the same array as k and v; only ONE operand is wired
    # so each block is fetched from HBM once. Full 128-lane minor dim:
    # the former [.., D/2] packing was lane-padded to int8 size
    # physically and triggered XLA compression-copy churn.
    d_kv = d
    stacked = layer is not None
    L = k.shape[3] if stacked else k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if block_k is None:
        block_k = 1024        # on-chip optimum at 7B dims (see
    block_k = min(block_k, L)  # _default_block_h docstring)
    while L % block_k:
        block_k //= 2
    if block_k % 128 and block_k != L:
        # Mosaic lowering: the scale/bias blocks are [.., block_h,
        # block_k] with block_k MINOR, which must be a multiple of 128
        # or the full array dim. The halving loop can land elsewhere
        # (L=2112 -> 64 — advisor r4); clamp to the largest 128-multiple
        # divisor of L, else take the whole cache in one block.
        block_k = next((bk for bk in (2048, 1024, 512, 256, 128)
                        if bk <= L and L % bk == 0), L)
    num_kv = L // block_k
    if block_h is None:
        block_h = _default_block_h(h, d, block_k, k.dtype.itemsize)
    while h % block_h:
        block_h //= 2
    has_bias = bias is not None
    quant = k_scale is not None
    if (quant or has_bias) and block_h % 8 and block_h != h:
        # scale/bias blocks are rank-3 [.., block_h, block_k] f32: Mosaic
        # requires the last two block dims divisible by (8, 128) or equal
        # to the array dims, so the head block must be 8-aligned (or all
        # of h when h itself is small/odd)
        block_h = 8 if h % 8 == 0 else h
        # keep the k/v blocks ~2 MB after the clamp so double-buffered
        # streams still fit VMEM (the bf16 block_k=1024 x block_h=8 case)
        while (block_k > 256
               and block_h * block_k * d * k.dtype.itemsize > 2 << 20):
            block_k //= 2
        num_kv = L // block_k
    if quant:
        assert k.dtype == jnp.int8 and v.dtype == jnp.int8
    if starts is None:
        starts = jnp.zeros_like(lengths)

    # q rows tiled to the 8-sublane minimum per (b, h)
    q8 = jnp.broadcast_to(q[:, :, None, :], (bsz, h, 8, d))

    args = [q8, k]
    if not int4:
        args.append(v)
    if has_bias:
        # per-head column bias as a rank-3 [B, H, L] block; the 8-sublane
        # replication the q/logits tile needs happens IN-REGISTER inside
        # the kernel. The former [B, H, 8, L] HBM layout re-materialized
        # the broadcast every step (pallas inputs are real buffers):
        # write+read of 8x-inflated bias+scales measured ~1.3 ms/step of
        # pure overhead at 7B b8/L2048 int8 (BENCH_NOTES r4).
        bias3 = jnp.broadcast_to(bias.astype(jnp.float32), (bsz, h, L))
        args.append(bias3)
    if quant:
        # per-key-position scales, read straight from the cache's own
        # [B(, nl), H, L] f32 arrays (see sc_spec) — no cast, no
        # replication, no per-layer slice
        args.extend((k_scale, v_scale))

    out = _dispatch(
        tuple(args), lengths, starts, layer=layer, L=L, h=h, d=d,
        d_kv=d_kv, block_k=block_k, block_h=block_h, int4=int4,
        quant=quant, has_bias=has_bias, stacked=stacked, sm_scale=sm_scale,
        mask_value=mask_value, dispatch_full=dispatch_full,
        kv_itemsize=k.dtype.itemsize, interpret=interpret)
    return out[:, :, 0, :]


def _dispatch(args, lengths, starts, *, layer, L, h, d, d_kv, block_k,
              block_h, int4, quant, has_bias, stacked, sm_scale,
              mask_value, dispatch_full, kv_itemsize, interpret):
    """Build the kernel at the chosen blocking, with an optional runtime
    full-cache fast path.

    Full-cache fast path (round 5, VERDICT r4 #1a): once every row's
    valid span covers every KV block, block-skipping buys nothing and
    the grid-step count is pure overhead — one block_k=L launch reads
    the same bytes in 1/num_kv the grid steps (measured 4.70 vs 6.45
    ms/decode-step of attention at 7B b8/L2048 int8,
    tools/bench_decode_blocks.py). Rows fill their caches monotonically,
    so a `lax.cond` on "every row spans every block" dispatches the
    near-full regime to the big-block kernel and keeps short rows on the
    block-skipping path. Only engaged when the full-row blocks fit the
    VMEM budget (int8/int4 caches; bf16 at L>=2048 with bias needs 8
    sublanes x 4 MB blocks and stays blocked)."""
    import os
    if dispatch_full is None and \
            os.environ.get("OTTER_DECODE_FULLCACHE") == "0":
        dispatch_full = False   # A/B lever for the runtime fast path
    full_bh = None
    if dispatch_full is not False and L // block_k >= 2:
        itemsize = kv_itemsize
        n_ops = 1 if int4 else 2
        bh = h
        while bh > 1 and n_ops * bh * L * d * itemsize > (4 << 20):
            bh //= 2
        if (quant or has_bias) and bh % 8:
            bh = 8 if h % 8 == 0 else h
        if h % bh == 0 and n_ops * bh * L * d * itemsize <= (4 << 20):
            full_bh = bh

    def build(block_k, block_h):
        return _call(args, lengths, starts, layer=layer, L=L, h=h, d=d,
                     d_kv=d_kv, block_k=block_k, block_h=block_h,
                     int4=int4, quant=quant, has_bias=has_bias,
                     stacked=stacked, sm_scale=sm_scale,
                     mask_value=mask_value, interpret=interpret)

    if full_bh is None:
        return build(block_k, block_h)
    spans_all = ((jnp.min(lengths) > L - block_k)
                 & (jnp.max(starts) < block_k))
    return lax.cond(spans_all,
                    lambda: build(L, full_bh),
                    lambda: build(block_k, block_h))


def _call(args, lengths, starts, *, layer, L, h, d, d_kv, block_k,
          block_h, int4, quant, has_bias, stacked, sm_scale, mask_value,
          interpret):
    bsz = args[0].shape[0]
    num_kv = L // block_k
    num_h = h // block_h
    q_dtype = args[0].dtype

    if stacked:
        kv_spec = pl.BlockSpec((1, 1, block_h, block_k, d_kv),
                               lambda b, hh, j, *_: (b, layer, hh, j, 0))
        # scales ride the same zero-copy stacked index map as k/v: no
        # per-layer slice and no sublane replication ever touches HBM
        sc_spec = pl.BlockSpec((1, 1, block_h, block_k),
                               lambda b, hh, j, *_: (b, layer, hh, j))
    else:
        kv_spec = pl.BlockSpec((1, block_h, block_k, d_kv),
                               lambda b, hh, j, *_: (b, hh, j, 0))
        sc_spec = pl.BlockSpec((1, block_h, block_k),
                               lambda b, hh, j, *_: (b, hh, j))

    in_specs = [
        pl.BlockSpec((1, block_h, 8, d), lambda b, hh, j, *_: (b, hh, 0, 0)),
        kv_spec,
    ]
    if not int4:
        in_specs.append(kv_spec)
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_h, block_k),
                                     lambda b, hh, j, *_: (b, hh, j)))
    if quant:
        in_specs.extend((sc_spec, sc_spec))

    def kernel(lengths_ref, starts_ref, *refs):
        it = iter(refs)
        q_ref, k_ref = next(it), next(it)
        v_ref = k_ref if int4 else next(it)   # int4: fused kv block
        bias_ref = next(it) if has_bias else None
        ks_ref = next(it) if quant else None
        vs_ref = next(it) if quant else None
        o_ref, m_scr, l_scr, acc_scr = next(it), next(it), next(it), next(it)
        b = pl.program_id(0)
        j = pl.program_id(2)
        length = lengths_ref[b]
        start = starts_ref[b]

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when((j * block_k < length) & ((j + 1) * block_k > start))
        def _body():
            cols = (lax.broadcasted_iota(jnp.int32, (8, block_k), 1)
                    + j * block_k)
            col_ok = (cols < length) & (cols >= start)
            for hh in range(block_h):
                qq = q_ref[0, hh]                 # [8, D]
                kk = (k_ref[0, 0, hh] if stacked
                      else k_ref[0, hh])          # [block_k, D]
                if int4:
                    # low nibbles = k, sign-extended by the shift pair
                    kk = ((kk.astype(jnp.int32) << 28) >> 28
                          ).astype(qq.dtype)
                elif quant:
                    kk = kk.astype(qq.dtype)      # int8 -> compute dtype
                s = lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                if quant:
                    ks = (ks_ref[0, 0, hh] if stacked
                          else ks_ref[0, hh])     # [block_k] f32
                    s *= ks[None, :]              # per-key-row dequant
                s *= sm_scale                     # [8, block_k]
                if bias_ref is not None:
                    s += bias_ref[0, hh][None, :]
                s = jnp.where(col_ok, s, mask_value)

                m_prev = m_scr[hh]
                l_prev = l_scr[hh]
                m_curr = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, lax.broadcast_in_dim(
                    m_curr, m_prev.shape, (0, 1)))
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - lax.broadcast_in_dim(m_next[:, :1], s.shape,
                                                     (0, 1)))
                l_next = alpha * l_prev + lax.broadcast_in_dim(
                    jnp.sum(p, axis=1, keepdims=True), l_prev.shape, (0, 1))
                m_scr[hh] = m_next
                l_scr[hh] = l_next
                vv = v_ref[0, 0, hh] if stacked else v_ref[0, hh]
                if quant:
                    # fold the per-value-row scale into the probability row
                    vs = (vs_ref[0, 0, hh] if stacked
                          else vs_ref[0, hh])     # [block_k] f32
                    p = p * vs[None, :]
                    if int4:
                        # high nibbles = v; arithmetic shift keeps sign
                        vv = (vv.astype(jnp.int32) >> 4).astype(qq.dtype)
                    else:
                        vv = vv.astype(qq.dtype)
                o_curr = lax.dot_general(p.astype(vv.dtype), vv,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                acc_scr[hh] = acc_scr[hh] * lax.broadcast_in_dim(
                    alpha[:, :1], acc_scr[hh].shape, (0, 1)) + o_curr

        @pl.when(j == num_kv - 1)
        def _store():
            for hh in range(block_h):
                l = l_scr[hh]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[0, hh] = (acc_scr[hh] * lax.broadcast_in_dim(
                    l_inv[:, :1], acc_scr[hh].shape, (0, 1))
                ).astype(o_ref.dtype)

    # scoped-VMEM estimate: double-buffered operand blocks + the
    # unrolled per-head dequant temps (quant caches convert each
    # [block_k, d] int8 block to compute dtype in-register; Mosaic
    # stacks the unrolled copies). The default 16 MB scoped limit is
    # conservative (v5e has 128 MB VMEM); the full-cache fast path at
    # (block_k=2048, block_h=8) int8 measures 16.19 MB — 192 KB over —
    # so raise the limit ONLY when the estimate is near the default,
    # leaving every previously-tuned blocking's compilation untouched.
    kv_bytes = ((1 if int4 else 2)
                * block_h * block_k * d_kv * args[1].dtype.itemsize)
    aux_bytes = (2 * block_h * block_k * 4 if quant else 0) \
        + (block_h * block_k * 4 if has_bias else 0) \
        + 2 * block_h * 8 * d * 4
    temps = block_h * block_k * d * 2 if quant else 0
    need = 2 * (kv_bytes + aux_bytes) + temps
    compiler_params = dict(
        dimension_semantics=("parallel", "parallel", "arbitrary"))
    if need > (15 << 20):
        compiler_params["vmem_limit_bytes"] = need + (8 << 20)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, num_h, num_kv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_h, 8, d),
                                   lambda b, hh, j, *_: (b, hh, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_h, 8, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_h, 8, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_h, 8, d), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((bsz, h, 8, d), q_dtype),
        compiler_params=pltpu.CompilerParams(**compiler_params),
        interpret=interpret,
    )(lengths.astype(jnp.int32), starts.astype(jnp.int32), *args)
