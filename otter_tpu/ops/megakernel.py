"""Whole-layer decode megakernel — the ROADMAP #1 structural experiment.

One pallas_call covering the attention half of an MPT decode layer:

    n      = LPLayerNorm(x) * ln1_scale            (norm_1, f32 stats)
    qkv    = (n @ wqkv) * s_qkv                    (int8 col-scaled)
    attn_h = softmax(q_h . [K_cache_h | k_new_h] * sm + alibi) . [V | v_new]
    y      = x + (attn @ wo) * s_wo                (int8 out-proj + residual)

returning (y, k_new, v_new). The KV cache is READ inside the launch
(per-batch-row full-head blocks); the NEW token's k/v never round-trip
through HBM — their logit/value contribution is computed in-register from
the qkv scratch, and the cache append itself is returned to XLA as a
[B, H, Dh] dynamic_update_slice (128 KB, runs in parallel with the next
op; an in-kernel aliased write would instead force a full cache block
VMEM->HBM writeback every step). The MLP half stays on `int8_mlp`, the
measured optimum (BENCH_NOTES round 2).

Motivation and verdict: the remaining flagship gap (0.86 of the int8 HBM
roofline) is XLA's 653 GB/s convert-then-dot read rate on qkv/out plus
inter-op scheduling; this kernel streams those weights at Pallas rates
with zero inter-op boundaries. It is the "whole-layer megakernel keeping
the cache read in-launch" idea from ROADMAP #1 / VERDICT r2 #4 — see
BENCH_NOTES "Decode megakernel" for the measured result.

Scope (flagship decode config): MPT arch (ALiBi, weight-only LN, fused
Wqkv, no biases), uniform decode position, bf16 cache, whole cache in one
KV block per batch row (L*Dh*H*2B <= ~2 MB-per-head-set VMEM budget:
L<=2048 at h32 d128 head-blocked), q_len 1.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def decode_attn_megakernel(
    x: jnp.ndarray,                 # [B, D] activation dtype (B <= 8)
    k_cache: jnp.ndarray,           # [B, H, L, Dh] bf16 (READ only)
    v_cache: jnp.ndarray,           # [B, H, L, Dh]
    pos,                            # scalar int32: new token index
    bias_col: Optional[jnp.ndarray],  # [H, L+pad] f32 ALiBi column bias
    ln1_scale: jnp.ndarray,         # [D] f32
    wqo: jnp.ndarray,               # [D, 3D + D] int8: wqkv | wo
    sqo: jnp.ndarray,               # [3D + D] f32 per-out-col scales
    *,
    layer: Optional[int] = None,    # stacked-cache mode (see below)
    eps: float = 1e-5,
    sm_scale: Optional[float] = None,
    block_w: int = 512,
    block_h: Optional[int] = None,  # heads per attention grid step
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (y [B, D], k_new [B, H, Dh], v_new [B, H, Dh]).

    With `layer` given, k_cache/v_cache are the FULL stacked cache
    [B, n_layers, H, L, Dh] and the layer is selected in the BlockSpec
    index maps (zero-copy, as in ops/decode_attention.py — an outside
    `cache[:, layer]` slice is strided and XLA materializes it)."""
    stacked = layer is not None
    if stacked:
        bsz, _, h, L, dh = k_cache.shape
    else:
        bsz, h, L, dh = k_cache.shape
    d = x.shape[1]
    assert x.shape == (bsz, d) and h * dh == d
    assert wqo.shape == (d, 4 * d) and sqo.shape == (4 * d,)
    assert wqo.dtype == jnp.int8
    if sm_scale is None:
        sm_scale = 1.0 / (dh ** 0.5)
    if block_h is None:
        # ~1 MB of K block per attention step
        block_h = max(1, (1024 * 1024) // max(1, L * dh * 2))
    while h % block_h:
        block_h //= 2
    n_hb = h // block_h

    bw = block_w
    while (3 * d) % bw or d % bw:
        bw //= 2
    n_qkv = (3 * d) // bw
    n_wo = d // bw
    n_att = bsz * n_hb
    grid = n_qkv + n_att + n_wo

    m_pad = 8
    if bsz < m_pad:
        x = jnp.pad(x, ((0, m_pad - bsz), (0, 0)))
    ln1_2d = ln1_scale.reshape(1, d).astype(jnp.float32)
    sqo_2d = sqo.reshape(1, 4 * d).astype(jnp.float32)
    if bias_col is None:
        bias_col = jnp.zeros((h, L), jnp.float32)
    bias_col = bias_col.astype(jnp.float32)

    def w_idx(j, *_):
        # phase A walks qkv col blocks; attention steps repeat the last
        # qkv block (DMA elided); phase C walks the wo blocks
        a = jnp.minimum(j, n_qkv - 1)
        c = jnp.clip(j - n_att, n_qkv, n_qkv + n_wo - 1)
        return jnp.where(j < n_qkv + n_att, a, c)

    def kv_idx(j, *_):
        step = jnp.clip(j - n_qkv, 0, n_att - 1)
        return step // n_hb, step % n_hb

    if stacked:
        kv_spec = pl.BlockSpec(
            (1, 1, block_h, L, dh),
            lambda j, *_: (kv_idx(j)[0], layer, kv_idx(j)[1], 0, 0))
    else:
        kv_spec = pl.BlockSpec(
            (1, block_h, L, dh), lambda j, *_: (*kv_idx(j), 0, 0))

    def kernel(pos_ref, x_ref, ln1_ref, w_ref, s_ref, k_ref, v_ref,
               bias_ref, y_ref, kn_ref, vn_ref,
               normed, qkv_scr, attn_scr, base):
        j = pl.program_id(0)
        pos_v = pos_ref[0]

        @pl.when(j == 0)
        def _norm1():
            xf = x_ref[...].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            nrm = (xf - mean) * lax.rsqrt(var + eps) * ln1_ref[...]
            normed[...] = nrm.astype(x_ref.dtype)

        @pl.when(j < n_qkv)
        def _phase_qkv():
            w = w_ref[...].astype(x_ref.dtype)
            out = lax.dot_general(
                normed[...], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv_scr[:, pl.dslice(j * bw, bw)] = out * s_ref[
                :, pl.dslice(w_idx(j) * bw, bw)]

        @pl.when((j >= n_qkv) & (j < n_qkv + n_att))
        def _phase_attn():
            step = j - n_qkv
            b = step // n_hb
            hb = step % n_hb
            # Mosaic cannot address a single dynamic SUBLANE row (dynamic
            # dim-0 indices must be 8-aligned): row b is extracted with a
            # mask+sum over the full 8-row tile, and results are written
            # back with a row-masked select over the full tile.
            row_is_b = (lax.broadcasted_iota(jnp.int32, (m_pad, dh), 0)
                        == b)

            def row_b(part, hi):
                colo = part * d + (hb * block_h + hi) * dh
                tile = qkv_scr[:, pl.dslice(colo, dh)]      # [8, dh] f32
                r = jnp.sum(jnp.where(row_is_b, tile, 0.0), axis=0,
                            keepdims=True)                  # [1, dh]
                return lax.broadcast_in_dim(r, (8, dh), (0, 1))

            for hi in range(block_h):
                qq = row_b(0, hi).astype(x_ref.dtype)
                knew = row_b(1, hi)
                vnew = row_b(2, hi)

                kk = (k_ref[0, 0, hi] if stacked
                      else k_ref[0, hi])                # [L, Dh] bf16
                s = lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                s *= sm_scale                           # [8, L]
                brow = bias_ref[pl.dslice(hi, 1), :]    # [1, L]
                s += lax.broadcast_in_dim(brow, (8, L), (0, 1))
                cols = lax.broadcasted_iota(jnp.int32, (8, L), 1)
                s = jnp.where(cols < pos_v, s, DEFAULT_MASK_VALUE)

                # new token's logit, in-register (never touches the cache)
                s_new = jnp.sum(
                    qq.astype(jnp.float32)
                    * knew.astype(x_ref.dtype).astype(jnp.float32),
                    axis=1, keepdims=True) * sm_scale   # [8, 1] replicated
                bias_new = jnp.sum(
                    jnp.where(cols == pos_v,
                              lax.broadcast_in_dim(brow, (8, L), (0, 1)),
                              0.0), axis=1, keepdims=True)
                s_new = s_new + bias_new

                m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
                p = jnp.exp(s - lax.broadcast_in_dim(m, s.shape, (0, 1)))
                p_new = jnp.exp(s_new - m)              # [8, 1]
                l = jnp.sum(p, axis=1, keepdims=True) + p_new
                vv = (v_ref[0, 0, hi] if stacked
                      else v_ref[0, hi])                # [L, Dh]
                o = lax.dot_general(p.astype(vv.dtype), vv,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                o = o + p_new * vnew.astype(x_ref.dtype
                                            ).astype(jnp.float32)
                o = o / l
                colo = (hb * block_h + hi) * dh
                cur = attn_scr[:, pl.dslice(colo, dh)]
                attn_scr[:, pl.dslice(colo, dh)] = jnp.where(
                    row_is_b, o.astype(attn_scr.dtype), cur)

        @pl.when(j >= n_qkv + n_att)
        def _phase_wo():
            jj = j - n_qkv - n_att                      # wo block index
            w = w_ref[...].astype(x_ref.dtype)
            out = lax.dot_general(
                attn_scr[...], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = out * s_ref[:, pl.dslice((n_qkv + jj) * bw, bw)]
            yb = (x_ref[:, pl.dslice(jj * bw, bw)].astype(jnp.float32)
                  + out.astype(x_ref.dtype).astype(jnp.float32))
            base[:, pl.dslice(jj * bw, bw)] = yb.astype(base.dtype)

        @pl.when(j == grid - 1)
        def _store():
            y_ref[...] = base[...].astype(y_ref.dtype)
            kn_ref[...] = qkv_scr[:, pl.dslice(d, d)].astype(kn_ref.dtype)
            vn_ref[...] = qkv_scr[:, pl.dslice(2 * d, d)].astype(
                vn_ref.dtype)

    out_shape = [
        jax.ShapeDtypeStruct((m_pad, d), x.dtype),    # y
        jax.ShapeDtypeStruct((m_pad, d), k_cache.dtype),  # k_new (flat)
        jax.ShapeDtypeStruct((m_pad, d), v_cache.dtype),  # v_new (flat)
    ]
    y, kn, vn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((m_pad, d), lambda j, *_: (0, 0)),
                pl.BlockSpec((1, d), lambda j, *_: (0, 0)),
                pl.BlockSpec((d, bw), lambda j, *_: (0, w_idx(j))),
                pl.BlockSpec((1, 4 * d), lambda j, *_: (0, 0)),
                kv_spec,
                kv_spec,
                pl.BlockSpec((block_h, L),
                             lambda j, *_: (kv_idx(j)[1], 0)),
            ],
            out_specs=[
                pl.BlockSpec((m_pad, d), lambda j, *_: (0, 0)),
                pl.BlockSpec((m_pad, d), lambda j, *_: (0, 0)),
                pl.BlockSpec((m_pad, d), lambda j, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((m_pad, d), x.dtype),          # normed
                pltpu.VMEM((m_pad, 3 * d), jnp.float32),  # qkv
                pltpu.VMEM((m_pad, d), x.dtype),          # attn out
                pltpu.VMEM((m_pad, d), x.dtype),          # y staging
            ]),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32), x, ln1_2d, wqo, sqo_2d,
      k_cache, v_cache, bias_col)
    kn = kn[:bsz].reshape(bsz, h, dh)
    vn = vn[:bsz].reshape(bsz, h, dh)
    return y[:bsz], kn, vn


def mpt_decode_layer_megakernel(x, k_cache, v_cache, pos, bias_col,
                                ln1_scale, wqo, sqo, ln2_scale,
                                w1q, s1, w2q, s2, *, layer=None, eps=1e-5,
                                interpret=False):
    """Full MPT decode layer: megakernel attention half + XLA norm_2 +
    the proven fused int8 MLP kernel + cache append. Returns
    (x_out [B, D], k_cache, v_cache) with the new k/v appended at `pos`."""
    from otter_tpu.ops.layers import layer_norm
    from otter_tpu.ops.quant import int8_mlp

    y, kn, vn = decode_attn_megakernel(
        x, k_cache, v_cache, pos, bias_col, ln1_scale, wqo, sqo,
        layer=layer, eps=eps, interpret=interpret)
    b, h, dh = kn.shape
    kn = kn[:, :, None, :].astype(k_cache.dtype)
    vn = vn[:, :, None, :].astype(v_cache.dtype)
    if layer is not None:
        kn, vn = kn[:, None], vn[:, None]
        idx = (0, layer, 0, pos, 0)
    else:
        idx = (0, 0, pos, 0)
    k_cache = lax.dynamic_update_slice(k_cache, kn, idx)
    v_cache = lax.dynamic_update_slice(v_cache, vn, idx)
    n2 = layer_norm(y.astype(jnp.float32), ln2_scale, None,
                    eps=eps).astype(y.dtype)
    mlp = int8_mlp(n2, w1q, s1, w2q, s2, act="gelu", interpret=interpret)
    return y + mlp.astype(y.dtype), k_cache, v_cache
