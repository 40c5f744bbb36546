"""Int8 weight-only quantization.

Serving parity with the reference's bitsandbytes int8/int4 loading
(`pipeline/serve/model_worker.py:91-100`, `load_bit`), TPU-native: kernels
stored int8 with per-output-channel f32 scales; the dequantize
(convert + scale multiply) fuses into the XLA dot as a producer, so HBM
reads stay at 1 byte/weight — the decode-throughput win.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                *, block_out: int = 1024, block_in: int = 2048,
                interpret: bool = False) -> jnp.ndarray:
    """Pallas quantized matmul: x [M, K] bf16 @ wq [K, N] int8 * scale [N].

    The int8 weight tile is converted AFTER the VMEM load, so HBM traffic
    stays at 1 byte/weight (XLA's convert-then-dot only fuses partially:
    measured 1.43x over bf16 vs the 2.0x bound; see ROADMAP.md)."""
    import functools as _ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,)
    bo = min(block_out, n)
    while n % bo:
        bo //= 2
    bi = min(block_in, k)
    while k % bi:
        bi //= 2
    # pad rows to the 8-sublane minimum
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    scale2d = scale.reshape(1, n).astype(jnp.float32)

    def kernel(x_ref, w_ref, s_ref, o_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        w = w_ref[...].astype(x_ref.dtype)      # in-register dequant
        acc[...] += lax.dot_general(
            x_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n // bo, k // bi),
        in_specs=[
            pl.BlockSpec((m_pad, bi), lambda i, j: (0, j)),
            pl.BlockSpec((bi, bo), lambda i, j: (j, i)),
            pl.BlockSpec((1, bo), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, bo), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, wq, scale2d)
    return out[:m]


def int8_mlp(x: jnp.ndarray, w1q: jnp.ndarray, s1: jnp.ndarray,
             w2q: jnp.ndarray, s2: jnp.ndarray, *, act: str = "gelu",
             b1: Optional[jnp.ndarray] = None,
             b2: Optional[jnp.ndarray] = None,
             block_h: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Fused quantized MLP: act((x @ w1) * s1 + b1) @ w2 * s2 + b2 in ONE
    pallas_call.

    x [M, K] bf16; w1q [K, H] int8, s1 [H]; w2q [H, N] int8, s2 [N];
    optional biases b1 [H] / b2 [N] f32 (persimmon has biases everywhere,
    `fuyu/modeling_persimmon.py:173-193`).
    The grid walks H blocks: each step reads one w1 column-block and one
    w2 row-block (1 byte/weight off HBM, dequant in-register), computes the
    hidden activation for that block and accumulates its contribution to
    the output — both matmuls' weights stream through a single kernel, so
    the decode step pays one launch for 8d^2 bytes instead of two (the
    per-launch overhead is what made the single-matmul Pallas routing lose
    end-to-end, commit b04055b / ROADMAP #2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    m, k = x.shape
    k1, h = w1q.shape
    h2, n = w2q.shape
    assert k == k1 and h == h2 and s1.shape == (h,) and s2.shape == (n,)
    bh = min(block_h, h)
    while h % bh:
        bh //= 2
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    s1_2d = s1.reshape(1, h).astype(jnp.float32)
    s2_2d = s2.reshape(1, n).astype(jnp.float32)
    has_bias = b1 is not None
    if has_bias:
        b1_2d = b1.reshape(1, h).astype(jnp.float32)
        b2_2d = b2.reshape(1, n).astype(jnp.float32)
    def _erf(z):
        # Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, far below bf16
        # resolution): Pallas TPU has no erf/erfc lowering
        sign = jnp.sign(z)
        z = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * z)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        return sign * (1.0 - poly * jnp.exp(-z * z))

    def _gelu(z):
        # exact-erf form (torch nn.GELU parity) via the approximation above
        return z * 0.5 * (1.0 + _erf(z * 0.7071067811865476))

    act_fn = {"gelu": _gelu, "relu": jax.nn.relu,
              "silu": jax.nn.silu,
              "sq_relu": lambda z: jnp.square(jnp.maximum(z, 0.0))}[act]

    def kernel(*refs):
        it = iter(refs)
        x_ref, w1_ref, s1_ref, w2_ref, s2_ref = (next(it) for _ in range(5))
        b1_ref = next(it) if has_bias else None
        b2_ref = next(it) if has_bias else None
        o_ref, acc = next(it), next(it)
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        w1 = w1_ref[...].astype(x_ref.dtype)     # in-register dequant
        hblk = lax.dot_general(
            x_ref[...], w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hblk = hblk * s1_ref[...]
        if has_bias:
            hblk = hblk + b1_ref[...]
        hblk = act_fn(hblk)
        w2 = w2_ref[...].astype(x_ref.dtype)
        acc[...] += lax.dot_general(
            hblk.astype(x_ref.dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            y = acc[...] * s2_ref[...]
            if has_bias:
                y = y + b2_ref[...]
            o_ref[...] = y.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((m_pad, k), lambda j: (0, 0)),
        pl.BlockSpec((k, bh), lambda j: (0, j)),
        pl.BlockSpec((1, bh), lambda j: (0, j)),
        pl.BlockSpec((bh, n), lambda j: (j, 0)),
        pl.BlockSpec((1, n), lambda j: (0, 0)),
    ]
    args = [x, w1q, s1_2d, w2q, s2_2d]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bh), lambda j: (0, j)))
        in_specs.append(pl.BlockSpec((1, n), lambda j: (0, 0)))
        args.extend([b1_2d, b2_2d])
    out = pl.pallas_call(
        kernel,
        grid=(h // bh,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, n), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return out[:m]


def int8_attn_tail(attn_raw: jnp.ndarray, resid: jnp.ndarray,
                   woq: jnp.ndarray, so: jnp.ndarray,
                   norm_scale: jnp.ndarray,
                   w1q: jnp.ndarray, s1: jnp.ndarray,
                   w2q: jnp.ndarray, s2: jnp.ndarray, *,
                   eps: float = 1e-5, act: str = "gelu",
                   block_h: int = 512,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused decode layer tail in ONE pallas_call:

        y    = resid + (attn_raw @ woq) * so          (attention out-proj)
        n    = LPLayerNorm(y) * norm_scale            (norm_2, f32 stats)
        out  = y + act((n @ w1q) * s1) @ w2q * s2     (MLP)

    attn_raw [M, hd]; resid [M, D]; woq [hd, D] int8; w1q [D, H],
    w2q [H, D] int8. One launch per layer for 9*d^2 int8 bytes instead of
    an XLA dot (653 GB/s) + a separate MLP kernel.

    PHASED grid (round 2 redesign): the first n_wo steps stream wo in
    COLUMN blocks (each produces out[:, blk] + residual into scratch); the
    norm runs once at the phase boundary; the remaining steps stream the
    MLP H-blocks. The original design kept the whole d^2 wo block resident
    in VMEM, which forced a 100 MB scoped-vmem budget and degraded stream
    double-buffering (measured 601 -> 555 tok/s end-to-end). Here every
    weight block is a streamed ~2 MB tile. MPT-style tail only (pre-norm,
    no-bias LN, GELU).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    m, hd = attn_raw.shape
    d = resid.shape[1]
    h = w1q.shape[1]
    assert woq.shape == (hd, d) and w1q.shape == (d, h)
    assert w2q.shape == (h, d)
    bh = min(block_h, h)
    while h % bh:
        bh //= 2
    bd = min(block_h, d)          # wo/resid column-block width
    while d % bd:
        bd //= 2
    n_wo = d // bd
    n_h = h // bh
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        attn_raw = jnp.pad(attn_raw, ((0, m_pad - m), (0, 0)))
        resid = jnp.pad(resid, ((0, m_pad - m), (0, 0)))
    so2 = so.reshape(1, d).astype(jnp.float32)
    s1_2d = s1.reshape(1, h).astype(jnp.float32)
    s2_2d = s2.reshape(1, d).astype(jnp.float32)
    ns2 = norm_scale.reshape(1, d).astype(jnp.float32)

    def _erf(z):
        sign = jnp.sign(z)
        z = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * z)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        return sign * (1.0 - poly * jnp.exp(-z * z))

    def _gelu(z):
        return z * 0.5 * (1.0 + _erf(z * 0.7071067811865476))

    act_fn = {"gelu": _gelu, "relu": jax.nn.relu,
              "silu": jax.nn.silu}[act]

    def kernel(a_ref, r_ref, wo_ref, so_ref, ns_ref, w1_ref, s1_ref,
               w2_ref, s2_ref, o_ref, base, normed, acc):
        j = pl.program_id(0)

        @pl.when(j < n_wo)
        def _phase_a():
            # out-proj column block: out[:, blk] = a @ wo[:, blk] * so[blk]
            wo = wo_ref[...].astype(a_ref.dtype)
            out = lax.dot_general(
                a_ref[...], wo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * so_ref[...]
            # round to the activation dtype first (the unfused chain adds
            # residual + out in bf16 before the norm)
            y = (r_ref[...].astype(jnp.float32)
                 + out.astype(a_ref.dtype).astype(jnp.float32))
            base[:, pl.dslice(j * bd, bd)] = y.astype(a_ref.dtype)

        @pl.when(j == n_wo - 1)
        def _norm():
            yf = base[...].astype(jnp.float32)
            mean = jnp.mean(yf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
            nrm = (yf - mean) * lax.rsqrt(var + eps) * ns_ref[...]
            normed[...] = nrm.astype(a_ref.dtype)
            acc[...] = jnp.zeros_like(acc)

        @pl.when(j >= n_wo)
        def _phase_b():
            w1 = w1_ref[...].astype(a_ref.dtype)
            hblk = lax.dot_general(
                normed[...], w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hblk = act_fn(hblk * s1_ref[...])
            w2 = w2_ref[...].astype(a_ref.dtype)
            acc[...] += lax.dot_general(
                hblk.astype(a_ref.dtype), w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(0) - 1)
        def _store():
            mlp = (acc[...] * s2_ref[...]).astype(o_ref.dtype)
            o_ref[...] = base[...].astype(o_ref.dtype) + mlp

    def a_idx(j):
        # phase A walks wo/resid/so column blocks; phase B repeats the last
        # index (consecutive identical blocks -> DMA elided)
        return jnp.minimum(j, n_wo - 1)

    def b_idx(j):
        # phase B walks the MLP H-blocks; phase A prefetches block 0
        return jnp.maximum(j - n_wo, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_wo + n_h,),
        in_specs=[
            pl.BlockSpec((m_pad, hd), lambda j: (0, 0)),
            pl.BlockSpec((m_pad, bd), lambda j: (0, a_idx(j))),
            pl.BlockSpec((hd, bd), lambda j: (0, a_idx(j))),
            pl.BlockSpec((1, bd), lambda j: (0, a_idx(j))),
            pl.BlockSpec((1, d), lambda j: (0, 0)),
            pl.BlockSpec((d, bh), lambda j: (0, b_idx(j))),
            pl.BlockSpec((1, bh), lambda j: (0, b_idx(j))),
            pl.BlockSpec((bh, d), lambda j: (b_idx(j), 0)),
            pl.BlockSpec((1, d), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, d), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), attn_raw.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, d), attn_raw.dtype),
                        pltpu.VMEM((m_pad, d), attn_raw.dtype),
                        pltpu.VMEM((m_pad, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(attn_raw, resid, woq, so2, ns2, w1q, s1_2d, w2q, s2_2d)
    return out[:m]


class Int8Kernel(nn.Module):
    """Param holder producing the exact (kernel_q, scale_q) tree of an
    Int8Dense submodule — lets a fused kernel own several projections'
    weights without changing checkpoint layout."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (in_features, self.features), jnp.int8)
        sq = self.param("scale_q", nn.initializers.ones,
                        (self.features,), jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            return kq, sq, b
        return kq, sq


class Int8Dense(nn.Module):
    """Drop-in Dense with int8 kernel + per-channel scale params
    (kernel_q [in, out] int8, scale [out] f32)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_features, self.features), jnp.int8)
        scale = self.param("scale_q", nn.initializers.ones,
                           (self.features,), jnp.float32)
        # scale on the OUTPUT side: the int8->bf16 convert fuses into the
        # XLA dot's operand read (no dequantized weight materialization).
        # Measured r2: routing single matmuls through the Pallas
        # int8_matmul loses end-to-end even with the MLP pair already
        # fused (457 vs 485 tok/s on the 7B) — XLA pipelines its own dots
        # across the layer better than it schedules around pallas_call.
        # Only the two-matmul MLP fusion (int8_mlp) wins: one launch for
        # 8d^2 bytes (485 vs 461 tok/s).
        y = jnp.dot(x.astype(self.dtype), kernel_q.astype(self.dtype))
        y = y * scale.astype(self.dtype)[None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quant: Optional[str], features: int, *, use_bias: bool,
               dtype, name: str):
    # int4 models keep their ATTENTION projections at int8: routing them
    # through the packed-int4 Pallas matmul (Int4AttnDense) measured
    # SLOWER end-to-end on the 7B (684 vs 722 tok/s) — XLA pipelines its
    # own dots across the layer better than it schedules around
    # pallas_call, and at qkv/out sizes the byte saving does not cover
    # the scheduling penalty (same conclusion as the int8 routing,
    # commit b04055b). Int4AttnDense/int4_matmul stay as groundwork.
    if quant in ("int8", "int4"):
        return Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def quantize_kernel(w: np.ndarray):
    """f32/bf16 [in, out] -> (int8 [in, out], scale f32 [out])."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


DEFAULT_QUANT_PATTERNS = re.compile(
    r"(.*/)?(layers_\d+/(attn|ffn)/[^/]+"
    r"|xattn_\d+/(ff_up|ff_down)"
    r"|xattn_\d+/attn/(to_q|to_kv|to_out)"
    r"|lm_head)/kernel$")

# frozen-tower training quantization (the single-chip 7B SFT recipe):
# only the frozen decoder layers — xattn/perceiver/embeddings stay bf16
# trainable, the untied lm_head (when present) trains too. Pair with
# TextConfig(quant="int8", quant_xattn=None).
FROZEN_DECODER_PATTERNS = re.compile(
    r"(.*/)?layers_\d+/(attn|ffn)/[^/]+/kernel$")


def quantize_params(params: Any,
                    patterns=DEFAULT_QUANT_PATTERNS) -> Any:
    """Replace matching `.../kernel` leaves with kernel_q + scale_q pairs
    (matching Int8Dense's param names)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        if patterns.match(k):
            q, scale = quantize_kernel(np.asarray(v))
            base = k[: -len("kernel")]
            out[base + "kernel_q"] = jnp.asarray(q)
            out[base + "scale_q"] = jnp.asarray(scale)
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def quantize_embed(params: Any) -> Any:
    """Replace `.../wte/embedding` leaves with the decoder's quant_embed
    layout: `wte_q` [V, H] int8 + `wte_s` [V] f32 per-token-row scales
    (symmetric max-abs per row). One-time load transform for
    `TextConfig(quant_embed=True)` — a residency lever for big-vocab
    untied tables (Fuyu's 262k-vocab bf16 wte is 2.15 GB)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        if k.endswith("wte/embedding"):
            w = np.asarray(v, np.float32)                     # [V, H]
            scale = np.maximum(np.abs(w).max(axis=1), 1e-12) / 127.0
            q = np.clip(np.rint(w / scale[:, None]), -127, 127)
            base = k[: -len("wte/embedding")]
            out[base + "wte_q"] = jnp.asarray(q, jnp.int8)
            out[base + "wte_s"] = jnp.asarray(scale, jnp.float32)
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def add_fused_wqo(params: Any) -> Any:
    """Add the decode megakernel's fused [Wqkv | Wo] leaves
    (`attn/wqo_q` [d, 4d] int8, `attn/wqo_scale` [4d]) next to each
    decoder layer's quantized attention projections. One-time load
    transform for `TextConfig(megakernel=True)`: the megakernel streams
    qkv+out as ONE operand (a per-step in-jit concat would materialize a
    64 MB copy every decode step), while prefill keeps using the
    original leaves. Costs one extra int8 copy of qkv+out in HBM
    (~2.1 GB on the 7B)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    new = {}
    for k in list(flat):
        m = re.match(r"(.*layers_\d+/attn)/Wqkv/kernel_q$", k)
        if not m:
            continue
        base = m.group(1)
        ok = base + "/out_proj/kernel_q"
        if ok not in flat:
            continue
        new[base + "/wqo_q"] = jnp.concatenate(
            [jnp.asarray(flat[k]), jnp.asarray(flat[ok])], axis=1)
        new[base + "/wqo_scale"] = jnp.concatenate(
            [jnp.asarray(flat[base + "/Wqkv/scale_q"], jnp.float32),
             jnp.asarray(flat[base + "/out_proj/scale_q"], jnp.float32)])
    flat.update(new)
    return traverse_util.unflatten_dict(flat, sep="/")


def quantize_kv(x: jnp.ndarray):
    """Symmetric per-row max-abs int8 for KV-cache entries: x [..., D] ->
    (int8 [..., D], f32 scale [...]). Row granularity = one (position,
    head) vector, so decode appends quantize only the new token's rows."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def quantize_kv_int4(k: jnp.ndarray, v: jnp.ndarray):
    """Symmetric per-row max-abs int4 for KV-cache entries, k and v fused
    by NIBBLE PLANE: byte(..., d) = k4[..., d] | v4[..., d] << 4, so one
    [..., D] int8 array carries both tensors at 0.5 bytes/element each.

    Returns (kv_packed int8 [..., D], k_scale f32 [...], v_scale [...]).

    Why nibble planes and not head-dim pairs: a [..., D/2]-packed array
    has a 64-lane minor dim, which the TPU tiled layout pads to 128 —
    the \"int4\" cache then physically occupies int8-size HBM, and XLA's
    memory-space-assignment fights the padding with full-array
    compression copies (measured: 731 ms/step vs 21 at b4 L=4096 on the
    7B, temp arena 4.4 GB vs 0.03). The fused layout keeps the natural
    128-lane minor dim, reads k and v in ONE block stream, and unpacks
    with two shifts (no lane concat)."""
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    ka = jnp.max(jnp.abs(kf), axis=-1)
    va = jnp.max(jnp.abs(vf), axis=-1)
    k_scale = jnp.where(ka > 0, ka / 7.0, 1.0)
    v_scale = jnp.where(va > 0, va / 7.0, 1.0)
    k4 = jnp.clip(jnp.round(kf / k_scale[..., None]), -7, 7
                  ).astype(jnp.int32)
    v4 = jnp.clip(jnp.round(vf / v_scale[..., None]), -7, 7
                  ).astype(jnp.int32)
    packed = ((k4 & 0x0F) | (v4 << 4)).astype(jnp.int8)
    return packed, k_scale, v_scale


def dequantize_kv_int4(packed: jnp.ndarray, k_scale: jnp.ndarray,
                       v_scale: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of `quantize_kv_int4`: kv-fused [..., D] -> (k, v)."""
    p = packed.astype(jnp.int32)
    k4 = (p << 28) >> 28          # sign-extended low nibble
    v4 = p >> 4                   # arithmetic shift keeps the sign
    k = (k4.astype(jnp.float32) * k_scale[..., None]).astype(dtype)
    v = (v4.astype(jnp.float32) * v_scale[..., None]).astype(dtype)
    return k, v


# ── int4 weight-only (fused MLP path) ────────────────────────────────

def quantize_kernel_int4(w: np.ndarray, pack_axis: int = 0):
    """Symmetric per-output-channel int4 ([-7, 7]) with nibble packing.

    w [in, out] -> (packed int8, scale [out] f32). pack_axis selects the
    HALF-AND-HALF pairing that keeps the fused kernel's block streaming
    intact (a block must contain both nibbles of every element it needs):

      pack_axis=0: byte[i, o]   = w[i, o] | w[i + in/2, o] << 4
                   (packed [in/2, out]; use when the kernel blocks the
                   OUT dim and streams full in-columns — the up-proj)
      pack_axis=1: byte[i, o]   = w[i, o] | w[i, o + out/2] << 4
                   (packed [in, out/2]; use when the kernel blocks the
                   IN dim and streams full out-rows — the down-proj)
    """
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=0)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -7, 7).astype(np.int8)
    if pack_axis == 0:
        half = q.shape[0] // 2
        lo, hi = q[:half], q[half:]
    else:
        half = q.shape[1] // 2
        lo, hi = q[:, :half], q[:, half:]
    packed = ((lo.astype(np.uint8) & 0x0F)
              | (hi.astype(np.uint8) << 4)).astype(np.int8)
    return packed, scale


def unpack_int4(packed: jnp.ndarray, pack_axis: int = 0) -> jnp.ndarray:
    """Inverse of the packing above -> int8 values in original order.
    Shift arithmetic runs in int32 (Mosaic-safe) and sign-extends both
    nibbles."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=pack_axis).astype(jnp.int8)


class Int4Kernel(nn.Module):
    """Param holder for a packed int4 kernel + per-channel scale."""

    features: int
    pack_axis: int = 0

    @nn.compact
    def __call__(self, in_features: int):
        shape = ((in_features // 2, self.features) if self.pack_axis == 0
                 else (in_features, self.features // 2))
        kq = self.param("kernel_q4", nn.initializers.zeros, shape,
                        jnp.int8)
        sq = self.param("scale_q", nn.initializers.ones,
                        (self.features,), jnp.float32)
        return kq, sq


def int4_mlp(x: jnp.ndarray, w1p: jnp.ndarray, s1: jnp.ndarray,
             w2p: jnp.ndarray, s2: jnp.ndarray, *, act: str = "gelu",
             block_h: int = 512, interpret: bool = False) -> jnp.ndarray:
    """int4 variant of `int8_mlp`: both weight streams at 0.5
    bytes/weight. w1p [K/2, H] (pack_axis=0), w2p [H, N/2] (pack_axis=1)
    — each grid step's blocks carry both nibbles of every element they
    need, so the unpack is one in-register concat per block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    m, k = x.shape
    k2, h = w1p.shape
    h2, n2 = w2p.shape
    n = n2 * 2
    assert k == k2 * 2 and h == h2, (x.shape, w1p.shape, w2p.shape)
    assert s1.shape == (h,) and s2.shape == (n,)
    bh = min(block_h, h)
    while h % bh:
        bh //= 2
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    s1_2d = s1.reshape(1, h).astype(jnp.float32)
    s2_2d = s2.reshape(1, n).astype(jnp.float32)

    def _erf(z):
        sign = jnp.sign(z)
        z = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * z)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        return sign * (1.0 - poly * jnp.exp(-z * z))

    def _gelu(z):
        return z * 0.5 * (1.0 + _erf(z * 0.7071067811865476))

    act_fn = {"gelu": _gelu, "relu": jax.nn.relu,
              "silu": jax.nn.silu}[act]

    def kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref, acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        w1 = unpack_int4(w1_ref[...], 0).astype(x_ref.dtype)
        hblk = lax.dot_general(
            x_ref[...], w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hblk = act_fn(hblk * s1_ref[...])
        w2 = unpack_int4(w2_ref[...], 1).astype(x_ref.dtype)
        acc[...] += lax.dot_general(
            hblk.astype(x_ref.dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = (acc[...] * s2_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(h // bh,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bh), lambda j: (0, j)),
            pl.BlockSpec((1, bh), lambda j: (0, j)),
            pl.BlockSpec((bh, n // 2), lambda j: (j, 0)),
            pl.BlockSpec((1, n), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, n), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, w1p, s1_2d, w2p, s2_2d)
    return out[:m]


def quantize_params_int4(params: Any) -> Any:
    """int4-pack the fused-MLP weight pairs (decoder ffn up/down, xattn
    ff_up/ff_down); ALL attention projections stay int8 (routing them
    through the packed-int4 Pallas matmul measured slower end-to-end —
    see make_dense). An ffn pair only packs when the module will load it
    through the int4 path: un-biased and not part of a silu_glu
    gate/up/down triple (those fall back to Int8Dense, so their kernels
    are int8-quantized here too — llama/vicuna int4 therefore degrades
    gracefully to int8 MLPs). Matches the param tree of
    TextConfig.quant="int4" models exactly."""
    up_pat = re.compile(
        r"(.*/)?(layers_\d+/ffn/up_proj"
        r"|xattn_\d+/ff_up)/kernel$")
    down_pat = re.compile(
        r"(.*/)?(layers_\d+/ffn/down_proj|xattn_\d+/ff_down)/kernel$")
    attn_pat = re.compile(
        r"(.*/)?(layers_\d+/(attn|ffn)/[^/]+"
        r"|xattn_\d+/attn/(to_q|to_kv|to_out)"
        r"|lm_head)/kernel$")
    flat = traverse_util.flatten_dict(params, sep="/")

    def int4_eligible(key: str) -> bool:
        base = key[: -len("kernel")]
        if base + "bias" in flat:                      # persimmon/fuyu ffn
            return False
        ffn_dir = base.rsplit("/", 2)[0]
        if ffn_dir + "/gate_proj/kernel" in flat:      # silu_glu triple
            return False
        return True

    out = {}
    for key, v in flat.items():
        base = key[: -len("kernel")]
        if (up_pat.match(key) or down_pat.match(key)) \
                and int4_eligible(key):
            axis = 0 if up_pat.match(key) else 1
            q, scale = quantize_kernel_int4(np.asarray(v), pack_axis=axis)
            out[base + "kernel_q4"] = jnp.asarray(q)
            out[base + "scale_q"] = jnp.asarray(scale)
        elif attn_pat.match(key):
            q, scale = quantize_kernel(np.asarray(v))
            out[base + "kernel_q"] = jnp.asarray(q)
            out[base + "scale_q"] = jnp.asarray(scale)
        else:
            out[key] = v
    return traverse_util.unflatten_dict(out, sep="/")


class Int4Dense(nn.Module):
    """XLA fallback for packed-int4 kernels (prefill/training shapes):
    unpack to int8 in-graph, convert-then-dot like Int8Dense."""

    features: int
    pack_axis: int = 0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        shape = ((in_features // 2, self.features) if self.pack_axis == 0
                 else (in_features, self.features // 2))
        kq = self.param("kernel_q4", nn.initializers.zeros, shape,
                        jnp.int8)
        sq = self.param("scale_q", nn.initializers.ones,
                        (self.features,), jnp.float32)
        w = unpack_int4(kq, self.pack_axis).astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), w)
        y = y * sq.astype(self.dtype)[None, :]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,),
                               jnp.float32).astype(self.dtype)
        return y


def int4_matmul(x: jnp.ndarray, wp: jnp.ndarray, scale: jnp.ndarray,
                *, block_out: int = 1024,
                interpret: bool = False) -> jnp.ndarray:
    """Packed-int4 matmul: x [M, K] @ unpack(wp [K/2, N]) * scale [N].

    Grid walks N blocks with the FULL K in each block (pack_axis=0 pairs
    row i with i+K/2, so splitting K would separate an element's nibbles);
    0.5 bytes/weight off HBM, one in-register concat per block. The int8
    single-matmul Pallas route lost to XLA's convert-then-dot at equal
    bytes (commit b04055b) — at half bytes the read saving beats the
    scheduling penalty (measured on the 7B qkv/out, BENCH_NOTES)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    m, k = x.shape
    k2, n = wp.shape
    assert k == k2 * 2 and scale.shape == (n,)
    bo = min(block_out, n)
    while n % bo:
        bo //= 2
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    scale2d = scale.reshape(1, n).astype(jnp.float32)

    def kernel(x_ref, w_ref, s_ref, o_ref):
        w = unpack_int4(w_ref[...], 0).astype(x_ref.dtype)
        acc = lax.dot_general(x_ref[...], w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n // bo,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, bo), lambda i: (0, i)),
            pl.BlockSpec((1, bo), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, bo), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, wp, scale2d)
    return out[:m]


class Int4AttnDense(nn.Module):
    """int4 projection for the attention path: fused Pallas matmul at
    decode shapes, XLA unpack-dot otherwise. Same param tree as
    Int4Dense(pack_axis=0)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kq = self.param("kernel_q4", nn.initializers.zeros,
                        (in_features // 2, self.features), jnp.int8)
        sq = self.param("scale_q", nn.initializers.ones,
                        (self.features,), jnp.float32)
        tokens = 1
        for s in x.shape[:-1]:
            tokens *= s
        if tokens <= 32:
            y = int4_matmul(x.reshape(tokens, in_features)
                            .astype(self.dtype), kq, sq,
                            interpret=jax.default_backend() != "tpu")
            return y.reshape(x.shape[:-1] + (self.features,))
        w = unpack_int4(kq, 0).astype(self.dtype)
        return (jnp.dot(x.astype(self.dtype), w)
                * sq.astype(self.dtype)[None, :])
