"""Unified decoder-only LM backbone (flax.linen).

One parameterized implementation covers the reference's five backbones —
selected by `TextConfig.arch`:

  - "mpt"        MPT-7B/30B: ALiBi, LPLayerNorm, fused Wqkv, no biases,
                 tied embeddings, GELU MLP
                 (reference `src/otter_ai/models/mpt/modeling_mpt.py:40-458`,
                 `blocks.py:23-90`, `attention.py:225-316`)
  - "mosaic_gpt" older Mosaic variant, same structure
                 (reference `mpt_redpajama/mosaic_gpt.py:26`)
  - "llama"      RoPE, RMSNorm, SwiGLU, untied head
                 (reference `xformers_model/llama.py:95-790`)
  - "falcon"     rotary, fused-qkv multiquery, parallel attn+MLP block
                 (reference `falcon/modelling_RW.py:49-507`)
  - "persimmon"  partial rotary, per-head QK-layernorm, squared-ReLU MLP,
                 biases everywhere
                 (reference `fuyu/modeling_persimmon.py:111-320`)

The Flamingo-style gated cross-attention interleave (`init_otter`,
`modeling_otter.py:459-483` — runtime module surgery in the reference) is
static model structure here: a `GatedCrossAttentionBlock` before every
`cross_attn_every_n_layers`-th decoder layer, active when `vis_latents` is
passed.

Functional KV-cache decoding: the cache is an explicit input/output pytree
(no module state), replacing HF `past_key_values` plumbing
(`modeling_mpt.py:460-483`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from otter_tpu.config import OtterConfig, TextConfig
from otter_tpu.models.xattn import GatedCrossAttentionBlock
from otter_tpu.ops.attention import multi_head_attention
from otter_tpu.ops.layers import (ACTIVATIONS, apply_rotary, layer_norm,
                                  rms_norm, rotary_tables)
from otter_tpu.ops.masks import DEFAULT_MASK_VALUE, alibi_slopes


def _norm(cfg: TextConfig, dtype, name: str):
    """Norm factory honoring norm_type and no_bias (MPT removes LN biases,
    `modeling_mpt.py:83-87`; falcon keeps LN biases even with bias-free
    linears, `falcon/modelling_RW.py:368`)."""
    if cfg.norm_type == "rmsnorm":
        return RMSNormModule(eps=cfg.norm_eps, dtype=dtype, name=name)
    use_bias = (not cfg.no_bias) or cfg.arch == "falcon"
    return LPLayerNormModule(eps=cfg.norm_eps, use_bias=use_bias,
                             dtype=dtype, name=name)


class LPLayerNormModule(nn.Module):
    eps: float = 1e-5
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
             if self.use_bias else None)
        return layer_norm(x.astype(self.dtype), w, b, eps=self.eps)


class RMSNormModule(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        return rms_norm(x.astype(self.dtype), w, eps=self.eps)


class SelfAttention(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, positions=None, attn_ids=None, bias=None,
                 cache=None, kv_valid=None, cache_pos=None, layer: int = 0,
                 project_out: bool = True):
        """x: [B, S, D]. Prefill (cache=None or writing from 0) uses the
        causal Pallas kernel; decode (cache with q_len small) uses dense
        attention against the cache. `cache` is the full stacked pytree
        (see init_cache); `layer` selects this layer's slot on axis 1.

        Returns (out [B,S,D], new_cache_entry or None); with
        project_out=False returns (raw [B,S,h*d], (out_kernel_q, out_scale),
        new_cache_entry) so the caller can run the fused layer-tail kernel
        (out-proj params still live at attn/out_proj, checkpoint-compatible).
        """
        from otter_tpu.ops.lora import maybe_lora_dense
        c = self.cfg
        b, s, d_model = x.shape
        h, hk, d = c.num_attention_heads, c.kv_heads, c.head_dim
        use_bias = not c.no_bias
        dense = lambda feat, name: maybe_lora_dense(
            c, feat, use_bias=use_bias, dtype=self.dtype, name=name)

        if c.arch in ("mpt", "mosaic_gpt"):
            if hk != h:
                # MultiQueryAttention: fused Wqkv emits [q (d_model) |
                # k (hk*d) | v (hk*d)] (reference mpt/attention.py:317-363,
                # Wqkv out = d_model + 2*head_dim for hk=1; qk_ln then
                # norms the hk*d-wide k — :338-345)
                qkv = dense(d_model + 2 * hk * d, "Wqkv")(x)
                q = qkv[..., :d_model]
                k = qkv[..., d_model: d_model + hk * d]
                v = qkv[..., d_model + hk * d:]
            else:
                qkv = dense(3 * d_model, "Wqkv")(x)
                q, k, v = jnp.split(qkv, 3, axis=-1)
        elif c.arch == "falcon":
            # fused multiquery layout: [q (h*d) | k (hk*d) | v (hk*d)]
            qkv = dense((h + 2 * hk) * d, "Wqkv")(x)
            q = qkv[..., : h * d]
            k = qkv[..., h * d: (h + hk) * d]
            v = qkv[..., (h + hk) * d:]
        elif c.arch == "persimmon":
            qkv = dense(3 * d_model, "Wqkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:  # llama
            q = dense(h * d, "q_proj")(x)
            k = dense(hk * d, "k_proj")(x)
            v = dense(hk * d, "v_proj")(x)

        if c.clip_qkv:
            q = jnp.clip(q, -c.clip_qkv, c.clip_qkv)
            k = jnp.clip(k, -c.clip_qkv, c.clip_qkv)
            v = jnp.clip(v, -c.clip_qkv, c.clip_qkv)

        if c.qk_ln and c.arch in ("mpt", "mosaic_gpt"):
            # full-width LPLayerNorm on q/k (mpt/attention.py:246-251)
            q = LPLayerNormModule(eps=c.norm_eps, use_bias=use_bias,
                                  dtype=self.dtype, name="q_ln")(q)
            k = LPLayerNormModule(eps=c.norm_eps, use_bias=use_bias,
                                  dtype=self.dtype, name="k_ln")(k)

        def split(t, heads):
            return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q, h), split(k, hk), split(v, hk)

        if c.qk_ln and c.arch == "persimmon":
            # per-head layernorm (fuyu/modeling_persimmon.py:286-287)
            q = PerHeadLN(eps=c.norm_eps, dtype=self.dtype, name="q_ln")(q)
            k = PerHeadLN(eps=c.norm_eps, dtype=self.dtype, name="k_ln")(k)

        if c.pos == "rope":
            rot_dim = int(d * c.rope_partial_factor)
            cos, sin = rotary_tables(rot_dim, c.max_seq_len,
                                     theta=c.rope_theta)
            if positions is None:
                positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            q, k = apply_rotary(q, k, cos, sin, positions, rotary_dim=rot_dim)

        if c.qk_ln and c.arch == "llama":
            # idefics: per-head RMSNorm on q/k AFTER rope
            # (HF modeling_idefics.py IdeficsAttention.qk_layer_norms; the
            # reference trains idefics via instruction_following.py:331-427).
            # HF norms the full cached k at read time; RMS is per-position,
            # so norming at write time is equivalent.
            q = PerHeadRMS(eps=c.norm_eps, dtype=self.dtype, name="q_ln")(q)
            k = PerHeadRMS(eps=c.norm_eps, dtype=self.dtype, name="k_ln")(k)

        new_cache = None
        # int4 cache: k|v nibble-fused into one "kv" array (quant.py)
        int4_cache = cache is not None and "kv" in cache
        quant_cache = int4_cache or (
            cache is not None and cache["k"].dtype == jnp.int8)

        def write_cache(cache, k, v, pos):
            """Append k/v [B,hk,S,D] at offset `pos` (scalar, or [B] with
            S==1) into the stacked cache, quantizing when it is int8."""
            upd = dict(cache)
            if int4_cache:
                from otter_tpu.ops.quant import quantize_kv_int4
                kvq, ksc, vsc = quantize_kv_int4(k, v)
                vals = {"kv": kvq, "k_scale": ksc, "v_scale": vsc}
            elif quant_cache:
                from otter_tpu.ops.quant import quantize_kv
                (kq, ksc), (vq, vsc) = quantize_kv(k), quantize_kv(v)
                vals = {"k": kq, "v": vq, "k_scale": ksc, "v_scale": vsc}
            else:
                vals = {"k": k, "v": v}
            for key, val in vals.items():
                dst = cache[key]
                val = val.astype(dst.dtype)
                if getattr(pos, "ndim", 0) == 1:
                    # per-row offsets, S >= 1 (the continuous batcher's
                    # decode step and its speculative verify windows):
                    # scatter row r's S positions at pos[r]..pos[r]+S-1
                    S = val.shape[2]
                    rows = jnp.arange(b)[:, None]
                    cols = pos[:, None] + jnp.arange(S)[None, :]
                    if val.ndim == 4:    # [B,hk,S,D] values
                        upd[key] = dst.at[rows, layer, :, cols, :].set(
                            val.transpose(0, 2, 1, 3))
                    else:                # [B,hk,S] scales
                        upd[key] = dst.at[rows, layer, :, cols].set(
                            val.transpose(0, 2, 1))
                else:
                    idx = (0, layer, 0, pos, 0)[:val.ndim + 1]
                    upd[key] = jax.lax.dynamic_update_slice(
                        dst, val[:, None], idx)
            return upd

        if cache is not None and cache_pos is not None and kv_valid is not None:
            # decode: append k,v at cache_pos (into the stacked cache at
            # layer axis 1), attend against this layer's cache. cache_pos
            # may be a scalar (whole batch at one offset — the single-stream
            # engine) or a [B] vector (per-row offsets — the
            # continuous-batching engine, where each slot has its own
            # length).
            new_cache = write_cache(cache, k, v, cache_pos)
            main = new_cache["kv" if int4_cache else "k"]
            if self._use_decode_kernel(main) and s == 1 \
                    and q.shape[1] == main.shape[2]:
                # Pallas decode kernel on the STACKED cache: the layer is
                # selected inside the BlockSpec index map, so the kernel
                # reads its blocks straight from the stacked buffer —
                # slicing `cache[:, layer]` outside is a strided slice XLA
                # materializes (one full extra cache read+write per step,
                # ~1.2 ms on the 7B at b8). Valid blocks only; int8 caches
                # dequantize in-register.
                from otter_tpu.ops.decode_attention import decode_attention
                L = main.shape[3]
                idx = jnp.arange(L)[None, :]
                valid = kv_valid.astype(bool)
                lengths = jnp.max(jnp.where(valid, idx + 1, 0), axis=-1)
                starts = jnp.min(jnp.where(valid, idx, L), axis=-1)
                b2 = bias[:, :, 0, :] if bias is not None and \
                    bias.ndim == 4 else bias
                scales = ({"k_scale": new_cache["k_scale"],
                           "v_scale": new_cache["v_scale"],
                           "kv_bits": 4 if int4_cache else 8}
                          if quant_cache else {})
                out = decode_attention(
                    q[:, :, 0, :], main,
                    main if int4_cache else new_cache["v"], lengths,
                    b2, starts=starts, layer=layer,
                    sm_scale=self._scale(), **scales,
                    interpret=jax.default_backend() != "tpu")[:, :, None, :]
            else:
                if int4_cache:
                    from otter_tpu.ops.quant import dequantize_kv_int4
                    ckl, cvl = dequantize_kv_int4(
                        new_cache["kv"][:, layer],
                        new_cache["k_scale"][:, layer],
                        new_cache["v_scale"][:, layer], q.dtype)
                else:
                    ckl = new_cache["k"][:, layer]
                    cvl = new_cache["v"][:, layer]
                    if quant_cache:
                        from otter_tpu.ops.quant import dequantize_kv
                        ckl = dequantize_kv(
                            ckl, new_cache["k_scale"][:, layer], q.dtype)
                        cvl = dequantize_kv(
                            cvl, new_cache["v_scale"][:, layer], q.dtype)
                out = _decode_attention(q, ckl, cvl, kv_valid, bias,
                                        sm_scale=self._scale())
        else:
            # attn_ids: either one [B,S] segment array (padding /
            # sequence_id — eq-mask, causal) or a (q_ids, kv_ids, mode,
            # causal) tuple (prefix-LM rides ids_mode="ge" with
            # causal=False: prefix keys get id 0, others their position,
            # so q_id >= kv_id  <=>  key in prefix OR key <= query)
            if isinstance(attn_ids, tuple):
                qi, ki, ids_mode, causal = attn_ids
            else:
                qi = ki = attn_ids
                ids_mode, causal = "eq", True
            out = multi_head_attention(
                q, k, v, bias=bias, q_ids=qi, kv_ids=ki,
                ids_mode=ids_mode, causal=causal, sm_scale=self._scale())
            if cache is not None:
                # prefill: write k/v at offset 0 into the preallocated cache
                new_cache = write_cache(cache, k, v, 0)

        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        if not project_out:
            from otter_tpu.ops.quant import Int8Kernel
            oq, osc = Int8Kernel(d_model, name="out_proj")(h * d)
            return out, (oq, osc), new_cache
        out = dense(d_model, "out_proj")(out)
        return out, new_cache

    def _scale(self):
        return self.cfg.head_dim ** -0.5

    def _use_decode_kernel(self, cache_k) -> bool:
        """decode_kernel: False | True | "auto". "auto" routes long caches
        through the Pallas length-guarded kernel (measured −20% step time at
        L=2048 vs the einsum path, BENCH_NOTES.md) and keeps short caches on
        XLA einsum (per-(b,h) kernel launch overhead dominates below ~1k).
        int8 caches always use the kernel: the einsum fallback would
        materialize a dequantized bf16 copy of the whole cache each step,
        costing more than the launch overhead at any length. (MQA/GQA
        models where q_heads != kv_heads are gated OFF the kernel by the
        caller regardless — their caches are kv_heads-sized, so the
        einsum dequant copy is proportionally tiny.)"""
        mode = self.cfg.decode_kernel
        if mode == "auto":
            return (cache_k.shape[3] >= 1024
                    or cache_k.dtype == jnp.int8)
        return bool(mode)


class PerHeadRMS(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, S, D]
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        return rms_norm(x.astype(self.dtype), w, eps=self.eps)


class PerHeadLN(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, S, D]
        d = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, w, b, eps=self.eps)


def _decode_attention(q, k, v, kv_valid, bias, *, sm_scale):
    """Dense attention for cached decoding (small q_len against [B,H,L,D]).

    kv_valid: bool [B, L] — key is attendable (written and non-pad).
    bias: optional additive [1|B, H|1, 1|S, L].
    """
    h, hk = q.shape[1], k.shape[1]
    if hk != h:
        k = jnp.repeat(k, h // hk, axis=1)
        v = jnp.repeat(v, h // hk, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = jnp.where(kv_valid[:, None, None, :], logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)


class MLP(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, decoding: bool = True):
        from otter_tpu.ops.quant import (Int4Dense, Int4Kernel, Int8Kernel,
                                         int4_mlp, int8_mlp, make_dense)
        c = self.cfg
        use_bias = not c.no_bias
        d_model = x.shape[-1]
        tokens = 1
        for s in x.shape[:-1]:
            tokens *= s
        # fused int8/int4 decode path: both weight streams in one
        # pallas_call (1 or 0.5 bytes/weight HBM reads + one launch per
        # layer MLP); prefill and training keep the XLA path (large-M MXU
        # tiling). int8 also covers biased + sq_relu MLPs (persimmon:
        # biases everywhere, squared-ReLU — fuyu/modeling_persimmon.py:
        # 173-193); int4 packing stays bias-free (quantize_params_int4
        # keeps biased ffns at int8). `decoding` gates the kernels OFF for
        # training shapes that happen to be tiny (pallas_call has no VJP;
        # the frozen-int8 SFT recipe trains with quantized weights).
        fused_int8 = (decoding and c.quant == "int8" and tokens <= 32
                      and c.act in ("gelu", "silu", "relu", "sq_relu"))
        fused_int4 = (decoding and c.quant == "int4" and not use_bias
                      and tokens <= 32 and c.act in ("gelu", "silu", "relu"))
        if fused_int8 or fused_int4:
            flat = x.reshape(tokens, d_model).astype(self.dtype)
            interp = jax.default_backend() != "tpu"
            if fused_int4:
                kq1, s1 = Int4Kernel(c.mlp_dim, pack_axis=0,
                                     name="up_proj")(d_model)
                kq2, s2 = Int4Kernel(c.hidden_size, pack_axis=1,
                                     name="down_proj")(c.mlp_dim)
                y = int4_mlp(flat, kq1, s1, kq2, s2, act=c.act,
                             interpret=interp)
            elif use_bias:
                kq1, s1, bb1 = Int8Kernel(c.mlp_dim, use_bias=True,
                                          name="up_proj")(d_model)
                kq2, s2, bb2 = Int8Kernel(c.hidden_size, use_bias=True,
                                          name="down_proj")(c.mlp_dim)
                y = int8_mlp(flat, kq1, s1, kq2, s2, act=c.act,
                             b1=bb1, b2=bb2, interpret=interp)
            else:
                kq1, s1 = Int8Kernel(c.mlp_dim, name="up_proj")(d_model)
                kq2, s2 = Int8Kernel(c.hidden_size,
                                     name="down_proj")(c.mlp_dim)
                y = int8_mlp(flat, kq1, s1, kq2, s2, act=c.act,
                             interpret=interp)
            return y.reshape(x.shape[:-1] + (c.hidden_size,))
        if c.quant == "int4" and not use_bias and c.act != "silu_glu":
            # XLA fallback at prefill/training shapes: in-graph unpack
            y = Int4Dense(c.mlp_dim, pack_axis=0, dtype=self.dtype,
                          name="up_proj")(x)
            y = ACTIVATIONS[c.act](y)
            return Int4Dense(c.hidden_size, pack_axis=1, dtype=self.dtype,
                             name="down_proj")(y)
        dense = lambda feat, name: make_dense(
            c.quant, feat, use_bias=use_bias, dtype=self.dtype, name=name)
        if c.act == "silu_glu":
            gate = ACTIVATIONS["silu"](dense(c.mlp_dim, "gate_proj")(x))
            up = dense(c.mlp_dim, "up_proj")(x)
            return dense(c.hidden_size, "down_proj")(gate * up)
        act = ACTIVATIONS[c.act]
        y = dense(c.mlp_dim, "up_proj")(x)
        return dense(c.hidden_size, "down_proj")(act(y))


class _NormScaleHolder(nn.Module):
    """Declares a norm's scale param (same tree as LPLayerNormModule with
    use_bias=False) for the fused layer-tail kernel."""

    @nn.compact
    def __call__(self, d: int):
        return self.param("scale", nn.initializers.ones, (d,), jnp.float32)


class _WQOHolder(nn.Module):
    """Declares the decode megakernel's fused [Wqkv | Wo] int8 operand
    (leaves `attn/wqo_q` [d, 4d] + `attn/wqo_scale` [4d], produced at
    load time by `ops.quant.add_fused_wqo` next to the standard
    per-projection leaves prefill keeps using)."""

    d: int

    @nn.compact
    def __call__(self):
        wqo = self.param("wqo_q", nn.initializers.zeros,
                         (self.d, 4 * self.d), jnp.int8)
        sqo = self.param("wqo_scale", nn.initializers.ones,
                         (4 * self.d,), jnp.float32)
        return wqo, sqo


class _FFNQHolder(nn.Module):
    """Declares the quantized MLP params (same tree as MLP's Int8Kernel
    holders) for the fused layer-tail kernel."""

    mlp_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        from otter_tpu.ops.quant import Int8Kernel
        kq1, s1 = Int8Kernel(self.mlp_dim, name="up_proj")(self.hidden)
        kq2, s2 = Int8Kernel(self.hidden, name="down_proj")(self.mlp_dim)
        return kq1, s1, kq2, s2


class DecoderLayer(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    fused_tail: bool = False

    @nn.compact
    def __call__(self, x, *, positions=None, attn_ids=None, bias=None,
                 cache=None, kv_valid=None, cache_pos=None, layer: int = 0):
        c = self.cfg
        if c.arch == "falcon":
            # falcon-7b parallel attention + MLP off one LN
            # (falcon/modelling_RW.py: parallel_attn)
            ln = _norm(c, self.dtype, "norm_1")(x)
            attn, new_cache = SelfAttention(c, self.dtype, name="attn")(
                ln, positions=positions, attn_ids=attn_ids, bias=bias,
                cache=cache, kv_valid=kv_valid, cache_pos=cache_pos,
                layer=layer)
            mlp = MLP(c, self.dtype, name="ffn")(
                ln, decoding=cache is not None and cache_pos is not None)
            return x + attn + mlp, new_cache

        if (c.megakernel
                and c.quant == "int8" and c.no_bias and not c.qk_ln
                and not c.clip_qkv
                and c.num_attention_heads == c.kv_heads
                and c.norm_type == "low_precision_layernorm"
                and c.act == "gelu"
                and cache is not None and cache_pos is not None
                and getattr(cache_pos, "ndim", 0) == 0
                and x.shape[1] == 1 and x.shape[0] <= 8
                and "k" in cache and cache["k"].dtype != jnp.int8
                and bias is not None
                and (c.head_dim == 128
                     or jax.default_backend() != "tpu")):
            # whole-layer decode megakernel (BENCH_NOTES r3: −16% bare-
            # decoder step vs the composed path): norm_1 + qkv + cached
            # attention + out-proj in one launch over the fused
            # [Wqkv | Wo] leaves (ops.quant.add_fused_wqo); the new
            # token's k/v come back and append via a 128 KB dus. With a
            # SCALAR cache_pos the ALiBi column bias is batch-invariant
            # (rel depends only on cache_pos), so row 0 serves every
            # batch row. Assumes the uniform single-stream kv_valid
            # (arange <= cache_pos).
            from otter_tpu.ops.megakernel import decode_attn_megakernel
            wqo, sqo = _WQOHolder(c.hidden_size, name="attn")()
            ln1 = _NormScaleHolder(name="norm_1")(c.hidden_size)
            bias_col = (bias[0, :, 0, :] if bias.ndim == 4
                        else bias[0]).astype(jnp.float32)
            y, kn, vn = decode_attn_megakernel(
                x[:, 0].astype(self.dtype), cache["k"], cache["v"],
                cache_pos, bias_col, ln1, wqo, sqo, layer=layer,
                eps=c.norm_eps, sm_scale=c.head_dim ** -0.5,
                interpret=jax.default_backend() != "tpu")
            new_cache = dict(cache)
            for key, val in (("k", kn), ("v", vn)):
                new_cache[key] = jax.lax.dynamic_update_slice(
                    cache[key],
                    val[:, None, :, None, :].astype(cache[key].dtype),
                    (0, layer, 0, cache_pos, 0))
            x = y[:, None, :]
            m = _norm(c, self.dtype, "norm_2")(x)
            x = x + MLP(c, self.dtype, name="ffn")(m, decoding=True)
            return x, new_cache


        a = _norm(c, self.dtype, "norm_1")(x)
        tokens = 1
        for sz in x.shape[:-1]:
            tokens *= sz
        # fused decode layer tail: out-proj + residual + norm_2 + MLP in
        # ONE pallas_call (9*d^2 int8 bytes per launch; MPT-style tail).
        # Two designs measured SLOWER than tail-unfused on the 7B:
        # resident-wo (555 vs 601 tok/s — 100MB scoped vmem kills stream
        # double-buffering) and the phased streaming redesign (614 vs 626 —
        # XLA overlaps its own out-proj dot with neighboring work better
        # than a monolithic kernel). Kept behind fused_tail for revisits;
        # default OFF.
        if (self.fused_tail
                and c.quant == "int8" and c.act == "gelu" and c.no_bias
                and c.norm_type == "low_precision_layernorm"
                and tokens <= 32 and cache is not None
                and cache_pos is not None):
            from otter_tpu.ops.quant import Int8Kernel, int8_attn_tail
            raw, (oq, osc), new_cache = SelfAttention(
                c, self.dtype, name="attn")(
                a, positions=positions, attn_ids=attn_ids, bias=bias,
                cache=cache, kv_valid=kv_valid, cache_pos=cache_pos,
                layer=layer, project_out=False)
            ns = _NormScaleHolder(name="norm_2")(c.hidden_size)
            kq1, s1, kq2, s2 = _FFNQHolder(c.mlp_dim, c.hidden_size,
                                           name="ffn")()
            y = int8_attn_tail(
                raw.reshape(tokens, -1).astype(self.dtype),
                x.reshape(tokens, -1).astype(self.dtype),
                oq, osc, ns, kq1, s1, kq2, s2,
                eps=c.norm_eps, act=c.act,
                interpret=jax.default_backend() != "tpu")
            return y.reshape(x.shape), new_cache

        attn, new_cache = SelfAttention(c, self.dtype, name="attn")(
            a, positions=positions, attn_ids=attn_ids, bias=bias,
            cache=cache, kv_valid=kv_valid, cache_pos=cache_pos, layer=layer)
        x = x + attn
        m = _norm(c, self.dtype, "norm_2")(x)
        x = x + MLP(c, self.dtype, name="ffn")(
            m, decoding=cache is not None and cache_pos is not None)
        return x, new_cache


class Decoder(nn.Module):
    """Optionally Flamingo-augmented causal LM.

    `otter_cfg` non-None inserts a GatedCrossAttentionBlock before every
    cross_attn_every_n_layers-th layer (reference `init_otter`,
    modeling_otter.py:459-483, xattn placement `(i+1) % n == 0`).
    """

    cfg: TextConfig
    otter_cfg: Optional[OtterConfig] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids=None, *, merge_embeds=None,
                 attention_mask=None, positions=None,
                 prefix_mask=None, sequence_id=None,
                 vis_latents=None, xattn_q_ids=None, xattn_kv_ids=None,
                 xattn_out_keep=None,
                 cache=None, cache_pos=None, kv_valid=None,
                 output_hidden=False, skip_head=False,
                 head_last_only=False):
        """Returns (logits [B, S, V], new_cache or None); with
        output_hidden=True also the final hidden states (for value heads);
        with skip_head=True returns the final-norm hidden states in place
        of logits WITHOUT the vocab projection (the fused-CE training path
        computes chunked logits against the head weights itself so the
        [B,S,V] array is never materialized).

        head_last_only=True applies the vocab head to the LAST position
        only (logits [B, 1, V]) — the prefill paths of every generation
        engine need only the next-token logits, and materializing the
        full [B, S, V] prefill logits is real HBM at large vocabs (Fuyu's
        262k vocab x a 2356-token full-HD prompt is a 2.5 GB f32 array;
        it OOMs next to the 8B's params at the measured usable-HBM edge —
        BENCH_NOTES round-5 HBM-drift note) and real lm_head FLOPs (S x
        the decode cost) on the TTFT path.

        Prefill/training: cache=None (training) or a preallocated cache with
        cache_pos=None (prefill writes at offset 0). Decode: cache_pos set,
        kv_valid [B, L] marks attendable cache entries.

        merge_embeds: optional (values [B,S,H], mask [B,S]) — positions where
        mask is True take `values` instead of the token embedding (Fuyu image
        patches; replaces the reference's gather_continuous_embeddings
        scatter, fuyu/modeling_fuyu.py:44-77).

        prefix_mask: optional bool [B,S] (prefix-LM, cfg.prefix_lm) — a
        query attends a key iff key<=query OR the key is in the prefix
        (reference `modeling_mpt.py:147-162`). sequence_id: optional int
        [B,S] (cfg.attn_uses_sequence_id) — attention is additionally
        restricted to same-id keys (`modeling_mpt.py:164-172`). Both are
        prefill/training-path arguments; cached decoding attends all
        committed positions via kv_valid either way.
        """
        from otter_tpu.parallel.mesh import (DATA_AXIS, FSDP_AXIS, SEQ_AXIS,
                                             maybe_shard)
        c = self.cfg
        if c.quant_embed:
            # int8 embedding table with per-token-row scales: a residency
            # lever for big-vocab untied models (see TextConfig.quant_embed)
            assert not c.tie_embeddings, \
                "quant_embed requires untied embeddings (the tied head " \
                "would re-read the quantized table at matmul precision)"
            wte_q = self.param("wte_q", nn.initializers.zeros,
                               (c.total_vocab, c.hidden_size), jnp.int8)
            wte_s = self.param("wte_s", nn.initializers.ones,
                               (c.total_vocab,), jnp.float32)
            x = (jnp.take(wte_q, input_ids, axis=0).astype(self.dtype)
                 * jnp.take(wte_s, input_ids, axis=0)[..., None]
                 .astype(self.dtype))
        else:
            embed = nn.Embed(c.total_vocab, c.hidden_size,
                             dtype=self.dtype, name="wte")
            x = embed(input_ids)
        if merge_embeds is not None:
            values, vmask = merge_embeds
            x = jnp.where(vmask[..., None], values.astype(x.dtype), x)
        x = maybe_shard(x, (DATA_AXIS, FSDP_AXIS), SEQ_AXIS, None)
        b, s, _ = x.shape

        if c.pos == "learned":
            wpe = self.param("wpe", nn.initializers.normal(0.02),
                             (c.max_seq_len, c.hidden_size), jnp.float32)
            if positions is None:
                positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            x = x + wpe.astype(self.dtype)[positions]

        decoding = cache is not None and cache_pos is not None
        if c.prefix_lm and prefix_mask is None and not decoding:
            # matches the reference's hard error (`modeling_mpt.py:206`)
            raise ValueError(
                "prefix_mask is a required argument when the decoder is "
                "configured with prefix_lm=True")

        # self-attention bias: ALiBi (column form, matching build_alibi_bias
        # mpt/attention.py:457-464 — softmax-shift-equivalent per row)
        bias = None
        attn_ids = None
        if c.pos == "alibi":
            slopes = alibi_slopes(c.num_attention_heads, c.alibi_bias_max)
            if decoding:
                L = cache_len_of(cache)
                # column j gets j * slope — softmax-shift-equivalent to
                # the reference's (j - query_pos) * slope for every query
                # row (the per-row shift query_pos * slope is constant
                # across that row's softmax), and STEP-INVARIANT: the
                # former (j - last) form changed with cache_pos every
                # step, so XLA rebuilt the [B,H,L] f32 bias inside the
                # decode loop; this form hoists out of the while_loop
                # and the kernel input never re-materializes
                rel = jnp.arange(L, dtype=jnp.int32)
                bias = (rel[None, None, None, :]
                        * slopes[None, :, None, None])   # [1, H, 1, L]
            elif prefix_mask is not None:
                # prefix-LM attends bidirectionally over the prefix, so
                # the column-form softmax-shift trick no longer holds for
                # future keys; the reference switches to the FULL
                # symmetric ALiBi -|i-j|·slope there (build_alibi_bias
                # full=True, mpt/attention.py:457-464)
                pos = jnp.arange(s, dtype=jnp.int32)
                rel2 = -jnp.abs(pos[None, :] - pos[:, None])
                bias = (rel2[None, None].astype(jnp.float32)
                        * slopes[None, :, None, None])
            else:
                rel = jnp.arange(1 - s, 1, dtype=jnp.int32)
                bias = rel[None, None, None, :] * slopes[None, :, None, None]
        if decoding:
            # intra-block causality for s>1 decode steps (scalar cache_pos:
            # chunked prefill / single-stream spec windows; vector [B]
            # cache_pos: the continuous batcher's per-row verify windows)
            if s > 1:
                L = cache_len_of(cache)
                if getattr(cache_pos, "ndim", 0) == 1:
                    qpos = cache_pos[:, None] + jnp.arange(s)[None, :]
                    block_mask = (jnp.arange(L)[None, None, :]
                                  <= qpos[:, :, None])          # [B,s,L]
                    mb = jnp.where(block_mask, 0.0,
                                   DEFAULT_MASK_VALUE)[:, None]
                else:
                    qpos = cache_pos + jnp.arange(s)
                    block_mask = jnp.arange(L)[None, :] <= qpos[:, None]
                    mb = jnp.where(block_mask, 0.0,
                                   DEFAULT_MASK_VALUE)[None, None]
                bias = mb if bias is None else bias + mb
        elif prefix_mask is not None and sequence_id is not None:
            # both restrictions at once cannot ride one id comparison;
            # materialize the combined mask as additive bias (the
            # reference materializes a [B,H,S,S] bias here too,
            # `modeling_mpt.py:147-172`)
            pos = jnp.arange(s, dtype=jnp.int32)
            allowed = (pos[None, :, None] >= pos[None, None, :]) \
                | prefix_mask.astype(bool)[:, None, :]
            allowed &= (sequence_id[:, :, None] == sequence_id[:, None, :])
            if attention_mask is not None:
                allowed &= (attention_mask > 0)[:, None, :]
            mb = jnp.where(allowed, 0.0, DEFAULT_MASK_VALUE)[:, None]
            bias = mb if bias is None else bias + mb
            attn_ids = (None, None, "eq", False)
        elif prefix_mask is not None:
            # prefix-LM via the kernel's "ge" id mask, no S×S bias:
            # prefix keys id 0, other keys their position, queries their
            # position — q_id >= kv_id <=> key in prefix OR key <= query;
            # pad keys get id s+1 (> any query) so nothing attends them
            pos = jnp.arange(s, dtype=jnp.int32)
            ok = (attention_mask > 0 if attention_mask is not None
                  else jnp.ones((b, s), bool))
            qi = jnp.broadcast_to(pos[None], (b, s))
            ki = jnp.where(prefix_mask.astype(bool) & ok, 0, pos[None])
            ki = jnp.where(ok, ki, s + 1)
            attn_ids = (qi, ki.astype(jnp.int32), "ge", False)
        elif sequence_id is not None:
            # block-diagonal same-document attention: the padding eq-mask
            # generalizes directly (pad keys get the sentinel -1)
            ids = sequence_id.astype(jnp.int32)
            if attention_mask is not None:
                ids = jnp.where(attention_mask > 0, ids, -1)
            attn_ids = ids
        elif attention_mask is not None:
            attn_ids = attention_mask.astype(jnp.int32)

        xattn_every = (self.otter_cfg.cross_attn_every_n_layers
                       if self.otter_cfg is not None else 0)

        # gradient checkpointing: rematerialize each decoder layer's
        # activations in the backward pass (the reference's
        # activation_checkpointing_fn per MPTBlock, modeling_mpt.py:326)
        layer_cls = DecoderLayer
        if self.remat and cache is None:
            # prevent_cse=True (the default) is REQUIRED here: the layers
            # run in a plain Python loop (not scan), and without the CSE
            # barrier XLA merges each rematerialized forward back into the
            # original — measured as byte-identical HBM footprints with
            # remat on and off (the dup is CSE'd away, nothing is saved)
            layer_cls = nn.remat(
                DecoderLayer,
                static_argnums=())

        # the stacked cache threads through the layer loop: each layer's
        # update returns the full pytree with its slot written (in-place
        # dus chain under jit)
        cur_cache = cache
        for i in range(c.num_hidden_layers):
            if (xattn_every and (i + 1) % xattn_every == 0
                    and vis_latents is not None):
                oc = self.otter_cfg
                x = GatedCrossAttentionBlock(
                    dim=c.hidden_size, dim_visual=oc.perceiver.dim,
                    dim_head=oc.xattn_dim_head, heads=oc.xattn_heads,
                    ff_mult=oc.xattn_ff_mult,
                    only_attend_immediate_media=oc.only_attend_immediate_media,
                    quant=(c.quant if c.quant_xattn == "follow"
                           else c.quant_xattn),
                    dtype=self.dtype, name=f"xattn_{i}")(
                        x, vis_latents, xattn_q_ids, xattn_kv_ids,
                        xattn_out_keep)
            x, lc = layer_cls(c, self.dtype, fused_tail=c.fused_tail,
                              name=f"layers_{i}")(
                x, positions=positions, attn_ids=attn_ids, bias=bias,
                cache=cur_cache, kv_valid=kv_valid, cache_pos=cache_pos,
                layer=i)
            x = maybe_shard(x, (DATA_AXIS, FSDP_AXIS), SEQ_AXIS, None)
            if cur_cache is not None and lc is not None:
                cur_cache = lc
        new_cache = cur_cache if cache is not None else None

        x = _norm(c, self.dtype, "norm_f")(x)

        if skip_head:
            return x, new_cache
        if head_last_only:
            x = x[:, -1:]
            s = 1
        if c.tie_embeddings:
            logits = embed.attend(x)
        else:
            # untied heads follow the weight-quant policy: at decode the
            # head read is pure bandwidth (fuyu's 262k-vocab bf16 head was
            # 2.1 GB of the per-step read — the single largest OtterHD
            # decode cost, BENCH_NOTES r2); int8 halves it. Quality delta
            # measured by tools/bench_quant_quality.py.
            from otter_tpu.ops.quant import (Int8Kernel, int8_matmul,
                                             make_dense)
            tokens = b * s
            if c.quant in ("int8", "int4") and tokens <= 32 and decoding:
                # decode-shaped head through the Pallas int8 matmul: XLA's
                # convert-then-dot at M=1 read the fuyu head at only
                # ~173 GB/s (6.2 ms/step measured); the streamed kernel
                # reads it at 1 byte/weight in ~256 x 4 MB blocks. (The
                # "single-matmul Pallas routing loses" result is about
                # mid-layer dots XLA can pipeline with neighbors — the
                # head is terminal, nothing overlaps it.)
                kq, sq = Int8Kernel(c.total_vocab, name="lm_head")(
                    c.hidden_size)
                flat = x.reshape(tokens, c.hidden_size).astype(self.dtype)
                logits = int8_matmul(
                    flat, kq, sq, block_out=1024, block_in=4096,
                    interpret=jax.default_backend() != "tpu"
                ).reshape(b, s, c.total_vocab)
            else:
                logits = make_dense(c.quant, c.total_vocab, use_bias=False,
                                    dtype=self.dtype, name="lm_head")(x)
        if c.logit_scale is not None:
            logits = logits * c.logit_scale
        if output_hidden:
            return logits, new_cache, x
        return logits, new_cache


def init_cache(cfg: TextConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Preallocated KV cache: ONE stacked array per k/v with the layer as
    axis 1 ([batch, n_layers, kv_heads, max_len, head_dim]).

    Stacked rather than a dict of per-layer arrays because XLA's
    memory-space-assignment pass staged each 16.8 MB per-layer array
    HBM->VMEM around the in-place cache update and evicted it back every
    decode step (2 full cache passes/layer, measured 2.1 ms/step on the 7B);
    a buffer larger than VMEM is updated in place in HBM. Batch stays axis 0
    so per-row slot scatter (continuous batching) and beam-search row
    gathers are layout-agnostic.

    dtype=jnp.int8 (or the string "int8") builds a QUANTIZED cache:
    int8 entries plus f32 per-(position, head) max-abs scales — half the
    HBM read per decode step where the cache dominates (long contexts),
    dequantized in-register by the Pallas decode kernel. dtype="int4"
    fuses k and v by NIBBLE PLANE into ONE "kv" array (byte = k4 | v4<<4,
    `ops.quant.quantize_kv_int4`): 0.5 bytes per element with the full
    128-lane minor dim — a [.., head_dim/2]-packed layout is lane-padded
    back to int8 size physically and triggered XLA compression copies
    (see quantize_kv_int4's docstring for the measurement)."""
    int4 = dtype == "int4"
    if dtype in ("int8", "int4"):
        dtype = jnp.int8
    shape = (batch, cfg.num_hidden_layers, cfg.kv_heads, max_len,
             cfg.head_dim)
    if int4:
        cache = {"kv": jnp.zeros(shape, jnp.int8)}
    else:
        cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros(shape[:-1], jnp.float32)
        cache["v_scale"] = jnp.zeros(shape[:-1], jnp.float32)
    # Hide the known-zeros provenance from XLA when this runs inside a
    # jit (the engine creates caches inside its generate jits): without
    # the barrier, XLA rewrites the prefill's 32 per-layer
    # dynamic-update-slices against a broadcast(0) base into full-cache
    # pad+copy temps — 2x 2.0 GB HLO temps at b8/L2048 int8, which blew
    # the 15.75G HBM (round-4 OOM forensics, BENCH_NOTES). Behind the
    # barrier the writes stay in-place DUS on one buffer.
    return jax.lax.optimization_barrier(cache)


def cache_len_of(cache) -> int:
    """Sequence capacity of a cache pytree."""
    return cache["kv" if "kv" in cache else "k"].shape[3]
