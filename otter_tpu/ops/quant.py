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
        # dot's operand read (no dequantized weight materialization). The
        # standalone Pallas int8_matmul above reads weights faster in
        # isolation (765 vs 653 GB/s) but loses in the full decode graph
        # (128 launches/step vs XLA's fused pipeline: 447 vs 461 tok/s on
        # the 7B) — revisit with a fused multi-projection kernel.
        y = jnp.dot(x.astype(self.dtype), kernel_q.astype(self.dtype))
        y = y * scale.astype(self.dtype)[None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quant: Optional[str], features: int, *, use_bias: bool,
               dtype, name: str):
    if quant == "int8":
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
