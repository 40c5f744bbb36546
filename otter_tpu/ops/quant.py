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
        # scale on the OUTPUT side: the int8->bf16 convert then fuses into
        # the dot's operand read (no dequantized weight materialization,
        # HBM traffic stays at 1 byte/weight)
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
