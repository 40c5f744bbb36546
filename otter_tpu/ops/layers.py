"""Shared neural-net ops: norms, activations, rotary embeddings.

Numeric conventions follow the reference implementations exactly (the §5
"numeric parity details" of SURVEY.md):
  - LPLayerNorm: input downcast to the compute dtype first, statistics in
    f32, output in compute dtype (reference `mpt/norm.py:16-46`)
  - RMSNorm: variance in f32, normalize, cast, then weight multiply
    (reference `xformers_model/llama.py:95-112`)
  - quick_gelu: x * sigmoid(1.702 x) (CLIP)
  - rotary: HF rotate_half convention (`xformers_model/llama.py:152-168`);
    persimmon partial-rotary applies it to the first `rotary_dim` channels
    (`fuyu/modeling_persimmon.py:294-307`)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray],
               bias: Optional[jnp.ndarray], *, eps: float = 1e-5,
               low_precision: bool = True) -> jnp.ndarray:
    """LayerNorm with f32 statistics.

    `low_precision=True` reproduces LPLayerNorm: the *input* is used at its
    (already downcast) dtype, stats are f32, and the output is cast back.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, *,
             eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(dtype)
    return y * weight.astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU() default = exact erf form
    return jax.nn.gelu(x, approximate=False)


def squared_relu(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.maximum(x, 0)
    return r * r


ACTIVATIONS = {
    "gelu": gelu,
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
    "sq_relu": squared_relu,
}


def rotary_tables(dim: int, max_len: int, *, theta: float = 10000.0,
                  dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [max_len, dim] in the HF duplicated-halves layout."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                   # [max_len, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)   # [max_len, dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                 sin: jnp.ndarray, positions: jnp.ndarray,
                 *, rotary_dim: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary position embedding.

    q, k: [B, H, S, D]; positions: [B, S] int32; cos/sin: [max_len, rot_dim].
    `rotary_dim < D` gives the persimmon partial-rotary behavior: only the
    first rotary_dim channels are rotated, the rest pass through.
    """
    rot = rotary_dim or q.shape[-1]
    c = cos[positions][:, None, :, :].astype(q.dtype)   # [B, 1, S, rot]
    s = sin[positions][:, None, :, :].astype(q.dtype)

    def rope(x):
        xr, xp = x[..., :rot], x[..., rot:]
        xr = xr * c + _rotate_half(xr) * s
        return jnp.concatenate([xr, xp], axis=-1) if xp.shape[-1] else xr

    return rope(q), rope(k)
