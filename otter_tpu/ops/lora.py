"""LoRA adapters for the decoder projections.

TPU-native replacement for the reference's peft wiring
(`modeling_otter.py:808-829`: LoraConfig targeting `Wqkv` for MPT and
`q_proj`/`v_proj` for llama; `--enable_lora`). A LoRA-wrapped projection
computes  y = W x + (alpha/r) * B (A x)  with A, B trainable and W frozen;
the trainable-mask machinery (train/step.py) picks up the `lora_a`/`lora_b`
params automatically.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from otter_tpu.ops.quant import make_dense

# reference target-module table (modeling_otter.py:813-820)
LORA_TARGETS = {
    "mpt": ("Wqkv",),
    "mosaic_gpt": ("Wqkv",),
    "persimmon": ("Wqkv",),
    "falcon": ("Wqkv",),
    "llama": ("q_proj", "v_proj"),
}


class LoraDense(nn.Module):
    """Dense (optionally int8-quantized) + low-rank residual adapter."""

    features: int
    rank: int
    alpha: float = 16.0
    use_bias: bool = True
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        base = make_dense(self.quant, self.features, use_bias=self.use_bias,
                          dtype=self.dtype, name="base")(x)
        a = self.param("lora_a", nn.initializers.normal(0.02),
                       (x.shape[-1], self.rank), jnp.float32)
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features), jnp.float32)
        scale = self.alpha / self.rank
        delta = (x.astype(self.dtype) @ a.astype(self.dtype)) @ \
            b.astype(self.dtype)
        return base + delta * scale


def maybe_lora_dense(cfg, features: int, *, use_bias: bool, dtype,
                     name: str):
    """Projection factory honoring cfg.lora_rank + per-arch targets."""
    targets = LORA_TARGETS.get(cfg.arch, ())
    if cfg.lora_rank > 0 and name in targets:
        return LoraDense(features, rank=cfg.lora_rank,
                         alpha=cfg.lora_alpha, use_bias=use_bias,
                         quant=cfg.quant, dtype=dtype, name=name)
    return make_dense(cfg.quant, features, use_bias=use_bias, dtype=dtype,
                      name=name)
