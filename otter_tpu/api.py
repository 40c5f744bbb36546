"""User-facing model API mirroring the reference's public surface
(`from otter_ai import OtterForConditionalGeneration,
FlamingoForConditionalGeneration`, src/otter_ai/__init__.py:1-3).

These wrap config + param pytree + the jitted engine behind the familiar
forward/generate methods (reference `modeling_otter.py:917-1041`). Flamingo
differs only by `use_media_placement_augmentation` (random attend_previous
during training, modeling_flamingo.py:451).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu import config as cfgmod
from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.models.otter import OtterVLM
from otter_tpu.train.step import causal_lm_loss

CONFIGS = {
    "mpt7b": cfgmod.otter_mpt7b,
    "mpt1b": cfgmod.otter_mpt1b,
    "llama7b-video": cfgmod.otter_llama7b_video,
    "tiny": lambda: OtterConfig.tiny("mpt"),
}


class OtterForConditionalGeneration:
    """Stateful convenience wrapper over the functional OtterVLM."""

    use_media_placement_augmentation = False

    def __init__(self, cfg: OtterConfig, params=None,
                 dtype=jnp.bfloat16, rng_seed: int = 0):
        if self.use_media_placement_augmentation:
            cfg = cfg.replace(use_media_placement_augmentation=True)
        self.cfg = cfg
        self.dtype = dtype
        self.model = OtterVLM(cfg, dtype=dtype)
        if params is None:
            vx = jnp.zeros((1, 1, 1, 3, cfg.vision.image_size,
                            cfg.vision.image_size), dtype)
            ids = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(rng_seed), vx, ids)
        self.params = params
        self._engine = None
        self._fwd = jax.jit(lambda p, v, l, m: self.model.apply(
            p, v, l, attention_mask=m)[0])

    # ── loading ─────────────────────────────────────────────────────

    @classmethod
    def from_pretrained(cls, checkpoint_path: str,
                        config: str | OtterConfig = "mpt7b",
                        dtype=jnp.bfloat16) -> "OtterForConditionalGeneration":
        from otter_tpu.models.convert import load_otter_checkpoint
        cfg = CONFIGS[config]() if isinstance(config, str) else config
        self = cls(cfg, params=None, dtype=dtype)
        self.params = load_otter_checkpoint(
            checkpoint_path, self.cfg, self.params, dtype=dtype)
        return self

    # ── reference surface ───────────────────────────────────────────

    @property
    def engine(self) -> OtterGenerator:
        if self._engine is None:
            self._engine = OtterGenerator(self.model, self.params, self.cfg)
        return self._engine

    def __call__(self, vision_x, lang_x, attention_mask=None, labels=None):
        """forward (modeling_otter.py:917): returns (loss or None, logits)."""
        lang_x = jnp.asarray(lang_x)
        if attention_mask is None:
            attention_mask = jnp.ones_like(lang_x)
        logits = self._fwd(self.params, jnp.asarray(vision_x), lang_x,
                           jnp.asarray(attention_mask))
        loss = None
        if labels is not None:
            loss, _ = causal_lm_loss(logits, jnp.asarray(labels))
        return loss, logits

    def generate(self, vision_x, lang_x, attention_mask=None,
                 **generate_kwargs) -> np.ndarray:
        """generate (modeling_otter.py:999): eos defaults to
        <|endofchunk|>."""
        known = {f for f in GenerationConfig.__dataclass_fields__}
        kwargs = {k: v for k, v in generate_kwargs.items() if k in known}
        kwargs.setdefault("eos_token_id", self.cfg.eoc_token_id)
        if "max_length" in generate_kwargs and \
                "max_new_tokens" not in kwargs:
            kwargs["max_new_tokens"] = max(
                int(generate_kwargs["max_length"]) - np.asarray(
                    lang_x).shape[1], 1)
        gen = GenerationConfig(**kwargs)
        return self.engine.generate(jnp.asarray(vision_x), lang_x,
                                    attention_mask=attention_mask, gen=gen)

    def encode_vision(self, vision_x):
        """vision latents for reuse across turns (use_cached_vision_x)."""
        return self.model.apply(self.params, jnp.asarray(vision_x),
                                method=OtterVLM.encode_vision)


class FlamingoForConditionalGeneration(OtterForConditionalGeneration):
    use_media_placement_augmentation = True
