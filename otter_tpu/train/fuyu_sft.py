"""OtterHD/Fuyu SFT: full-finetune training on MIMIC-IT data.

The reference trains Fuyu by keeping PIL images through collation and
running FuyuProcessor at batch time (`prepare_fuyu`,
mimicit_dataset.py:497-507: optional dynamic resolution drawn from
{448², 512², 768²}; labels from the \\x04 span, last \\x04 -> EOS), with
the whole model trainable (OtterHD full-finetunes; docs/OtterHD.md).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from otter_tpu.config import FuyuConfig
from otter_tpu.data.fuyu_processor import FuyuProcessor
from otter_tpu.models.fuyu import FuyuVLM
from otter_tpu.train.step import causal_lm_loss

DYNAMIC_RESOLUTIONS = ((448, 448), (512, 512), (768, 768))


class FuyuBatcher:
    """Collates MIMIC-IT samples (full_text + decoded images) into Fuyu
    batches with masked labels."""

    def __init__(self, processor: FuyuProcessor, *,
                 dynamic_resolution: bool = False, seed: int = 0):
        self.processor = processor
        self.dynamic_resolution = dynamic_resolution
        self.rng = random.Random(seed)

    def __call__(self, texts: Sequence[str], images: Sequence) -> Dict:
        resolution = None
        if self.dynamic_resolution:
            resolution = self.rng.choice(DYNAMIC_RESOLUTIONS)
        batch = self.processor(list(texts), list(images),
                               target_resolution=resolution)
        labels = self.processor.get_labels(batch["input_ids"])
        input_ids, labels = self.processor.find_and_remove_tokens(
            batch["input_ids"], labels)
        batch["input_ids"] = input_ids
        batch["labels"] = labels
        return batch


def make_fuyu_train_step(model: FuyuVLM, tx: optax.GradientTransformation,
                         *, mesh=None):
    """Full-model training step: state = {params, opt_state, step}.

    mesh: enables sequence-parallel ring self-attention when the mesh's
    "seq" axis is > 1 (see make_train_step) — OtterHD full-resolution
    sequences (2356+ tokens) are the natural sp customer."""
    import contextlib

    from otter_tpu.ops.attention import sequence_parallel

    def loss_fn(params, batch):
        ctx = (sequence_parallel(mesh) if mesh is not None
               else contextlib.nullcontext())
        with ctx:
            logits, _ = _apply(params, batch)
        loss, n = causal_lm_loss(logits, jnp.asarray(batch["labels"]))
        return loss, {"loss": loss, "tokens": n}

    def _apply(params, batch):
        return model.apply(
            {"params": params}, jnp.asarray(batch["input_ids"]),
            image_patches=jnp.asarray(batch["image_patches"]),
            image_patches_indices=jnp.asarray(
                batch["image_patches_indices"]),
            attention_mask=jnp.asarray(batch["attention_mask"]))

    def step(state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], batch)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}, metrics

    return step
