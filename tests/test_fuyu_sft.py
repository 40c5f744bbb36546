"""OtterHD/Fuyu training-path test: MIMIC-IT text + images through the
FuyuBatcher into full-finetune steps; loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax
from PIL import Image

pytestmark = pytest.mark.slow

from helpers import TinyTokenizer
from otter_tpu.config import FuyuConfig
from otter_tpu.data.fuyu_processor import FuyuImageProcessor, FuyuProcessor
from otter_tpu.data.templates import format_pair
from otter_tpu.models.fuyu import FuyuVLM
from otter_tpu.train.fuyu_sft import FuyuBatcher, make_fuyu_train_step


class FuyuTok(TinyTokenizer):
    specials = dict(TinyTokenizer.specials)
    specials["\x04"] = 250


def test_fuyu_sft_step_decreases_loss(rng):
    cfg = FuyuConfig.tiny()
    tok = FuyuTok()
    proc = FuyuProcessor(
        tok, FuyuImageProcessor(patch_size=cfg.patch_size,
                                buckets=((8, 8),)),
        image_placeholder_id=cfg.image_placeholder_id,
        image_newline_id=cfg.image_newline_id)
    batcher = FuyuBatcher(proc, dynamic_resolution=False)

    texts = [format_pair("what is shown", "a red square", "fuyu"),
             format_pair("count the dots", "three dots", "fuyu")]
    # fuyu-format answers end without the trailing boa; append one so the
    # get_labels span closes (the collator's training convention)
    texts = [t + "\x04" for t in texts]
    images = [Image.fromarray((rng.random((8, 8, 3)) * 255).astype(
        np.uint8)) for _ in texts]
    batch = batcher(texts, images)
    assert (batch["labels"] != -100).sum() > 0
    assert batch["image_patches_indices"].max() >= 0

    model = FuyuVLM(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["input_ids"]),
        image_patches=jnp.asarray(batch["image_patches"]),
        image_patches_indices=jnp.asarray(
            batch["image_patches_indices"]))["params"]
    tx = optax.adamw(5e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step = jax.jit(make_fuyu_train_step(model, tx))
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
