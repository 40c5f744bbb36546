"""Public API surface tests: forward/generate/from_pretrained round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu import (FlamingoForConditionalGeneration, OtterConfig,
                       OtterForConditionalGeneration)


def test_api_forward_and_generate(rng, tmp_path):
    cfg = OtterConfig.tiny("mpt")
    m = OtterForConditionalGeneration(cfg, dtype=jnp.float32)
    b, s = 1, 10
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    labels = np.where(rng.random((b, s)) < 0.5, ids, -100).astype(np.int32)

    loss, logits = m(vision_x, ids, labels=labels)
    assert logits.shape == (b, s, cfg.text.total_vocab)
    assert np.isfinite(float(loss))

    out = m.generate(vision_x, ids, max_new_tokens=4, num_beams=1)
    assert out.shape == (b, s + 4)

    latents = m.encode_vision(vision_x)
    assert latents.shape[2] == cfg.perceiver.num_latents


def test_from_pretrained_roundtrip(rng, tmp_path):
    from flax import traverse_util
    from otter_tpu.models.convert import flax_to_hf
    from safetensors.numpy import save_file

    cfg = OtterConfig.tiny("mpt")
    src = OtterForConditionalGeneration(cfg, dtype=jnp.float32, rng_seed=7)
    flat = {k: np.asarray(v) for k, v in traverse_util.flatten_dict(
        src.params["params"], sep="/").items()}
    path = str(tmp_path / "ckpt.safetensors")
    save_file(flax_to_hf(flat, cfg), path)

    # dst inits with a different seed (0), so matching logits below can
    # only come from the checkpoint actually loading
    dst = OtterForConditionalGeneration.from_pretrained(
        path, config=cfg, dtype=jnp.float32)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    _, l1 = src(vision_x, ids)
    _, l2 = dst(vision_x, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_flamingo_class():
    cfg = OtterConfig.tiny("mpt")
    m = FlamingoForConditionalGeneration(cfg, dtype=jnp.float32)
    assert m.cfg.use_media_placement_augmentation
