"""Weight-conversion tests: flax->HF->flax round trip covers every param."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from otter_tpu.config import OtterConfig
from otter_tpu.models.convert import flax_to_hf, hf_to_flax
from otter_tpu.models.otter import OtterVLM


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_roundtrip_covers_all_params(rng, arch):
    cfg = OtterConfig.tiny(arch)
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)["params"]
    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(params, sep="/").items()}

    hf = flax_to_hf(flat, cfg)
    # every flax param must map to an HF name (post_layernorm incl.)
    assert len(hf) == len(flat), (len(hf), len(flat))
    back = hf_to_flax(hf, cfg, strict=True)
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k], err_msg=k)


def test_hf_names_look_like_reference(rng):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)["params"]
    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(params, sep="/").items()}
    hf = flax_to_hf(flat, cfg)
    names = set(hf)
    assert "lang_encoder.transformer.wte.weight" in names
    assert ("vision_encoder.vision_model.encoder.layers.0.self_attn."
            "q_proj.weight") in names
    assert "vision_encoder.vision_model.pre_layrnorm.weight" in names
    assert ("lang_encoder.transformer.blocks.0.decoder_layer.attn."
            "Wqkv.weight") in names
    assert ("lang_encoder.transformer.blocks.1.gated_cross_attn_layer."
            "attn_gate") in names
    assert "perceiver.layers.0.feed_forward.1.weight" in names
    # linear layout transposed
    w = hf["lang_encoder.transformer.blocks.0.decoder_layer.attn.Wqkv.weight"]
    assert w.shape == (3 * cfg.text.hidden_size, cfg.text.hidden_size)
