"""Model preset tests: every reference JSON preset
(`src/otter_ai/models/flamingo/flamingo-*.json`) has a builder in
otter_tpu.config.PRESETS; each constructs, traces through OtterVLM.init
abstractly (no memory), lands at the right parameter count, and converts
HF<->flax at a downscaled shape."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from otter_tpu.config import PRESETS, OtterConfig
from otter_tpu.models.convert import flax_to_hf, hf_to_flax
from otter_tpu.models.otter import OtterVLM

# decoder-only param counts (approx, in billions) of the reference backbones
EXPECTED_B = {
    "mpt1b": (1.0, 1.6), "mpt7b": (6.0, 7.5), "mpt30b": (28.0, 32.0),
    "llama7b-video": (6.0, 7.5), "llama2-chat-7b": (6.0, 7.5),
    "llama2-chat-13b": (12.0, 14.0), "vicuna-7b": (6.0, 7.5),
    "vicuna-33b": (30.0, 34.0), "falcon7b": (6.0, 7.5),
}


def _abstract_params(cfg: OtterConfig):
    model = OtterVLM(cfg)
    vx = jax.ShapeDtypeStruct((1, 1, 1, 3, cfg.vision.image_size,
                               cfg.vision.image_size), jnp.float32)
    ids = jax.ShapeDtypeStruct((1, 8), jnp.int32)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), vx, ids)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_traces_and_param_count(name):
    cfg = PRESETS[name]()
    shapes = _abstract_params(cfg)
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    lm = sum(int(np.prod(v.shape)) for k, v in flat.items()
             if k.startswith("lang_encoder/") and "xattn" not in k)
    lo, hi = EXPECTED_B[name]
    assert lo <= lm / 1e9 <= hi, (name, lm / 1e9)
    # media/eoc ids must be addressable rows of the embedding
    total_vocab = cfg.text.total_vocab
    assert cfg.media_token_id < total_vocab
    assert cfg.eoc_token_id < total_vocab


def _downscale(cfg: OtterConfig) -> OtterConfig:
    """Keep arch/flags, shrink dims so a converter round trip is cheap."""
    heads = min(cfg.text.num_attention_heads, 4)
    text = dataclasses.replace(
        cfg.text, vocab_size=128, extra_vocab=min(cfg.text.extra_vocab, 2),
        hidden_size=16 * heads, num_hidden_layers=2,
        num_attention_heads=heads,
        num_kv_heads=(1 if cfg.text.num_kv_heads == 1 else None),
        intermediate_size=(None if cfg.text.intermediate_size is None
                           else 32 * heads),
        max_seq_len=64)
    vision = dataclasses.replace(
        cfg.vision, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, image_size=28,
        patch_size=14)
    perceiver = dataclasses.replace(cfg.perceiver, dim=64, depth=2,
                                    dim_head=16, heads=4, num_latents=8)
    return dataclasses.replace(
        cfg, text=text, vision=vision, perceiver=perceiver,
        cross_attn_every_n_layers=min(cfg.cross_attn_every_n_layers, 2),
        xattn_dim_head=16, xattn_heads=4,
        media_token_id=120, eoc_token_id=121)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_converter_roundtrip(rng, name):
    cfg = _downscale(PRESETS[name]())
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = jnp.asarray(rng.integers(0, 100, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)["params"]
    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(params, sep="/").items()}
    hf = flax_to_hf(flat, cfg)
    assert len(hf) == len(flat), (len(hf), len(flat))
    back = hf_to_flax(hf, cfg, strict=True)
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k], err_msg=k)


def test_config_dict_roundtrip_reconstructs_nested_dataclasses():
    """from_dict must rebuild VisionConfig/TextConfig/PerceiverConfig as
    dataclasses, not leave them as dicts (regression: stringized
    annotations made the is_dataclass(f.type) check always False, so
    OtterConfig.load / sft --model_config JSON produced configs whose
    .vision.hidden_size raised AttributeError)."""
    cfg = OtterConfig.tiny("mpt")
    back = OtterConfig.from_dict(cfg.to_dict())
    assert back == cfg
    assert not isinstance(back.vision, dict)
    assert not isinstance(back.text, dict)
    assert not isinstance(back.perceiver, dict)
