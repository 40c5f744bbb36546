"""Weight-surgery + fuyu-conversion tests."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from otter_tpu.config import FuyuConfig, OtterConfig
from otter_tpu.models.convert import fuyu_hf_to_flax, flax_to_hf
from otter_tpu.models.fuyu import FuyuVLM
from otter_tpu.tools.surgery import apply_delta, inject_lm_into_flamingo, \
    merge_lora
from otter_tpu.parallel.distributed import world_info_from_env


def test_fuyu_conversion_names(rng):
    cfg = FuyuConfig.tiny()
    model = FuyuVLM(cfg)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    pd = cfg.patch_size ** 2 * 3
    params = model.init(
        jax.random.PRNGKey(0), ids,
        image_patches=jnp.zeros((1, 2, pd), jnp.float32),
        image_patches_indices=jnp.full((1, 8), -1, jnp.int32))["params"]
    flat = traverse_util.flatten_dict(params, sep="/")

    # construct an HF-style fuyu state dict and convert
    t = cfg.text
    sd = {
        "vision_embed_tokens.weight": np.zeros((t.hidden_size, pd),
                                               np.float32),
        "vision_embed_tokens.bias": np.zeros((t.hidden_size,), np.float32),
        "language_model.model.embed_tokens.weight": np.zeros(
            (t.total_vocab, t.hidden_size), np.float32),
        "language_model.model.final_layernorm.weight": np.ones(
            (t.hidden_size,), np.float32),
        "language_model.model.final_layernorm.bias": np.zeros(
            (t.hidden_size,), np.float32),
        "language_model.lm_head.weight": np.zeros(
            (t.total_vocab, t.hidden_size), np.float32),
    }
    for i in range(t.num_hidden_layers):
        b = f"language_model.model.layers.{i}."
        d, hd = t.hidden_size, t.head_dim
        sd[b + "self_attn.query_key_value.weight"] = np.zeros(
            (3 * d, d), np.float32)
        sd[b + "self_attn.query_key_value.bias"] = np.zeros((3 * d,),
                                                            np.float32)
        sd[b + "self_attn.dense.weight"] = np.zeros((d, d), np.float32)
        sd[b + "self_attn.dense.bias"] = np.zeros((d,), np.float32)
        for ln in ("q_layernorm", "k_layernorm"):
            sd[b + f"self_attn.{ln}.weight"] = np.ones((hd,), np.float32)
            sd[b + f"self_attn.{ln}.bias"] = np.zeros((hd,), np.float32)
        sd[b + "mlp.dense_h_to_4h.weight"] = np.zeros(
            (t.mlp_dim, d), np.float32)
        sd[b + "mlp.dense_h_to_4h.bias"] = np.zeros((t.mlp_dim,),
                                                    np.float32)
        sd[b + "mlp.dense_4h_to_h.weight"] = np.zeros(
            (d, t.mlp_dim), np.float32)
        sd[b + "mlp.dense_4h_to_h.bias"] = np.zeros((d,), np.float32)
        sd[b + "input_layernorm.weight"] = np.ones((d,), np.float32)
        sd[b + "input_layernorm.bias"] = np.zeros((d,), np.float32)
        sd[b + "post_attention_layernorm.weight"] = np.ones((d,),
                                                            np.float32)
        sd[b + "post_attention_layernorm.bias"] = np.zeros((d,), np.float32)
    converted = fuyu_hf_to_flax(sd, strict=True)
    assert set(converted) == set(flat), (
        sorted(set(flat) - set(converted))[:5],
        sorted(set(converted) - set(flat))[:5])
    for k in flat:
        assert tuple(converted[k].shape) == tuple(flat[k].shape), k


def test_inject_lm_into_flamingo(rng):
    """Bare MPT names get wrapped with decoder_layer and merge with
    flamingo perceiver/xattn weights into the full tree."""
    cfg = OtterConfig.tiny("mpt")
    from otter_tpu.models.otter import OtterVLM
    model = OtterVLM(cfg)
    vx = jnp.zeros((1, 1, 1, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vx, ids)["params"]
    flat = {k: np.asarray(v) for k, v in traverse_util.flatten_dict(
        params, sep="/").items()}
    hf = flax_to_hf(flat, cfg)

    lm_state = {}
    flamingo_state = {}
    for k, v in hf.items():
        if ".decoder_layer." in k or k in (
                "lang_encoder.transformer.wte.weight",
                "lang_encoder.transformer.norm_f.weight"):
            lm_state[k.replace("lang_encoder.", "", 1).replace(
                ".decoder_layer.", ".")] = v
        else:
            flamingo_state[k] = v
    merged = inject_lm_into_flamingo(lm_state, flamingo_state, cfg)
    assert set(merged) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(merged[k], flat[k], err_msg=k)


def test_apply_delta():
    base = {"a": np.ones(3), "b": np.full(2, 2.0)}
    delta = {"a": np.full(3, 0.5), "b": np.full(2, -1.0)}
    target = apply_delta(base, delta)
    np.testing.assert_allclose(target["a"], 1.5)
    back = apply_delta(base, target, subtract=True)
    np.testing.assert_allclose(back["a"], delta["a"])


def test_merge_lora(rng):
    w = rng.standard_normal((8, 8)).astype(np.float32)
    a = rng.standard_normal((8, 4)).astype(np.float32)
    b = rng.standard_normal((4, 8)).astype(np.float32)
    params = {"attn": {"Wqkv": {"base": {"kernel": w},
                                "lora_a": a, "lora_b": b}}}
    merged = merge_lora(params)
    flat = traverse_util.flatten_dict(merged, sep="/")
    assert "attn/Wqkv/lora_a" not in flat
    np.testing.assert_allclose(flat["attn/Wqkv/base/kernel"],
                               w + a @ b * (16.0 / 4), rtol=1e-5)


def test_world_info_from_env(monkeypatch):
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_LOCALID", "1")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.delenv("RANK", raising=False)
    monkeypatch.delenv("WORLD_SIZE", raising=False)
    monkeypatch.delenv("LOCAL_RANK", raising=False)
    local, rank, world = world_info_from_env()
    assert (local, rank, world) == (1, 3, 8)
