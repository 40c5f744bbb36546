"""IdeficsVLM behavior tests (no torch): image-attention windows, cached
decode vs full forward, and the jitted generation engine driving the model
unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu.config import GenerationConfig, idefics_tiny
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.models.decoder import init_cache
from otter_tpu.models.idefics import IdeficsVLM

IMG, EOS = 126, 2
_tiny_cfg = idefics_tiny


def _setup(rng, b=1, n=2, s=12):
    cfg = _tiny_cfg()
    model = IdeficsVLM(cfg)
    vx = jnp.asarray(rng.standard_normal((b, n, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(3, 100, (b, s)), np.int32)
    ids[:, 1] = IMG
    ids[:, 6] = IMG
    params = model.init(jax.random.PRNGKey(0), vx, jnp.asarray(ids))
    return cfg, model, params, vx, ids


def test_cached_decode_matches_full_forward(rng):
    cfg, model, params, vx, ids = _setup(rng)
    b, s = ids.shape
    full_ids = np.concatenate(
        [ids, np.asarray(rng.integers(3, 100, (b, 4)), np.int32)], axis=1)

    logits_full, _, _ = model.apply(params, vx, jnp.asarray(full_ids))

    # prefill + step-by-step cached decode over the same tokens
    L = 32
    cache = init_cache(cfg.text, b, L, jnp.float32)
    am = jnp.ones((b, s), jnp.int32)
    positions = jnp.cumsum(am, axis=-1) - 1
    lg, cache, lat = model.apply(params, vx, jnp.asarray(ids),
                                 attention_mask=am, positions=positions,
                                 cache=cache)
    np.testing.assert_allclose(np.asarray(lg[:, -1]),
                               np.asarray(logits_full[:, s - 1]),
                               atol=1e-4)
    media_counts = jnp.sum(jnp.asarray(ids) == IMG, axis=-1)
    for t in range(3):
        tok = jnp.asarray(full_ids[:, s + t: s + t + 1])
        pos = jnp.full((b, 1), s + t, jnp.int32)
        kv_valid = jnp.arange(L)[None, :] <= (s + t)  # incl. the new token
        lg, cache, _ = model.apply(
            params, None, tok, vis_latents=lat, cache=cache,
            cache_pos=s + t, kv_valid=kv_valid, positions=pos,
            media_counts=media_counts)
        np.testing.assert_allclose(np.asarray(lg[:, -1]),
                                   np.asarray(logits_full[:, s + t]),
                                   atol=1e-4, err_msg=f"step {t}")


def test_engine_generates_idefics(rng):
    cfg, model, params, vx, ids = _setup(rng)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False)
    out = eng.generate(vx, ids, gen=gen)

    # naive greedy reference: full forward each step
    cur = jnp.asarray(ids)
    naive = []
    for _ in range(5):
        logits, _, _ = model.apply(params, vx, cur)
        nxt = int(jnp.argmax(logits[0, -1]))
        naive.append(nxt)
        if nxt == EOS:
            break
        cur = jnp.concatenate(
            [cur, jnp.full((1, 1), nxt, cur.dtype)], axis=1)
    got = list(out[0, ids.shape[1]: ids.shape[1] + len(naive)])
    assert got == naive, (got, naive)


def test_idefics_freezing_policy_and_train_step(rng):
    """The idefics freezing policy (reference instruction_following.py:
    331-427, freeze_text_layers/vision): only perceiver, gated xattn and
    the decoupled additional vocab train; the loss decreases."""
    from flax import traverse_util
    from otter_tpu.train.step import (TrainState, make_optimizer,
                                      make_train_step, split_params)

    cfg, model, params, vx, ids = _setup(rng, b=2)
    trainable, frozen = split_params(params["params"], cfg)
    t_flat = traverse_util.flatten_dict(trainable, sep="/")
    f_flat = traverse_util.flatten_dict(frozen, sep="/")
    assert any(k.startswith("perceiver/") for k in t_flat)
    assert any(k.startswith("xattn_") for k in t_flat)
    assert any(k.startswith("additional_embedding/") for k in t_flat)
    assert any(k.startswith("additional_fc/") for k in t_flat)
    # the frozen LM/vision halves stay frozen (decoupled design)
    assert not any(k.startswith(("wte/", "lm_head/", "layers_",
                                 "vision_encoder/")) for k in t_flat)
    assert any(k.startswith("wte/") for k in f_flat)

    labels = np.full(ids.shape, -100, np.int32)
    labels[:, 4:10] = ids[:, 4:10]
    batch = {"vision_x": vx, "input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones(ids.shape, jnp.int32),
             "labels": jnp.asarray(labels)}
    tx = make_optimizer(trainable, lr=5e-3, total_steps=20)
    state = TrainState.create(params["params"], cfg, tx)
    step = jax.jit(make_train_step(model, cfg, tx))
    frozen_before = jax.tree_util.tree_leaves(state.frozen)
    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    for a, b in zip(frozen_before, jax.tree_util.tree_leaves(state.frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gated_xattn_blind_tokens_are_image_independent(rng):
    """Token rows whose image window is empty (keep_gate False, e.g. after
    an eos) must produce identical block output regardless of the image
    features (the cross_attention_gate zeroing)."""
    from otter_tpu.models.idefics import IdeficsGatedXAttn
    from otter_tpu.ops.masks import DEFAULT_MASK_VALUE

    cfg = _tiny_cfg()
    blk = IdeficsGatedXAttn(cfg)
    b, s, m = 1, 4, 6
    x = jnp.asarray(rng.standard_normal((b, s, cfg.text.hidden_size)),
                    jnp.float32)
    img_a = jnp.asarray(rng.standard_normal((b, m, cfg.vision.hidden_size)),
                        jnp.float32)
    img_b = jnp.asarray(rng.standard_normal((b, m, cfg.vision.hidden_size)),
                        jnp.float32)
    # tokens 0-1 attend images; tokens 2-3 are blind
    keep = jnp.asarray([[True, True, False, False]])
    bias = jnp.where(keep[:, :, None], 0.0,
                     DEFAULT_MASK_VALUE)[:, None]          # [B,1,S,1]
    bias = jnp.broadcast_to(bias, (b, 1, s, m))
    params = blk.init(jax.random.PRNGKey(0), x, img_a, bias, keep)
    # gates init to zero -> randomize so the attn path is live
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 if p.ndim <= 1 else p, params)
    out_a = blk.apply(params, x, img_a, bias, keep)
    out_b = blk.apply(params, x, img_b, bias, keep)
    np.testing.assert_allclose(np.asarray(out_a[:, 2:]),
                               np.asarray(out_b[:, 2:]), atol=1e-5)
    assert np.max(np.abs(np.asarray(out_a[:, :2])
                         - np.asarray(out_b[:, :2]))) > 1e-3
