"""ChatSession (cross-turn KV prefix cache): every turn's token stream
must EQUAL the stateless engine's stream on the same full prompt —
while actually reusing the cache (verified via last_stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.generation.session import ChatSession, SessionPool
from otter_tpu.models.otter import OtterVLM


def _setup(rng, arch="mpt"):
    cfg = OtterConfig.tiny(arch)
    model = OtterVLM(cfg, dtype=jnp.float32)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vx, jnp.asarray(ids))
    return cfg, model, params, vx, ids


def _session(model, params, cfg):
    return ChatSession(model, params, cfg, cache_len=128,
                       prompt_bucket=16, window_bucket=8, min_reuse=4,
                       cache_dtype=jnp.float32)


def _stateless(engine, vx, ids, gen):
    return list(engine.stream_generate(vx, jnp.asarray(ids), gen=gen))


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_session_multi_turn_matches_stateless(rng, arch):
    """3 chat turns: identical tokens to full re-prefill each turn, with
    turns 2-3 reusing the cached prefix (alibi + rope archs)."""
    cfg, model, params, vx, ids = _setup(rng, arch)
    engine = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    sess = _session(model, params, cfg)
    gen = GenerationConfig(max_new_tokens=6, eos_token_id=-5)

    prompt, expect_reuse = ids, 0
    for turn in range(3):
        ref = _stateless(engine, vx, prompt, gen)
        got = list(sess.stream(vx, jnp.asarray(prompt), gen=gen))
        assert got == ref, f"turn {turn}: {got} != {ref}"
        if turn == 0:
            assert sess.last_stats["restart"]
        else:
            assert not sess.last_stats["restart"]
            # everything the cache held (prev prompt + prev reply) reused
            assert sess.last_stats["reused"] == expect_reuse
        # next turn: emitted reply + eoc + a fresh user turn
        expect_reuse = prompt.shape[1] + len(got)
        extra = np.asarray(rng.integers(5, 200, (1, 5)), np.int32)
        prompt = np.concatenate(
            [prompt, np.asarray([got], np.int32),
             np.asarray([[cfg.eoc_token_id]], np.int32), extra], axis=1)


def test_session_divergent_history(rng):
    """Editing mid-history keeps the common prefix and still matches the
    stateless engine from the divergence point."""
    cfg, model, params, vx, ids = _setup(rng)
    engine = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    sess = _session(model, params, cfg)
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=-5)

    got1 = list(sess.stream(vx, jnp.asarray(ids), gen=gen))
    prompt2 = np.concatenate(
        [ids, np.asarray([got1], np.int32),
         np.asarray(rng.integers(5, 200, (1, 4)), np.int32)], axis=1)
    # edit a token INSIDE the already-cached region (not the tail)
    edited = prompt2.copy()
    edited[0, 6] = (edited[0, 6] + 1) % 200 + 5
    ref = _stateless(engine, vx, edited, gen)
    got = list(sess.stream(vx, jnp.asarray(edited), gen=gen))
    assert got == ref
    assert not sess.last_stats["restart"]      # prefix 0..5 still reused
    assert sess.last_stats["reused"] == 6


def test_session_vision_change_restarts(rng):
    cfg, model, params, vx, ids = _setup(rng)
    engine = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    sess = _session(model, params, cfg)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-5)
    list(sess.stream(vx, jnp.asarray(ids), gen=gen))

    vx2 = jnp.asarray(rng.standard_normal(vx.shape), jnp.float32)
    prompt2 = np.concatenate(
        [ids, np.asarray(rng.integers(5, 200, (1, 3)), np.int32)], axis=1)
    ref = _stateless(engine, vx2, prompt2, gen)
    got = list(sess.stream(vx2, jnp.asarray(prompt2), gen=gen))
    assert got == ref
    assert sess.last_stats["restart"]


def test_session_capacity_error(rng):
    cfg, model, params, vx, ids = _setup(rng)
    sess = _session(model, params, cfg)
    gen = GenerationConfig(max_new_tokens=200, eos_token_id=-5)
    with pytest.raises(ValueError):
        list(sess.stream(vx, jnp.asarray(ids), gen=gen))


def test_session_pool_lru(rng):
    cfg, model, params, vx, ids = _setup(rng)
    pool = SessionPool(model, params, cfg, max_sessions=2,
                       cache_len=128, prompt_bucket=16, window_bucket=8,
                       min_reuse=4, cache_dtype=jnp.float32)
    a = pool.get("a")
    b = pool.get("b")
    assert pool.get("a") is a
    pool.get("c")                      # evicts b (LRU)
    assert pool.get("a") is a          # a survived the eviction
    assert pool.get("b") is not b      # b was rebuilt from scratch
