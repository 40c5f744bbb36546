"""Beam search tests: finds higher-probability sequences than greedy on a
crafted transition model; engine integration (beam=1 ≈ greedy path shape,
beam=2 runs end-to-end on the tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation.beam import beam_search


def test_beam_beats_greedy_on_crafted_model():
    """Classic greedy trap: token 0 looks best first but leads to a dead
    end; token 1 is slightly worse first but then certain."""
    V = 4
    # step logits depend only on previous token
    # prev=0 -> uniform (bad continuation); prev=1 -> token 2 certain
    table = np.full((V, V), -3.0, np.float32)
    table[0] = np.log(np.full(V, 0.25))
    table[1] = [-10, -10, 0.0, -10]       # -> token 2 almost surely
    table[2] = [-10, -10, -10, 0.0]       # -> token 3
    table[3] = [0.0, -10, -10, -10]
    table_j = jnp.asarray(table)

    # first-step logits: token0 slightly better than token1
    init = jnp.asarray([[np.log(0.55), np.log(0.44), np.log(0.005),
                         np.log(0.005)]], jnp.float32)

    def step_fn(tok, cache, t):
        return table_j[tok[:, 0]], cache

    cache = {"dummy": jnp.zeros((2, 1))}  # B*K rows
    out, score = beam_search(step_fn, init, cache, num_beams=2,
                             max_new_tokens=3, eos_token_id=99)
    # greedy would take 0 then suffer; beam should pick 1 -> 2 -> 3
    assert list(np.asarray(out[0])) == [1, 2, 3], np.asarray(out)


def test_beam_eos_finishes():
    V = 3
    init = jnp.asarray([[0.0, -5.0, -5.0]], jnp.float32)

    def step_fn(tok, cache, t):
        # always prefer eos (=2) next
        return jnp.tile(jnp.asarray([[-5.0, -5.0, 0.0]]), (tok.shape[0], 1)), cache

    cache = {"d": jnp.zeros((2, 1))}
    out, score = beam_search(step_fn, init, cache, num_beams=2,
                             max_new_tokens=4, eos_token_id=2,
                             pad_token_id=9)
    o = list(np.asarray(out[0]))
    assert o[0] == 0 and o[1] == 2          # finishes with eos
    assert np.isfinite(float(score[0]))


def test_engine_beam_integration(rng):
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 10)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vision_x, jnp.asarray(ids))
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)

    out = eng.generate(vision_x, ids,
                       gen=GenerationConfig(max_new_tokens=4, num_beams=2))
    assert out.shape == (1, 14)
    # prompt is preserved
    np.testing.assert_array_equal(out[0, :10], ids[0])


def test_stream_beam_final_matches_generate(rng):
    """The last stream_beam_generate yield equals generate(num_beams=k)'s
    continuation, and intermediate yields stream live previews."""
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 10)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vision_x, jnp.asarray(ids))
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)

    gen = GenerationConfig(max_new_tokens=6, num_beams=2)
    full = eng.generate(vision_x, ids, gen=gen)[0, 10:]
    expected = []
    for t in full:
        if int(t) == cfg.eoc_token_id:
            break
        expected.append(int(t))

    yields = list(eng.stream_beam_generate(vision_x, ids, gen=gen,
                                           chunk=2))
    assert len(yields) >= 2          # actually streamed in chunks
    assert yields[-1] == expected, (yields[-1], expected)
