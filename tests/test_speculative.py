"""Speculative decoding: the output must EQUAL the target's own greedy
decode — with an adversarial draft (low acceptance), with the target as
its own draft (full acceptance), and across gamma values/eos cuts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.generation.speculative import SpeculativeGenerator
from otter_tpu.models.otter import OtterVLM


def _pair(rng, draft_seed):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg, dtype=jnp.float32)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    params_t = model.init(jax.random.PRNGKey(0), vx, ids)
    params_d = model.init(jax.random.PRNGKey(draft_seed), vx, ids)
    return cfg, model, params_t, params_d, vx, ids


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_speculative_equals_target_greedy(rng, gamma):
    """Independent draft weights (arbitrary acceptance pattern): spec
    output must match vanilla target-greedy token-for-token."""
    cfg, model, params_t, params_d, vx, ids = _pair(rng, draft_seed=7)
    gen = GenerationConfig(max_new_tokens=9, eos_token_id=-5)
    ref = OtterGenerator(model, params_t, cfg,
                         cache_dtype=jnp.float32).generate(vx, ids,
                                                           gen=gen)
    spec = SpeculativeGenerator(
        model, params_t, cfg, model, params_d, cfg,
        gamma=gamma, cache_dtype=jnp.float32).generate(vx, ids, gen=gen)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(ref))


def test_speculative_self_draft_full_acceptance(rng):
    """Target drafting for itself: every proposal accepted, output still
    exact (exercises the fully-accepted cache-gap path)."""
    cfg, model, params_t, _, vx, ids = _pair(rng, draft_seed=1)
    gen = GenerationConfig(max_new_tokens=10, eos_token_id=-5)
    ref = OtterGenerator(model, params_t, cfg,
                         cache_dtype=jnp.float32).generate(vx, ids,
                                                           gen=gen)
    spec = SpeculativeGenerator(
        model, params_t, cfg, model, params_t, cfg,
        gamma=4, cache_dtype=jnp.float32).generate(vx, ids, gen=gen)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(ref))


def test_speculative_eos_termination(rng):
    """An eos produced mid-round cuts the emission exactly where the
    vanilla engine would stop (eos in buffer, pad after)."""
    cfg, model, params_t, params_d, vx, ids = _pair(rng, draft_seed=3)
    # find the greedy path's own token to use as eos so it triggers
    gen_probe = GenerationConfig(max_new_tokens=8, eos_token_id=-5)
    ref_eng = OtterGenerator(model, params_t, cfg,
                             cache_dtype=jnp.float32)
    probe = np.asarray(ref_eng.generate(vx, ids, gen=gen_probe))
    p = ids.shape[1]
    eos = int(probe[0, p + 3])   # 4th generated token becomes eos
    gen = GenerationConfig(max_new_tokens=8, eos_token_id=eos)
    ref = ref_eng.generate(vx, ids, gen=gen)
    spec = SpeculativeGenerator(
        model, params_t, cfg, model, params_d, cfg,
        gamma=3, cache_dtype=jnp.float32).generate(vx, ids, gen=gen)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(ref))


def test_speculative_rejects_sampling():
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg, dtype=jnp.float32)
    sg = SpeculativeGenerator(model, None, cfg, model, None, cfg)
    with pytest.raises(AssertionError):
        sg.generate(jnp.zeros((1, 1, 1, 3, 28, 28)),
                    jnp.zeros((1, 4), jnp.int32),
                    gen=GenerationConfig(do_sample=True))
