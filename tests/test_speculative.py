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


def test_speculative_rejects_beams():
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg, dtype=jnp.float32)
    sg = SpeculativeGenerator(model, None, cfg, model, None, cfg)
    with pytest.raises(AssertionError):
        sg.generate(jnp.zeros((1, 1, 1, 3, 28, 28)),
                    jnp.zeros((1, 4), jnp.int32),
                    gen=GenerationConfig(num_beams=4))


def test_speculative_stream_matches_engine_stream(rng):
    """Round-driven streaming yields EXACTLY the engine's stream_generate
    ids (adversarial draft), including an eos cut and max_new clamping
    mid-round."""
    cfg, model, params_t, params_d, vx, ids = _pair(rng, draft_seed=11)
    eng = OtterGenerator(model, params_t, cfg, cache_dtype=jnp.float32)
    sg = SpeculativeGenerator(model, params_t, cfg, model, params_d, cfg,
                              gamma=3, cache_dtype=jnp.float32)
    for max_new in (1, 7, 10):
        gen = GenerationConfig(max_new_tokens=max_new, eos_token_id=-5)
        ref = list(eng.stream_generate(vx, ids, gen=gen))
        got = list(sg.stream(vx, ids, gen=gen))
        assert got == ref, (max_new, got, ref)
    # eos mid-stream: pick a token the greedy path actually emits
    gen_probe = GenerationConfig(max_new_tokens=8, eos_token_id=-5)
    probe = list(eng.stream_generate(vx, ids, gen=gen_probe))
    gen = GenerationConfig(max_new_tokens=8, eos_token_id=probe[4])
    ref = list(eng.stream_generate(vx, ids, gen=gen))
    got = list(sg.stream(vx, ids, gen=gen))
    assert got == ref


def test_accept_resample_distribution():
    """Thm-1 check of the rejection rule: the first emitted token's
    marginal equals the target distribution p0 EXACTLY (empirically,
    20k vectorized draws, fixed seed), for an adversarial draft q."""
    from otter_tpu.generation.speculative import accept_resample

    v, g = 11, 3
    key = jax.random.PRNGKey(42)
    kp, kq, kd, kr = jax.random.split(key, 4)
    p = jax.nn.softmax(jax.random.normal(kp, (g + 1, v)) * 1.5, -1)
    q = jax.nn.softmax(jax.random.normal(kq, (g, v)) * 1.5, -1)

    n_draws = 20000
    keys = jax.random.split(kr, n_draws)
    # each draw proposes from q (its own key) then runs the accept rule
    def one(k):
        k1, k2 = jax.random.split(k)
        d = jax.vmap(lambda kk, qq: jax.random.categorical(
            kk, jnp.log(qq)))(jax.random.split(k1, g), q).astype(jnp.int32)
        out, n = accept_resample(p, q, d, k2)
        return out[0]
    first = np.asarray(jax.jit(jax.vmap(one))(keys))
    emp = np.bincount(first, minlength=v) / n_draws
    tv = 0.5 * np.abs(emp - np.asarray(p[0])).sum()
    assert tv < 0.02, (tv, emp, np.asarray(p[0]))

    # p == q: every proposal is accepted, n is always g+1
    def all_acc(k):
        k1, k2 = jax.random.split(k)
        d = jax.vmap(lambda kk, qq: jax.random.categorical(
            kk, jnp.log(qq)))(jax.random.split(k1, g),
                              p[:g]).astype(jnp.int32)
        _, n = accept_resample(p, p[:g], d, k2)
        return n
    ns = np.asarray(jax.jit(jax.vmap(all_acc))(keys[:2000]))
    assert (ns == g + 1).all()


def test_spec_sampling_near_zero_temperature_is_greedy(rng):
    """do_sample with T~0: the processed distribution is a near-delta at
    the argmax, so sampled speculative output == greedy vanilla output
    (exercises the sampled round end-to-end, adversarial draft)."""
    cfg, model, params_t, params_d, vx, ids = _pair(rng, draft_seed=7)
    gen_g = GenerationConfig(max_new_tokens=8, eos_token_id=-5)
    ref = OtterGenerator(model, params_t, cfg,
                         cache_dtype=jnp.float32).generate(vx, ids,
                                                           gen=gen_g)
    gen_s = GenerationConfig(max_new_tokens=8, eos_token_id=-5,
                             do_sample=True, temperature=0.01)
    spec = SpeculativeGenerator(
        model, params_t, cfg, model, params_d, cfg,
        gamma=3, cache_dtype=jnp.float32).generate(vx, ids, gen=gen_s)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(ref))
    # and through the streaming path
    sg = SpeculativeGenerator(model, params_t, cfg, model, params_d, cfg,
                              gamma=2, cache_dtype=jnp.float32)
    eng = OtterGenerator(model, params_t, cfg, cache_dtype=jnp.float32)
    got = list(sg.stream(vx, ids, gen=gen_s))
    want = list(eng.stream_generate(vx, ids, gen=gen_g))
    assert got == want
