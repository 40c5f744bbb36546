"""Generation-engine tests: jitted while-loop decode vs naive full-forward
greedy decode; streaming path consistency; sampling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation import sampling
from otter_tpu.generation.engine import OtterGenerator, left_pad
from otter_tpu.models.otter import OtterVLM


def _tiny_setup(rng, b=2, s=12):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vision_x, jnp.asarray(ids))
    return cfg, model, params, vision_x, ids


def _naive_greedy(model, params, vision_x, ids, steps, eos):
    """Reference decode: full forward each step, argmax of last logits."""
    cur = jnp.asarray(ids)
    out = []
    for _ in range(steps):
        logits, _, _ = model.apply(params, vision_x, cur)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        if nxt == eos:
            break
        cur = jnp.concatenate([cur, jnp.full((cur.shape[0], 1), nxt,
                                             cur.dtype)], axis=1)
    return out


def test_generate_matches_naive_greedy(rng):
    cfg, model, params, vision_x, ids = _tiny_setup(rng, b=1)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    out = eng.generate(vision_x, ids, gen=gen)
    naive = _naive_greedy(model, params, vision_x, ids, 6, cfg.eoc_token_id)
    got = list(out[0, ids.shape[1]:ids.shape[1] + len(naive)])
    assert got == naive, (got, naive)


def test_stream_matches_generate(rng):
    cfg, model, params, vision_x, ids = _tiny_setup(rng, b=1)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    out = eng.generate(vision_x, ids, gen=gen)
    p = ids.shape[1]
    full = [t for t in out[0, p:] if t != gen.pad_token_id]
    if cfg.eoc_token_id in full:
        full = full[: full.index(cfg.eoc_token_id)]
    streamed = list(eng.stream_generate(vision_x, ids, gen=gen))
    assert streamed == [int(t) for t in full]


def test_generate_batched_left_padded(rng):
    cfg, model, params, vision_x, _ = _tiny_setup(rng, b=2)
    ids_a = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids_b = np.asarray(rng.integers(5, 200, (1, 12)), np.int32)
    ids_a[:, 0] = cfg.media_token_id
    ids_b[:, 0] = cfg.media_token_id
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)

    # batched: left-pad both to 12
    batch = np.full((2, 12), 0, np.int32)
    mask = np.zeros((2, 12), np.int32)
    batch[0, 4:] = ids_a[0]
    mask[0, 4:] = 1
    batch[1] = ids_b[0]
    mask[1] = 1
    out = eng.generate(vision_x, batch, attention_mask=mask, gen=gen)

    # single-row references
    out_b = eng.generate(vision_x[1:], ids_b, gen=gen)
    np.testing.assert_array_equal(out[1, 12:], out_b[0, 12:])


def test_left_pad_helper():
    x = np.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    m = np.array([[1, 1, 1, 0], [1, 1, 0, 0]])
    out, mask = left_pad(x, m, target_len=5, pad_id=9)
    np.testing.assert_array_equal(out[0], [9, 9, 1, 2, 3])
    np.testing.assert_array_equal(out[1], [9, 9, 9, 4, 5])
    np.testing.assert_array_equal(mask[0], [0, 0, 1, 1, 1])


def test_ban_repeat_ngrams():
    # sequence ...[7,8],x — 2-gram (7,8) seen at 0-1 followed by 9 → ban 9
    tokens = jnp.asarray([[7, 8, 9, 5, 7, 8, 0, 0]])
    logits = jnp.zeros((1, 12))
    out = sampling.ban_repeat_ngrams(logits, tokens, cur_end=6, ngram=3,
                                     valid_from=0)
    assert out[0, 9] < -1e9
    assert float(jnp.max(jnp.abs(out[0, :9]))) == 0.0


def test_ban_bad_words_unit():
    # phrase (7, 8, 9): tail is [7, 8] → 9 banned; single (4,) always banned
    tokens = jnp.asarray([[1, 2, 7, 8, 0, 0]])
    logits = jnp.zeros((1, 12))
    out = sampling.ban_bad_words(logits, tokens, cur_end=4,
                                 bad_words_ids=((7, 8, 9), (4,)),
                                 valid_from=0)
    assert out[0, 9] < -1e9
    assert out[0, 4] < -1e9
    # no prefix match → no ban
    out2 = sampling.ban_bad_words(logits, tokens, cur_end=3,
                                  bad_words_ids=((7, 8, 9),), valid_from=0)
    assert float(out2[0, 9]) == 0.0


def _assert_phrase_absent(row, phrase):
    n = len(phrase)
    for i in range(len(row) - n + 1):
        assert list(row[i:i + n]) != list(phrase), (row, phrase)


def test_bad_words_greedy(rng):
    cfg, model, params, vision_x, ids = _tiny_setup(rng, b=1)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    p = ids.shape[1]
    base = eng.generate(vision_x, ids,
                        gen=GenerationConfig(max_new_tokens=6))[0, p:]
    phrase = (int(base[0]), int(base[1]))
    out = eng.generate(
        vision_x, ids,
        gen=GenerationConfig(max_new_tokens=6,
                             bad_words_ids=(phrase,)))[0, p:]
    _assert_phrase_absent([int(t) for t in out], phrase)
    # single-token ban changes the first emitted token
    out1 = eng.generate(
        vision_x, ids,
        gen=GenerationConfig(max_new_tokens=6,
                             bad_words_ids=((int(base[0]),),)))[0, p:]
    assert int(out1[0]) != int(base[0])


def test_bad_words_beam(rng):
    cfg, model, params, vision_x, ids = _tiny_setup(rng, b=1)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    p = ids.shape[1]
    base = eng.generate(
        vision_x, ids,
        gen=GenerationConfig(max_new_tokens=5, num_beams=2))[0, p:]
    phrase = (int(base[0]), int(base[1]))
    out = eng.generate(
        vision_x, ids,
        gen=GenerationConfig(max_new_tokens=5, num_beams=2,
                             bad_words_ids=(phrase,)))[0, p:]
    _assert_phrase_absent([int(t) for t in out], phrase)


def test_top_p_keeps_argmax():
    logits = jnp.asarray([[0.0, 10.0, -1.0, 2.0]])
    out = sampling.apply_top_p(logits, 0.1)
    assert out[0, 1] == 10.0
    assert out[0, 0] < -1e9
