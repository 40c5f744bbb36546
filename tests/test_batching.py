"""Continuous-batching engine tests: per-row cache positions in the
decoder, and the slot-pool scheduler producing exactly the single-stream
engine's tokens under concurrent + staggered admission."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation.batching import ContinuousBatcher, sample_rows
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.models.otter import OtterVLM


def _tiny(rng, b=1, s=10):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vision_x, jnp.asarray(ids))
    return cfg, model, params, vision_x, ids


def _reference_tokens(model, params, cfg, vision_x, ids, max_new):
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    out = eng.generate(vision_x, jnp.asarray(ids),
                       gen=GenerationConfig(max_new_tokens=max_new))
    p = ids.shape[1]
    toks = []
    for t in out[0, p:]:
        if int(t) == cfg.eoc_token_id:
            break
        if int(t) == 0 and toks:
            break
        toks.append(int(t))
    return toks


def test_sample_rows_vectorized_controls():
    logits = jnp.asarray([[0.0, 5.0, 1.0, 2.0],
                          [0.0, 5.0, 1.0, 2.0]])
    # row 0 greedy, row 1 sampled at tiny temperature -> both argmax
    toks = sample_rows(jax.random.PRNGKey(0), logits,
                       do_sample=jnp.asarray([False, True]),
                       temperature=jnp.asarray([1.0, 0.01]),
                       top_k=jnp.asarray([0, 2]),
                       top_p=jnp.asarray([1.0, 0.5]))
    assert list(np.asarray(toks)) == [1, 1]


def test_concurrent_requests_match_single_stream(rng):
    cfg, model, params, _, _ = _tiny(rng)
    prompts = []
    for s in (8, 10, 12):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        prompts.append((vx, ids))

    expected = [_reference_tokens(model, params, cfg, vx, ids, 5)
                for vx, ids in prompts]

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)
    try:
        streams = [batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=5))
                   for vx, ids in prompts]
        got = [list(s) for s in streams]
    finally:
        batcher.shutdown()
    for g, e in zip(got, expected):
        assert g[: len(e)] == e, (g, e)


def test_staggered_admission_and_slot_reuse(rng):
    """More requests than slots: later requests admit into freed slots
    mid-flight and still match the single-stream engine."""
    cfg, model, params, _, _ = _tiny(rng)
    reqs = []
    for s in (8, 9, 10, 11):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        reqs.append((vx, ids))
    expected = [_reference_tokens(model, params, cfg, vx, ids, 4)
                for vx, ids in reqs]

    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)
    try:
        results = [None] * len(reqs)

        def run(i):
            vx, ids = reqs[i]
            results[i] = list(batcher.submit(
                vx, ids, GenerationConfig(max_new_tokens=4)))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for i, t in enumerate(threads):
            t.start()
            if i == 1:
                time.sleep(0.3)   # stagger: last two arrive mid-decode
        for t in threads:
            t.join(timeout=300)
    finally:
        batcher.shutdown()
    for g, e in zip(results, expected):
        assert g is not None
        assert g[: len(e)] == e, (g, e)


def test_per_row_cache_pos_matches_scalar(rng):
    """Vector cache_pos (same offset in every row) must reproduce the
    scalar path exactly."""
    from otter_tpu.models.decoder import init_cache
    cfg, model, params, vx, ids = _tiny(rng, b=2, s=8)
    b, s = ids.shape
    L = 32
    am = jnp.ones((b, s), jnp.int32)
    pos = jnp.cumsum(am, -1) - 1
    cache0 = init_cache(cfg.text, b, L, jnp.float32)
    lg, cache, lat = model.apply(params, vx, jnp.asarray(ids),
                                 attention_mask=am, positions=pos,
                                 cache=cache0)
    media = jnp.sum(jnp.asarray(ids) == cfg.media_token_id, -1)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
    kv_valid = jnp.arange(L)[None, :] <= s
    args = dict(vis_latents=lat, kv_valid=kv_valid,
                positions=jnp.full((b, 1), s, jnp.int32),
                media_counts=media)
    lg_scalar, _, _ = model.apply(params, None, tok, cache=cache,
                                  cache_pos=s, **args)
    lg_vector, _, _ = model.apply(params, None, tok, cache=cache,
                                  cache_pos=jnp.full((b,), s, jnp.int32),
                                  **args)
    np.testing.assert_allclose(np.asarray(lg_vector), np.asarray(lg_scalar),
                               atol=1e-5)


def test_stats_and_admission_cap(rng):
    """Per-request latency records accumulate; admission under decode
    pressure is capped per iteration (max_admits_per_iter)."""
    cfg, model, params, _, _ = _tiny(rng)
    reqs = []
    for s in (8, 10, 12):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        reqs.append((vx, ids))

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                max_admits_per_iter=1)
    try:
        streams = [batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=4))
                   for vx, ids in reqs]
        outs = [list(s) for s in streams]
        stats = batcher.stats()
    finally:
        batcher.shutdown()
    assert all(len(o) >= 1 for o in outs)
    assert stats["completed"] == 3
    assert stats["num_slots"] == 3 and stats["active_slots"] == 0
    assert stats["ttft_p50_s"] > 0
    for rec in stats["recent"]:
        assert rec["new_tokens"] >= 1
        assert rec["ttft_s"] >= rec["queue_s"] >= 0
        assert rec["total_s"] >= rec["ttft_s"]


def test_idefics_through_batcher(rng):
    """The slot-pool batcher is model-family agnostic: IdeficsVLM decodes
    through the same per-row cache_pos path."""
    from otter_tpu.config import idefics_tiny
    from otter_tpu.models.idefics import IdeficsVLM
    cfg = idefics_tiny()
    model = IdeficsVLM(cfg, dtype=jnp.float32)
    vx = jnp.zeros((1, 1, 3, 28, 28), jnp.float32)
    ids = np.asarray(rng.integers(5, 100, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vx, jnp.asarray(ids))
    b = ContinuousBatcher(model, params, cfg, num_slots=2, cache_len=64,
                          buckets=(16,), cache_dtype=jnp.float32)
    try:
        streams = [b.submit(vx, ids, GenerationConfig(max_new_tokens=4))
                   for _ in range(2)]
        outs = [list(s) for s in streams]
    finally:
        b.shutdown()
    assert len(outs[0]) == 4 and outs[0] == outs[1]


def _reference_beam_tokens(model, params, cfg, vision_x, ids, max_new, k,
                           **gkw):
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    out = eng.generate(vision_x, jnp.asarray(ids),
                       gen=GenerationConfig(max_new_tokens=max_new,
                                            num_beams=k, **gkw))
    p = ids.shape[1]
    toks = []
    for t in out[0, p:]:
        if int(t) == cfg.eoc_token_id:
            break
        if int(t) == 0 and toks:
            break
        toks.append(int(t))
    return toks


def test_beam_search_in_slot_pool_matches_engine(rng):
    """num_beams=2 through the batcher (one request = 2 lockstep slots,
    per-step top-2k + cache row reorder) reproduces the single-stream
    jitted beam search's best hypothesis (VERDICT r2 weak #8)."""
    cfg, model, params, _, _ = _tiny(rng)
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    expected = _reference_beam_tokens(model, params, cfg, vx, ids, 5, 2)

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=5,
                                                   num_beams=2)))
    finally:
        batcher.shutdown()
    assert got == expected, (got, expected)


def test_beam_and_greedy_requests_share_the_pool(rng):
    """A beam request (2 slots) and a greedy request (1 slot) decode in
    the same shared step; each gets its single-stream result."""
    cfg, model, params, _, _ = _tiny(rng)
    ids_a = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids_a[:, 0] = cfg.media_token_id
    ids_b = np.asarray(rng.integers(5, 200, (1, 11)), np.int32)
    ids_b[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    exp_beam = _reference_beam_tokens(model, params, cfg, vx, ids_a, 4, 2)
    exp_greedy = _reference_tokens(model, params, cfg, vx, ids_b, 4)

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                max_admits_per_iter=4)
    try:
        s_beam = batcher.submit(vx, ids_a,
                                GenerationConfig(max_new_tokens=4,
                                                 num_beams=2))
        s_greedy = batcher.submit(vx, ids_b,
                                  GenerationConfig(max_new_tokens=4))
        got_beam = list(s_beam)
        got_greedy = list(s_greedy)
    finally:
        batcher.shutdown()
    assert got_beam == exp_beam, (got_beam, exp_beam)
    assert got_greedy[: len(exp_greedy)] == exp_greedy


def test_beam_request_defers_until_slots_free(rng):
    """A num_beams=3 request on a 3-slot pool with a greedy request
    holding a slot: the beam request waits in the deferred queue, then
    runs to completion once the pool frees up."""
    cfg, model, params, _, _ = _tiny(rng)
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    expected = _reference_beam_tokens(model, params, cfg, vx, ids, 4, 3)

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)
    try:
        s_greedy = batcher.submit(
            vx, ids, GenerationConfig(max_new_tokens=6))
        s_beam = batcher.submit(
            vx, ids, GenerationConfig(max_new_tokens=4, num_beams=3))
        got_greedy = list(s_greedy)
        got_beam = list(s_beam)
    finally:
        batcher.shutdown()
    assert len(got_greedy) >= 1
    assert got_beam == expected, (got_beam, expected)


def test_beam_num_beams_capped_at_pool(rng):
    """num_beams > num_slots is clamped instead of deadlocking."""
    cfg, model, params, _, _ = _tiny(rng)
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=3,
                                                   num_beams=8)))
    finally:
        batcher.shutdown()
    assert 0 <= len(got) <= 3


def test_autotune_num_slots_math(rng):
    """num_slots="auto" sizes the pool from the declared HBM budget:
    (budget - params - headroom) // cache-row bytes, clamped to
    [1, max_slots]."""
    from otter_tpu.generation.batching import autotune_num_slots

    cfg, model, params, _, _ = _tiny(rng)
    param_bytes = sum(
        np.prod(x.shape) * jnp.dtype(x.dtype).itemsize
        for x in jax.tree_util.tree_leaves(params))
    t = cfg.text
    row_bytes = (2 * t.num_hidden_layers * 64 * t.hidden_size
                 * jnp.dtype(jnp.float32).itemsize)

    # budget for exactly 3 rows after params + headroom
    n = autotune_num_slots(params, cfg, 64, jnp.float32,
                           hbm_bytes=param_bytes + 3.5 * row_bytes,
                           headroom_bytes=0.0)
    assert n == 3
    # starved budget still returns 1; huge budget clamps at max_slots
    assert autotune_num_slots(params, cfg, 64, jnp.float32,
                              hbm_bytes=0.0) == 1
    assert autotune_num_slots(params, cfg, 64, jnp.float32,
                              hbm_bytes=1e15, max_slots=32) == 32
    # int8 cache rows are ~half the bytes -> at least as many slots
    n8 = autotune_num_slots(params, cfg, 64, jnp.int8,
                            hbm_bytes=param_bytes + 3.5 * row_bytes,
                            headroom_bytes=0.0)
    assert n8 >= n

    batcher = ContinuousBatcher(model, params, cfg, num_slots="auto",
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                hbm_bytes=param_bytes + 3.5 * row_bytes
                                + 1.5e9)
    try:
        assert batcher.n == 3
    finally:
        batcher.shutdown()


def test_async_admission_bookkeeping(rng):
    """First-token forces ride the finisher thread: slots are `pending`
    (excluded from decode, unavailable for re-admission) until the token
    lands, and a flood of submissions larger than the pool still
    delivers every stream exactly (exercises pending -> active -> freed
    -> re-admitted transitions under the async path)."""
    cfg, model, params, _, _ = _tiny(rng)
    reqs = []
    for s in (8, 9, 10, 11, 12, 8):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        reqs.append((vx, ids))
    expected = [_reference_tokens(model, params, cfg, vx, ids, 4)
                for vx, ids in reqs]

    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                max_admits_per_iter=2)
    try:
        streams = [batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=4))
                   for vx, ids in reqs]
        # pool is 2 wide, 6 requests: slots must cycle through pending
        # at least once; the invariant active+pending <= num_slots holds
        # whenever sampled
        for _ in range(10):
            assert sum(s.active or s.pending
                       for s in batcher._slots) <= batcher.n
            time.sleep(0.02)
        got = [list(s) for s in streams]
    finally:
        batcher.shutdown()
    for g, e in zip(got, expected):
        assert g[: len(e)] == e, (g, e)


def test_chunked_prefill_matches_one_shot(rng):
    """prefill_chunk splits admissions into cache-append steps interleaved
    with decode iterations; tokens must be exactly the one-shot engine's.
    One prompt has its <image> mid-prompt, so early chunks PRECEDE the
    media token (exercises the full-prompt xattn-id slicing)."""
    cfg, model, params, _, _ = _tiny(rng)
    prompts = []
    for s, media_pos in ((10, 0), (13, 5), (9, 0)):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, media_pos] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        prompts.append((vx, ids))

    expected = [_reference_tokens(model, params, cfg, vx, ids, 6)
                for vx, ids in prompts]

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32, prefill_chunk=4)
    try:
        # stagger: first request decodes while the others' chunked
        # prefills interleave with its decode iterations
        streams = [batcher.submit(*prompts[0],
                                  gen=GenerationConfig(max_new_tokens=6))]
        time.sleep(0.3)
        streams += [batcher.submit(vx, ids,
                                   GenerationConfig(max_new_tokens=6))
                    for vx, ids in prompts[1:]]
        got = [list(s) for s in streams]
    finally:
        batcher.shutdown()
    for g, e in zip(got, expected):
        assert g[: len(e)] == e, (g, e)


def test_chunked_prefill_cache_equivalent(rng):
    """The assembled chunked local cache matches the one-shot prefill's
    cache (1e-5) at every VALID (attendable) position — the paths run
    different attention programs, so bf16 bit-exactness is not claimed. Pad positions legitimately
    differ at layers >= 1: a pad row's layer-l k/v is a function of its
    layer-(l-1) attention output, and the two paths mask pad QUERIES
    differently (one-shot: eq-ids let pads attend pads; chunked: kv_valid
    excludes pads). Those entries are kv_valid=False forever, so no real
    token ever reads them — the end-to-end token test above is the
    behavioral check."""
    from otter_tpu.generation.batching import left_pad

    cfg, model, params, vx, ids = _tiny(rng, s=13)
    ids[:, 5] = cfg.media_token_id
    gen = GenerationConfig()
    batcher = ContinuousBatcher(model, params, cfg, num_slots=1,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32, prefill_chunk=4)
    try:
        bucket = 16
        padded, mask = left_pad(ids, None, target_len=bucket,
                                pad_id=gen.pad_token_id)
        ref_logits, ref_cache, lat = batcher._get_prefill(bucket)(
            params, vx, jnp.asarray(padded), jnp.asarray(mask))

        from otter_tpu.generation.engine import init_cache
        cache = init_cache(cfg.text, 1, bucket, jnp.float32)
        t_img, n_lat = lat.shape[1], lat.shape[2]
        fn = batcher._get_chunk(bucket, t_img, n_lat)
        last = None
        for ci in range(bucket // 4):
            cache, last = fn(params, cache, lat, jnp.asarray(padded),
                             jnp.asarray(mask), jnp.int32(ci))
        valid = np.asarray(mask[0], bool)          # [bucket]
        for key in ref_cache:
            got = np.asarray(cache[key])
            want = np.asarray(ref_cache[key])
            # cache arrays are [1, NL, hk, bucket(, d)]: position axis 3
            np.testing.assert_allclose(
                got[:, :, :, valid], want[:, :, :, valid],
                atol=1e-5, rtol=1e-5, err_msg=key)
        np.testing.assert_allclose(np.asarray(last),
                                   np.asarray(ref_logits),
                                   atol=1e-4, rtol=1e-4)
    finally:
        batcher.shutdown()


# ── slot-pool speculative decoding ───────────────────────────────────

def _draft_tiny(rng, cfg):
    """A second tiny model sharing the target's vocabulary (different
    weights): plays the draft role in slot-pool speculation."""
    model_d = OtterVLM(cfg)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params_d = model_d.init(jax.random.PRNGKey(7), vx, jnp.asarray(ids))
    return model_d, params_d


def test_spec_pool_greedy_matches_single_stream(rng):
    """Greedy requests through a draft-attached pool emit EXACTLY the
    single-stream engine's greedy tokens (acceptance is argmax equality,
    so speculation is invisible in the output)."""
    cfg, model, params, _, _ = _tiny(rng)
    model_d, params_d = _draft_tiny(rng, cfg)
    prompts = []
    for s in (8, 10, 12):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        prompts.append((vx, ids))
    expected = [_reference_tokens(model, params, cfg, vx, ids, 7)
                for vx, ids in prompts]

    batcher = ContinuousBatcher(model, params, cfg, num_slots=3,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model_d, params_d, cfg),
                                spec_gamma=3)
    try:
        streams = [batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=7))
                   for vx, ids in prompts]
        got = [list(s) for s in streams]
    finally:
        batcher.shutdown()
    for g, e in zip(got, expected):
        assert g[: len(e)] == e, (g, e)


def test_spec_pool_self_draft_accepts_everything(rng):
    """With the TARGET as its own draft, every greedy proposal must be
    accepted: max_new tokens arrive in ceil((max_new-1)/(gamma+1))
    rounds, and the output still matches the plain engine."""
    cfg, model, params, vx, ids = _tiny(rng)
    expected = _reference_tokens(model, params, cfg, vx, ids, 9)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model, params, cfg), spec_gamma=4)
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=9)))
    finally:
        batcher.shutdown()
    assert got[: len(expected)] == expected, (got, expected)


def test_spec_pool_mixed_greedy_sampled_and_reuse(rng):
    """Greedy and sampled requests share one spec pool; more requests
    than slots exercises re-admission into the draft pools. Greedy rows
    must still match the engine exactly; sampled rows must emit valid
    token counts."""
    cfg, model, params, _, _ = _tiny(rng)
    model_d, params_d = _draft_tiny(rng, cfg)
    reqs = []
    for s in (8, 9, 10, 11):
        ids = np.asarray(rng.integers(5, 200, (1, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                         jnp.float32)
        reqs.append((vx, ids))
    expected = [_reference_tokens(model, params, cfg, vx, ids, 5)
                for vx, ids in reqs[:2]]
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model_d, params_d, cfg),
                                spec_gamma=3)
    try:
        gens = [GenerationConfig(max_new_tokens=5),
                GenerationConfig(max_new_tokens=5),
                GenerationConfig(max_new_tokens=5, do_sample=True,
                                 temperature=0.9, top_k=40),
                GenerationConfig(max_new_tokens=5, do_sample=True,
                                 top_p=0.9)]
        results = [None] * len(reqs)

        def run(i):
            results[i] = list(batcher.submit(*reqs[i], gens[i]))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        batcher.shutdown()
    for g, e in zip(results[:2], expected):
        assert g is not None and g[: len(e)] == e, (g, e)
    for g in results[2:]:
        assert g is not None and 0 < len(g) <= 5
        assert all(isinstance(t, int) and t != cfg.eoc_token_id
                   for t in g)


def test_spec_pool_with_chunked_prefill(rng):
    """Chunked target prefill + one-shot draft prefill compose: greedy
    output through the spec pool still matches the engine."""
    cfg, model, params, _, _ = _tiny(rng, s=13)
    model_d, params_d = _draft_tiny(rng, cfg)
    ids = np.asarray(rng.integers(5, 200, (1, 13)), np.int32)
    ids[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    expected = _reference_tokens(model, params, cfg, vx, ids, 6)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32, prefill_chunk=4,
                                draft=(model_d, params_d, cfg),
                                spec_gamma=3)
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=6)))
    finally:
        batcher.shutdown()
    assert got[: len(expected)] == expected, (got, expected)


def test_spec_pool_caps_beams_to_one(rng):
    """A num_beams>1 request into a draft-attached pool degrades to
    num_beams=1 (beams revise their past; the nothing-rolled-back cache
    scheme cannot) and must still stream greedy-exact tokens."""
    cfg, model, params, vx, ids = _tiny(rng)
    expected = _reference_tokens(model, params, cfg, vx, ids, 5)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model, params, cfg), spec_gamma=2)
    try:
        got = list(batcher.submit(
            vx, ids, GenerationConfig(max_new_tokens=5, num_beams=3)))
    finally:
        batcher.shutdown()
    assert got[: len(expected)] == expected, (got, expected)


def test_spec_adaptive_mode_switches_stay_exact(rng):
    """Acceptance-adaptive speculation (round 5): with shrunken
    controller cadence the pool probes the gamma ladder and plain mode,
    switches modes mid-stream (draft-cache catch-up on plain->spec),
    and the greedy output must STILL exactly match the plain engine —
    mode changes are an optimization, never a semantics change."""
    cfg, model, params, _, _ = _tiny(rng)
    model_d, params_d = _draft_tiny(rng, cfg)   # low-acceptance draft
    ids = np.asarray(rng.integers(5, 200, (1, 9)), np.int32)
    ids[:, 0] = cfg.media_token_id
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    max_new = 40
    expected = _reference_tokens(model, params, cfg, vx, ids, max_new)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=128, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model_d, params_d, cfg),
                                spec_gamma=2)
    # shrink the cadence so probes + a stale refresh happen within one
    # 40-token request (production: 32/8/1024)
    batcher._replan_every = 4
    batcher._probe_len = 2
    batcher._stale_every = 12
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=max_new)))
        st = batcher.stats()
    finally:
        batcher.shutdown()
    assert got[: len(expected)] == expected, (got, expected)
    spec = st["spec"]
    assert spec["adaptive"]
    # the controller measured at least two modes (probing happened) and
    # recorded acceptance for the running gamma(s)
    assert len(spec["iter_time_ema_s"]) >= 2, spec
    assert spec["accept_ema_tok_per_round"], spec
    # plain mode ran at some point (a probe or a switch): the draft
    # cache went stale and the catch-up path compiled
    assert "plain" in spec["iter_time_ema_s"], spec


def test_spec_adaptive_off_pins_gamma(rng):
    """spec_adaptive=False never probes: only the configured gamma's
    round fn runs and the output stays exact."""
    cfg, model, params, vx, ids = _tiny(rng)
    expected = _reference_tokens(model, params, cfg, vx, ids, 12)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32,
                                draft=(model, params, cfg), spec_gamma=2,
                                spec_adaptive=False)
    batcher._replan_every = 2
    try:
        got = list(batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=12)))
        st = batcher.stats()
    finally:
        batcher.shutdown()
    assert got[: len(expected)] == expected, (got, expected)
    assert list(st["spec"]["iter_time_ema_s"]) in ([], ["spec_gamma2"]), st


def test_scheduler_failure_fails_streams_instead_of_hanging(rng):
    """A scheduler-thread exception must surface on every consumer
    stream (RuntimeError with the original cause chained), not silently
    kill the thread and leave `out.get()` blocked forever — the failure
    mode a missing model kwarg produced before round 5."""
    cfg, model, params, vx, ids = _tiny(rng)
    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.float32)

    def boom(*a, **k):
        raise ValueError("injected scheduler fault")

    batcher._step = boom
    try:
        stream = batcher.submit(vx, ids, GenerationConfig(max_new_tokens=4))
        with pytest.raises(RuntimeError, match="scheduler thread"):
            list(stream)
        assert isinstance(batcher._failure, ValueError)
        # subsequent submits fail fast instead of enqueueing into a dead
        # scheduler
        with pytest.raises(RuntimeError, match="scheduler thread"):
            batcher.submit(vx, ids, GenerationConfig(max_new_tokens=4))
    finally:
        batcher.shutdown()
