"""int8 KV cache: quantization numerics, the in-kernel dequant decode
path, cached-decode parity vs the full forward, and engine/batcher
integration. Serving-side memory/bandwidth feature beyond the reference
(which keeps fp16 HF caches); see BENCH_NOTES.md for on-chip numbers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.config import OtterConfig
from otter_tpu.models.decoder import Decoder, init_cache
from otter_tpu.ops.decode_attention import decode_attention
from otter_tpu.ops.quant import dequantize_kv, quantize_kv


def test_quantize_kv_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 64)), jnp.float32)
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 3, 16)
    back = dequantize_kv(q, scale, jnp.float32)
    # max-abs symmetric: error bounded by scale/2 = amax/254 per element
    err = np.abs(np.asarray(back) - np.asarray(x))
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()
    # all-zero rows quantize cleanly (scale guard)
    qz, sz = quantize_kv(jnp.zeros((1, 4)))
    assert np.asarray(qz).max() == 0 and np.isfinite(np.asarray(sz)).all()


def test_decode_attention_int8_matches_dequant(rng):
    """The in-kernel int8 dequant equals attention over the dequantized
    cache (same numbers, half the HBM bytes)."""
    b, h, L, d = 2, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([L // 3, L - 5], jnp.int32)
    bias = jnp.asarray(rng.standard_normal((b, h, L)), jnp.float32) * 0.1

    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    out = decode_attention(q, kq, vq, lengths, bias,
                           k_scale=ks, v_scale=vs, interpret=True)
    ref = decode_attention(q, dequantize_kv(kq, ks, jnp.float32),
                           dequantize_kv(vq, vs, jnp.float32),
                           lengths, bias, interpret=True)
    # the kernel reads scales as bf16 (deliberate: f32 scale traffic
    # costs 25% of the int8 savings at d=128) while dequantize_kv uses
    # f32 exactly — up to ~2^-8 relative skew per (position, head),
    # amplified through softmax. 2e-3 flaked on unlucky draws of the
    # session-scoped rng (order-dependent data); 1e-2 covers the bound.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_int8_cached_decode_close_to_full_forward(rng, arch):
    """Cached decode with an int8 cache tracks the full bf16 forward within
    quantization tolerance, through both the einsum path and the kernel
    (interpret) path."""
    cfg = OtterConfig.tiny(arch).text
    m = Decoder(cfg)
    b, s, max_len = 1, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)

    cache = init_cache(cfg, b, max_len, jnp.int8)
    assert set(cache) == {"k", "v", "k_scale", "v_scale"}
    _, cache = m.apply(params, ids, cache=cache)

    ids_ext = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)), jnp.int32)
    full_logits, _ = m.apply(params, jnp.concatenate([ids, ids_ext], 1))

    pos = s
    for t in range(4):
        tok = ids_ext[:, t:t + 1]
        kv_valid = (jnp.arange(max_len)[None] <= pos)
        logits, cache = m.apply(
            params, tok, cache=cache, cache_pos=pos, kv_valid=kv_valid,
            positions=jnp.full((b, 1), pos, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits[:, pos]),
            atol=0.05, rtol=0.05)
        pos += 1


def test_int8_cached_decode_kernel_path(rng):
    """Same parity with decode_kernel forced on (the serving path that
    realizes the bandwidth saving)."""
    cfg = OtterConfig.tiny("mpt").text.replace(decode_kernel=True)
    m = Decoder(cfg)
    b, s, max_len = 2, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)

    cache = init_cache(cfg, b, max_len, "int8")
    _, cache = m.apply(params, ids, cache=cache)
    full_logits, _ = m.apply(
        params, jnp.concatenate([ids, ids[:, :1]], 1))

    kv_valid = (jnp.arange(max_len)[None] <= s)
    logits, _ = m.apply(
        params, ids[:, :1], cache=cache, cache_pos=s,
        kv_valid=jnp.broadcast_to(kv_valid, (b, max_len)),
        positions=jnp.full((b, 1), s, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(logits[:, 0]), np.asarray(full_logits[:, s]),
        atol=0.05, rtol=0.05)


def test_engine_generate_int8_cache(rng):
    """Greedy generate through OtterGenerator with cache_dtype=int8."""
    from otter_tpu.config import GenerationConfig
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), vx, ids)

    out_bf = OtterGenerator(model, params, cfg).generate(
        vx, ids, gen=GenerationConfig(max_new_tokens=6))
    out_i8 = OtterGenerator(model, params, cfg,
                            cache_dtype=jnp.int8).generate(
        vx, ids, gen=GenerationConfig(max_new_tokens=6))
    assert out_bf.shape == out_i8.shape
    # greedy paths agree on a tiny model unless quantization flips a
    # near-tie; require at least the first tokens to match
    assert np.asarray(out_bf)[0, 0] == np.asarray(out_i8)[0, 0]


def test_batcher_int8_cache(rng):
    """Continuous batching with a quantized slot-pool cache."""
    from otter_tpu.config import GenerationConfig
    from otter_tpu.generation.batching import ContinuousBatcher
    from otter_tpu.models.otter import OtterVLM

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vx, jnp.asarray(ids))

    batcher = ContinuousBatcher(model, params, cfg, num_slots=2,
                                cache_len=64, buckets=(16,),
                                cache_dtype=jnp.int8)
    try:
        streams = [batcher.submit(vx, ids,
                                  GenerationConfig(max_new_tokens=5))
                   for _ in range(2)]
        outs = [list(s) for s in streams]
        assert all(1 <= len(o) <= 5 for o in outs)
    finally:
        batcher.shutdown()


def test_idefics_int8_cached_decode(rng):
    """IDEFICS shares the decoder Attention, so its cached decode works
    with an int8 cache too (worker --model-family idefics --cache-bit
    int8)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_idefics import IMG, _setup

    cfg, model, params, vx, ids = _setup(rng)
    b, s = ids.shape
    full_ids = np.concatenate(
        [ids, np.asarray(rng.integers(3, 100, (b, 2)), np.int32)], axis=1)
    logits_full, _, _ = model.apply(params, vx, jnp.asarray(full_ids))

    L = 32
    cache = init_cache(cfg.text, b, L, jnp.int8)
    am = jnp.ones((b, s), jnp.int32)
    positions = jnp.cumsum(am, axis=-1) - 1
    lg, cache, lat = model.apply(params, vx, jnp.asarray(ids),
                                 attention_mask=am, positions=positions,
                                 cache=cache)
    media_counts = jnp.sum(jnp.asarray(ids) == IMG, axis=-1)
    tok = jnp.asarray(full_ids[:, s:s + 1])
    kv_valid = jnp.arange(L)[None, :] <= s
    lg, cache, _ = model.apply(
        params, None, tok, vis_latents=lat, cache=cache,
        cache_pos=s, kv_valid=kv_valid,
        positions=jnp.full((b, 1), s, jnp.int32),
        media_counts=media_counts)
    np.testing.assert_allclose(np.asarray(lg[:, -1]),
                               np.asarray(logits_full[:, s]),
                               atol=0.05, rtol=0.05)
