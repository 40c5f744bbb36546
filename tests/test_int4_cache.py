"""int4 KV cache (k|v nibble-fused "kv" array, per-position scales):
quantization numerics, in-kernel unpack+dequant decode, model-level
cached decode, engine integration. The next cache halving after int8
(BENCH_NOTES); beyond-reference serving feature.

Layout note: k rides the LOW nibbles and v the HIGH nibbles of one
[.., L, head_dim] int8 array — full 128-lane minor dim. The original
[.., head_dim/2] head-dim-pair packing was lane-padded back to int8
size physically and triggered XLA compression-copy churn (measured
731 ms/step vs 21 at b4 L=4096 on the 7B; see quant.quantize_kv_int4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.config import OtterConfig
from otter_tpu.models.decoder import Decoder, init_cache
from otter_tpu.ops.decode_attention import decode_attention
from otter_tpu.ops.quant import dequantize_kv_int4, quantize_kv_int4


def test_quantize_kv_int4_roundtrip(rng):
    k = jnp.asarray(rng.standard_normal((2, 3, 16, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 16, 64)), jnp.float32)
    kv, ks, vs = quantize_kv_int4(k, v)
    assert kv.dtype == jnp.int8 and kv.shape == (2, 3, 16, 64)
    assert ks.shape == (2, 3, 16) and vs.shape == (2, 3, 16)
    kb, vb = dequantize_kv_int4(kv, ks, vs, jnp.float32)
    assert kb.shape == k.shape and vb.shape == v.shape
    # max-abs symmetric over [-7, 7]: error <= scale/2 = amax/14
    for back, x, scale in ((kb, k, ks), (vb, v, vs)):
        err = np.abs(np.asarray(back) - np.asarray(x))
        bound = np.asarray(scale)[..., None] * 0.5 + 1e-6
        assert (err <= bound).all()
    kvz, ksz, vsz = quantize_kv_int4(jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    assert np.asarray(kvz).max() == 0
    assert np.isfinite(np.asarray(ksz)).all()
    assert np.isfinite(np.asarray(vsz)).all()


def test_int4_nibble_plane_pack_order(rng):
    """byte(d) = k4(d) | v4(d) << 4: both planes unpack to exactly their
    element-wise [-7,7] quantization, including signs."""
    k = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32) * 3
    v = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32) * 3
    kv, ks, vs = quantize_kv_int4(k, v)
    kb, vb = dequantize_kv_int4(kv, ks, vs, jnp.float32)
    for back, x, s in ((kb, k, ks), (vb, v, vs)):
        direct = np.clip(np.round(np.asarray(x)[0] / np.asarray(s)[0]),
                         -7, 7) * np.asarray(s)[0]
        np.testing.assert_allclose(np.asarray(back)[0], direct, atol=1e-6)


def test_decode_attention_int4_matches_dequant(rng):
    """In-kernel nibble unpack+dequant equals attention over the
    dequantized cache (same numbers, quarter the HBM bytes; the fused
    kv operand is passed as both k and v)."""
    b, h, L, d = 2, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([L // 3, L - 5], jnp.int32)
    bias = jnp.asarray(rng.standard_normal((b, h, L)), jnp.float32) * 0.1

    kv, ks, vs = quantize_kv_int4(k, v)
    out = decode_attention(q, kv, kv, lengths, bias,
                           k_scale=ks, v_scale=vs, kv_bits=4,
                           interpret=True)
    kd, vd = dequantize_kv_int4(kv, ks, vs, jnp.float32)
    ref = decode_attention(q, kd, vd, lengths, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_decode_attention_int4_stacked_layer_mode(rng):
    b, nl, h, L, d, layer = 1, 3, 2, 256, 128, 1
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nl, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nl, h, L, d)), jnp.float32)
    lengths = jnp.asarray([100], jnp.int32)
    kv, ks, vs = quantize_kv_int4(k, v)
    out = decode_attention(q, kv, kv, lengths, k_scale=ks, v_scale=vs,
                           kv_bits=4, layer=layer, interpret=True)
    ref = decode_attention(q, kv[:, layer], kv[:, layer], lengths,
                           k_scale=ks[:, layer], v_scale=vs[:, layer],
                           kv_bits=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_int4_cached_decode_close_to_full_forward(rng, arch):
    """Cached decode with an int4 cache tracks the full forward within
    int4 tolerance (coarser than int8: amax/14 per element), through
    both the einsum and kernel paths."""
    cfg = OtterConfig.tiny(arch).text
    m = Decoder(cfg)
    b, s, max_len = 1, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)

    cache = init_cache(cfg, b, max_len, "int4")
    assert set(cache) == {"kv", "k_scale", "v_scale"}
    assert cache["kv"].shape[-1] == cfg.head_dim
    _, cache = m.apply(params, ids, cache=cache)

    ids_ext = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)),
                          jnp.int32)
    full_logits, _ = m.apply(params, jnp.concatenate([ids, ids_ext], 1))

    pos = s
    for t in range(4):
        tok = ids_ext[:, t:t + 1]
        kv_valid = (jnp.arange(max_len)[None] <= pos)
        logits, cache = m.apply(
            params, tok, cache=cache, cache_pos=pos, kv_valid=kv_valid,
            positions=jnp.full((b, 1), pos, jnp.int32))
        # int4 is genuinely coarse (error ~ amax/14 per cache element);
        # assert on the error distribution, not the worst element
        err = np.abs(np.asarray(logits[:, 0])
                     - np.asarray(full_logits[:, pos]))
        # measured distortion at tiny dims is mean ~0.10-0.16 of logit
        # std (run-to-run spread from compile-cache-dependent fusion
        # orders); exact kernel correctness is proven by the
        # matches-dequant parity tests above — this bound only guards
        # against gross plumbing breaks (wrong order/scale => err ~ std)
        scale = np.std(np.asarray(full_logits[:, pos])) + 1e-6
        assert np.mean(err) < 0.3 * scale, (np.mean(err), scale)
        assert np.mean(err < scale) > 0.99, np.mean(err < scale)
        pos += 1


def test_engine_generate_int4_cache(rng):
    """Greedy generate through OtterGenerator with cache_dtype="int4"."""
    from otter_tpu.config import GenerationConfig
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vx = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                     jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), vx, ids)

    out_bf = OtterGenerator(model, params, cfg).generate(
        vx, ids, gen=GenerationConfig(max_new_tokens=6))
    out_i4 = OtterGenerator(model, params, cfg,
                            cache_dtype="int4").generate(
        vx, ids, gen=GenerationConfig(max_new_tokens=6))
    assert out_bf.shape == out_i4.shape
    assert np.asarray(out_bf)[0, 0] == np.asarray(out_i4)[0, 0]
