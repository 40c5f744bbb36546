"""Decode-attention kernel numerics vs the masked einsum reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.ops.decode_attention import decode_attention
from otter_tpu.ops.masks import DEFAULT_MASK_VALUE


def _ref(q, k, v, lengths, bias=None):
    logits = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / (q.shape[-1] ** 0.5)
    if bias is not None:
        logits = logits + bias
    mask = jnp.arange(k.shape[2])[None, None, :] < lengths[:, None, None]
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jnp.asarray(np.exp(logits - logits.max(-1, keepdims=True)))
    probs = probs / probs.sum(-1, keepdims=True)
    return jnp.einsum("bhk,bhkd->bhd", probs, v.astype(jnp.float32))


@pytest.mark.parametrize("L,block_k", [(512, 256), (384, 256)])
def test_decode_attention_matches_reference(rng, L, block_k):
    b, h, d = 2, 4, 128
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([L // 3, L - 1], jnp.int32)
    out = decode_attention(q, k, v, lengths, block_k=block_k,
                           interpret=True)
    ref = _ref(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_attention_left_padding(rng):
    """starts[b] masks left-pad slots (and skips whole blocks)."""
    b, h, L, d = 2, 2, 512, 128
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([300, 500], jnp.int32)
    starts = jnp.asarray([150, 4], jnp.int32)
    out = decode_attention(q, k, v, lengths, starts=starts, block_k=128,
                           interpret=True)
    logits = jnp.einsum("bhd,bhkd->bhk", q, k) / (d ** 0.5)
    idx = jnp.arange(L)[None, None, :]
    mask = (idx < lengths[:, None, None]) & (idx >= starts[:, None, None])
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jnp.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ref = jnp.einsum("bhk,bhkd->bhd", probs, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_attention_with_alibi_bias(rng):
    b, h, L, d = 1, 4, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([200], jnp.int32)
    from otter_tpu.ops.masks import alibi_slopes
    slopes = alibi_slopes(h)
    rel = (jnp.arange(L) - 199)[None, None, :]
    bias = rel * slopes[None, :, None]
    out = decode_attention(q, k, v, lengths, bias, block_k=128,
                           interpret=True)
    ref = _ref(q, k, v, lengths, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_decoder_decode_kernel_matches_einsum(rng):
    """Cached decode with decode_kernel=True reproduces the einsum path."""
    import jax
    from otter_tpu.config import OtterConfig
    from otter_tpu.models.decoder import Decoder, init_cache
    cfg = OtterConfig.tiny("mpt").text
    b, s, max_len = 1, 8, 128
    ids = jnp.asarray(rng.integers(5, 200, (b, s)), jnp.int32)
    m_ref = Decoder(cfg)
    m_ker = Decoder(cfg.replace(decode_kernel=True))
    params = m_ref.init(jax.random.PRNGKey(0), ids)

    def run(m):
        cache = init_cache(cfg, b, max_len, jnp.float32)
        _, cache = m.apply(params, ids, cache=cache)
        outs = []
        pos = s
        for t in range(3):
            tok = jnp.asarray([[50 + t]], jnp.int32)
            kv_valid = (jnp.arange(max_len)[None] <= pos)
            logits, cache = m.apply(
                params, tok, cache=cache, cache_pos=pos, kv_valid=kv_valid,
                positions=jnp.full((b, 1), pos, jnp.int32))
            outs.append(np.asarray(logits[:, 0]))
            pos += 1
        return np.stack(outs)

    ref = run(m_ref)
    ker = run(m_ker)
    np.testing.assert_allclose(ker, ref, atol=2e-4, rtol=2e-4)


def test_decode_attention_full_cache_fast_path(rng):
    """Round-5 full-cache dispatch: when every row's span covers every
    KV block, a lax.cond routes to the block_k=L kernel (fewer grid
    steps, same bytes). Both branches must match the reference — and
    the dispatch must flip correctly on the length predicate."""
    b, h, d, L = 2, 8, 128, 1024
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    for lens in ([L - 5, L - 1],        # near-full -> full-cache branch
                 [200, L - 1]):         # mixed -> blocked branch
        lengths = jnp.asarray(lens, jnp.int32)
        out = decode_attention(q, k, v, lengths, block_k=256,
                               interpret=True)
        ref = _ref(q, k, v, lengths)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # dispatch_full=False must agree too (pure blocked path)
        out2 = decode_attention(q, k, v, lengths, block_k=256,
                                dispatch_full=False, interpret=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_decode_attention_round4_default_blocks(rng):
    """The round-4 defaults (block_k=min(1024,L), ~1MB block_h target)
    must stay numerically exact at a multi-block L with mixed lengths —
    the b8/L2048 serving shape they were tuned on, downscaled to b2/h8
    for interpret mode."""
    b, h, d, L = 2, 8, 128, 2048
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    lengths = jnp.asarray([300, L - 64], jnp.int32)  # short + near-full
    out = decode_attention(q, k, v, lengths, interpret=True)
    ref = _ref(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
