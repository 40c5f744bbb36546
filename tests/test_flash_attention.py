"""Numerics tests: Pallas flash attention (interpret mode) vs pure-jnp
reference, across head dims / masks / biases — the kernel-vs-reference test
strategy SURVEY.md §4 calls for (the reference's Triton kernel shipped with
zero in-repo tests and a race-condition warning, flash_attn_triton.py:27-34).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.ops.attention_ref import mha_reference
from otter_tpu.ops.flash_attention import BlockSizes, flash_attention
from otter_tpu.ops.masks import alibi_bias, media_cross_attention_mask


def _mk(rng, b, h, sq, sk, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, sk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, sk, d)), dtype)
    return q, k, v


SMALL_BLOCKS = BlockSizes(128, 128, 128, 128, 128, 128)


@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_matches_reference(rng, d, causal):
    b, h, s = 2, 3, 256
    q, k, v = _mk(rng, b, h, s, s, d)
    out = flash_attention(q, k, v, causal=causal, interpret=True,
                          block_sizes=SMALL_BLOCKS)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_unaligned_seq(rng):
    # 257 = ViT-L/14 sequence (class token + 256 patches)
    b, h, sq, sk, d = 1, 2, 64, 257, 64
    q, k, v = _mk(rng, b, h, sq, sk, d)
    out = flash_attention(q, k, v, interpret=True, block_sizes=SMALL_BLOCKS)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_alibi_bias(rng):
    b, h, s, d = 1, 4, 256, 128
    q, k, v = _mk(rng, b, h, s, s, d)
    bias = alibi_bias(h, s)  # [1, h, 1, s] — broadcast over q dim
    out = flash_attention(q, k, v, bias, causal=True, interpret=True,
                          block_sizes=SMALL_BLOCKS)
    ref = mha_reference(q, k, v, bias=bias, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_full_bias(rng):
    b, h, s, d = 2, 2, 128, 64
    q, k, v = _mk(rng, b, h, s, s, d)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    out = flash_attention(q, k, v, bias, interpret=True,
                          block_sizes=SMALL_BLOCKS)
    ref = mha_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fwd_segment_ids(rng):
    b, h, s, d = 2, 2, 256, 64
    q, k, v = _mk(rng, b, h, s, s, d)
    ids = jnp.asarray(rng.integers(0, 3, (b, s)), jnp.int32)
    out = flash_attention(q, k, v, q_ids=ids, kv_ids=ids, ids_mode="eq",
                          causal=True, interpret=True,
                          block_sizes=SMALL_BLOCKS)
    mask = ids[:, None, :, None] == ids[:, None, None, :]
    ref = mha_reference(q, k, v, mask=mask, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("ids_mode", ["eq", "ge"])
def test_fwd_media_mask(rng, ids_mode):
    """Cross-attention with the Flamingo media-location mask expressed as an
    id comparison (text_time vs media_time)."""
    b, h, t_txt, t_img, n_lat, d = 2, 2, 128, 3, 64, 64
    q, k, v = _mk(rng, b, h, t_txt, t_img * n_lat, d)
    media_locations = jnp.zeros((b, t_txt), bool)
    media_locations = media_locations.at[:, [3, 40, 90]].set(True)

    text_time = jnp.cumsum(media_locations, axis=-1).astype(jnp.int32)
    media_ids = jnp.repeat(jnp.arange(1, t_img + 1, dtype=jnp.int32), n_lat)
    kv_ids = jnp.broadcast_to(media_ids, (b, t_img * n_lat))

    out = flash_attention(q, k, v, q_ids=text_time, kv_ids=kv_ids,
                          ids_mode=ids_mode, interpret=True,
                          block_sizes=SMALL_BLOCKS)

    allowed, _ = media_cross_attention_mask(
        media_locations, t_img,
        only_attend_immediate_media=(ids_mode == "eq"))
    mask = jnp.repeat(allowed, n_lat, axis=-1)[:, None]
    ref = mha_reference(q, k, v, mask=mask)
    # Rows with no attendable media (text before the first <image>) produce
    # padding-dependent uniform attention; the model zeroes them via out_keep,
    # so compare only valid rows.
    valid = np.asarray(text_time[:, None, :, None] > 0)
    valid = np.broadcast_to(valid, out.shape)
    np.testing.assert_allclose(np.where(valid, out, 0),
                               np.where(valid, ref, 0),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_reference(rng, causal):
    b, h, s, d = 1, 2, 256, 64
    q, k, v = _mk(rng, b, h, s, s, d)
    bias = alibi_bias(h, s) if causal else None

    def loss_fa(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, causal=causal,
                                       interpret=True,
                                       block_sizes=SMALL_BLOCKS) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, bias=bias, causal=causal) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=2e-4)


def test_grads_with_segment_ids(rng):
    b, h, s, d = 1, 2, 256, 64
    q, k, v = _mk(rng, b, h, s, s, d)
    ids = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.int32)

    def loss_fa(q, k, v):
        return jnp.sum(flash_attention(q, k, v, q_ids=ids, kv_ids=ids,
                                       causal=True, interpret=True,
                                       block_sizes=SMALL_BLOCKS) ** 2)

    def loss_ref(q, k, v):
        mask = ids[:, None, :, None] == ids[:, None, None, :]
        return jnp.sum(mha_reference(q, k, v, mask=mask, causal=True) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=2e-4)


def test_bf16_fwd_close(rng):
    b, h, s, d = 1, 2, 256, 128
    q, k, v = _mk(rng, b, h, s, s, d, jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_sizes=SMALL_BLOCKS)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), causal=True)
    np.testing.assert_allclose(out.astype(np.float32), ref, atol=3e-2,
                               rtol=3e-2)


def test_rect_blocks_triangle_grid(rng):
    """bq != bk exercises the non-square triangle enumeration (fwd row-major
    maps, dkv column-major maps, dq last_k store gating)."""
    q, k, v = _mk(rng, 1, 2, 512, 512, 64)
    rect = BlockSizes(block_q=256, block_k=128,
                      block_q_dkv=256, block_k_dkv=128,
                      block_q_dq=128, block_k_dq=256)

    def f(q, k, v):
        return flash_attention(q, k, v, causal=True, interpret=True,
                               block_sizes=rect).astype(jnp.float32).sum()

    def f_ref(q, k, v):
        return mha_reference(q, k, v, causal=True).astype(
            jnp.float32).sum()

    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-3, rtol=2e-3)
