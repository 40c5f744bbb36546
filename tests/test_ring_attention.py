"""Ring attention vs full attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.ops.attention_ref import mha_reference
from otter_tpu.ops.ring_attention import ring_attention
from otter_tpu.parallel.mesh import create_mesh
from otter_tpu.config import ParallelConfig


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(rng, causal):
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=1, sp=8, tp=1),
                       jax.devices()[:8])
    b, h, s, d = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    sharding = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    out = jax.jit(lambda a, b_, c: ring_attention(
        a, b_, c, mesh=mesh, causal=causal))(qs, ks, vs)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_over_fsdp_axis(rng):
    """The ring can ride the fsdp axis too (ZeRO-sharing configs)."""
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=8, sp=1, tp=1),
                       jax.devices()[:8])
    b, h, s, d = 1, 2, 128, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
               for _ in range(3))
    out = jax.jit(lambda a, b_, c: ring_attention(
        a, b_, c, mesh=mesh, axis="fsdp", causal=True))(q, k, v)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_column_bias_and_ids(rng):
    """The decoder training surface: ALiBi column-form bias rotates with
    the KV blocks; eq-mode segment ids (padding mask) too."""
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=1, sp=4, tp=1),
                       jax.devices()[:4])
    b, h, s, d = 2, 4, 64, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
               for _ in range(3))
    # column-form alibi: (j - (s-1)) * slope
    slopes = jnp.asarray([0.5 ** (i + 1) for i in range(h)], jnp.float32)
    rel = jnp.arange(1 - s, 1, dtype=jnp.float32)
    bias = rel[None, None, None, :] * slopes[None, :, None, None]
    # padding ids: last rows of each batch are padding (id 0)
    ids = np.ones((b, s), np.int32)
    ids[0, -7:] = 0
    ids[1, -13:] = 0
    ids = jnp.asarray(ids)

    out = jax.jit(lambda *a: ring_attention(
        a[0], a[1], a[2], mesh=mesh, causal=True, bias=a[3],
        q_ids=a[4], kv_ids=a[4], ids_mode="eq"))(q, k, v, bias, ids)

    qi = ids[:, None, :, None]
    ki = ids[:, None, None, :]
    ref = mha_reference(q, k, v, bias=bias, mask=(qi == ki), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("h,hkv,sp,tp", [
    (4, 4, 4, 1),   # MHA, sp only
    (4, 1, 4, 1),   # MQA, sp only
    (4, 4, 2, 2),   # MHA under tensor-sharded heads
    (4, 1, 2, 2),   # MQA under tp: joint rule replicates both head dims
    (8, 2, 2, 2),   # GQA under tp: both head dims shard (8/2, 2/2)
    (8, 2, 2, 4),   # GQA, tp=4: kv heads can't shard -> joint replicate
])
def test_ring_custom_vjp_grads_match_full(rng, h, hkv, sp, tp):
    """The two-pass custom VJP (dq local, dk/dv riding the ring home)
    must match plain autodiff of full attention — with ALiBi column bias,
    padding ids, MQA/GQA, and tensor-sharded heads (the psum and
    joint-head-sharding cases)."""
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=1, sp=sp, tp=tp),
                       jax.devices()[:sp * tp])
    b, s, d = 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    slopes = jnp.asarray([0.5 ** (i + 1) for i in range(h)], jnp.float32)
    rel = jnp.arange(1 - s, 1, dtype=jnp.float32)
    bias = rel[None, None, None, :] * slopes[None, :, None, None]
    ids = np.ones((b, s), np.int32)
    ids[0, -7:] = 0
    ids = jnp.asarray(ids)
    cot = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def ring_loss(q, k, v, bias, mode):
        out = ring_attention(q, k, v, mesh=mesh, causal=True, bias=bias,
                             q_ids=ids, kv_ids=ids, ids_mode="eq",
                             grad_mode=mode)
        return jnp.sum(out * cot)

    def full_loss(q, k, v, bias):
        qi = ids[:, None, :, None]
        ki = ids[:, None, None, :]
        out = mha_reference(q, k, v, bias=bias, mask=(qi == ki),
                            causal=True)
        return jnp.sum(out * cot)

    # forward parity first (the GQA-under-tp head-pairing regression:
    # q heads sharded against replicated kv heads silently mispaired)
    out_ring = jax.jit(lambda *a: ring_attention(
        *a[:3], mesh=mesh, causal=True, bias=a[3], q_ids=ids, kv_ids=ids,
        ids_mode="eq"))(q, k, v, bias)
    qi = ids[:, None, :, None]
    ki = ids[:, None, None, :]
    out_full = mha_reference(q, k, v, bias=bias, mask=(qi == ki),
                             causal=True)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=2e-5, rtol=2e-5)

    g_ring = jax.jit(jax.grad(lambda *a: ring_loss(*a, "ring"),
                              argnums=(0, 1, 2, 3)))(q, k, v, bias)
    g_full = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2, 3)))(
        q, k, v, bias)
    for gr, gf, name in zip(g_ring, g_full, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=3e-4, rtol=3e-4, err_msg=name)

    # and the AD-through-scan path agrees too (A/B reference)
    g_ad = jax.jit(jax.grad(lambda *a: ring_loss(*a, "ad"),
                            argnums=(0, 1, 2)))(q, k, v, bias)
    for gr, ga, name in zip(g_ring[:3], g_ad, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(ga),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_ring_kernel_local_block_matches_einsum(rng, monkeypatch):
    """OTTER_RING_IMPL=pallas routes each local block through the flash
    kernel (interpret mode here): forward and custom-VJP grads must match
    the einsum local block exactly."""
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=1, sp=4, tp=1),
                       jax.devices()[:4])
    b, h, s, d = 1, 2, 64, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
               for _ in range(3))
    ids = np.ones((b, s), np.int32)
    ids[0, -9:] = 0
    ids = jnp.asarray(ids)
    cot = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss(q, k, v):
        out = ring_attention(q, k, v, mesh=mesh, causal=True,
                             q_ids=ids, kv_ids=ids, ids_mode="eq")
        return jnp.sum(out * cot), out

    results = {}
    for impl in ("einsum", "pallas"):
        monkeypatch.setenv("OTTER_RING_IMPL", impl)
        (_, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(q, k, v)
        results[impl] = (out, grads)
    out_e, g_e = results["einsum"]
    out_p, g_p = results["pallas"]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e),
                               atol=2e-5, rtol=2e-5)
    for a, b_, name in zip(g_p, g_e, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4, err_msg=name)
