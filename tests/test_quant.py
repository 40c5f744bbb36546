"""Quantization + precision-policy tests: int8 decoder output close to the
f32 decoder, param tree structurally valid, bf16 cast keeps norms in f32."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from otter_tpu.config import OtterConfig
from otter_tpu.models.decoder import Decoder
from otter_tpu.ops.quant import quantize_kernel, quantize_params
from otter_tpu.parallel.precision import cast_params, param_bytes


def test_quantize_kernel_roundtrip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, scale = quantize_kernel(w)
    deq = q.astype(np.float32) * scale[None, :]
    assert np.abs(deq - w).max() < np.abs(w).max() / 100


def test_int8_decoder_close_to_f32(rng):
    cfg = OtterConfig.tiny("mpt").text
    m32 = Decoder(cfg)
    ids = jnp.asarray(rng.integers(0, 200, (2, 16)), jnp.int32)
    params = m32.init(jax.random.PRNGKey(0), ids)["params"]
    logits32, _ = m32.apply({"params": params}, ids)

    qparams = quantize_params(params)
    flat = traverse_util.flatten_dict(qparams, sep="/")
    assert any(k.endswith("kernel_q") for k in flat)
    assert not any("layers_0/attn/Wqkv/kernel" == k for k in flat)

    mq = Decoder(cfg.replace(quant="int8"))
    logitsq, _ = mq.apply({"params": qparams}, ids)
    # int8 weight error is small relative to logit scale
    scale = float(jnp.std(logits32))
    err = float(jnp.max(jnp.abs(logitsq.astype(jnp.float32) - logits32)))
    assert err < 0.15 * max(scale, 1.0), (err, scale)


def test_cast_params_policy(rng):
    cfg = OtterConfig.tiny("mpt").text
    m = Decoder(cfg)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    before = param_bytes(params)
    cast = cast_params(params, jnp.bfloat16)
    after = param_bytes(cast)
    assert after < before * 0.6
    flat = traverse_util.flatten_dict(cast, sep="/")
    for k, v in flat.items():
        if k.endswith("/scale") or k.endswith("norm_f/scale"):
            assert v.dtype == jnp.float32, k
        if k.endswith("Wqkv/kernel"):
            assert v.dtype == jnp.bfloat16, k


def test_int8_matmul_pallas(rng):
    from otter_tpu.ops.quant import int8_matmul, quantize_kernel
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    w = rng.standard_normal((256, 384)).astype(np.float32)
    wq, scale = quantize_kernel(w)
    out = int8_matmul(x, jnp.asarray(wq), jnp.asarray(scale),
                      block_out=128, block_in=128, interpret=True)
    ref = x @ jnp.asarray(wq.astype(np.float32) * scale[None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    # odd row count (pads to 8 sublanes)
    out2 = int8_matmul(x[:3], jnp.asarray(wq), jnp.asarray(scale),
                       block_out=128, block_in=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref[:3]),
                               atol=2e-3, rtol=2e-3)


def test_int8_mlp_fused_matches_composition(rng):
    from otter_tpu.ops.quant import int8_mlp, quantize_kernel
    m, k, h = 8, 64, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w1 = rng.standard_normal((k, h)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((h, k)).astype(np.float32) * 0.1
    q1, s1 = quantize_kernel(w1)
    q2, s2 = quantize_kernel(w2)

    got = int8_mlp(x, jnp.asarray(q1), jnp.asarray(s1),
                   jnp.asarray(q2), jnp.asarray(s2), act="gelu",
                   block_h=64, interpret=True)
    import jax
    ref_h = jax.nn.gelu((x @ (q1.astype(np.float32) * s1[None, :])),
                        approximate=False)
    ref = ref_h @ (q2.astype(np.float32) * s2[None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_int8_mlp_bias_sqrelu_matches_composition(rng):
    """Persimmon-shaped fused MLP: biases + squared-ReLU (the fuyu decode
    path since r3 — fuyu/modeling_persimmon.py:173-193)."""
    from otter_tpu.ops.quant import int8_mlp, quantize_kernel
    m, k, h = 4, 64, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w1 = rng.standard_normal((k, h)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((h, k)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(h).astype(np.float32) * 0.1
    b2 = rng.standard_normal(k).astype(np.float32) * 0.1
    q1, s1 = quantize_kernel(w1)
    q2, s2 = quantize_kernel(w2)
    got = int8_mlp(x, jnp.asarray(q1), jnp.asarray(s1),
                   jnp.asarray(q2), jnp.asarray(s2), act="sq_relu",
                   b1=jnp.asarray(b1), b2=jnp.asarray(b2),
                   block_h=64, interpret=True)
    hid = x @ (q1.astype(np.float32) * s1[None, :]) + b1[None, :]
    hid = np.square(np.maximum(np.asarray(hid), 0.0))
    ref = hid @ (q2.astype(np.float32) * s2[None, :]) + b2[None, :]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


def test_fuyu_fused_decode_mlp_matches_xla_path(rng):
    """persimmon MLP (bias + sq_relu): decode-shaped fused kernel path vs
    prefill-shaped Int8Dense path on the same params."""
    from otter_tpu.config import TextConfig
    from otter_tpu.models.decoder import MLP
    from otter_tpu.ops.quant import quantize_kernel
    from flax import traverse_util

    cfg = TextConfig(arch="persimmon", hidden_size=64,
                     intermediate_size=128, num_hidden_layers=1,
                     num_attention_heads=4, act="sq_relu", no_bias=False,
                     quant="int8")
    mlp = MLP(cfg, dtype=jnp.float32)
    x_small = jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x_small)
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    for name, shape in (("up_proj", (64, 128)), ("down_proj", (128, 64))):
        w = rng.standard_normal(shape).astype(np.float32) * 0.1
        q, s = quantize_kernel(w)
        flat[f"{name}/kernel_q"] = jnp.asarray(q)
        flat[f"{name}/scale_q"] = jnp.asarray(s)
        flat[f"{name}/bias"] = jnp.asarray(
            rng.standard_normal(shape[1]).astype(np.float32) * 0.1)
    params = {"params": traverse_util.unflatten_dict(flat, sep="/")}

    y_small = mlp.apply(params, x_small)                       # fused path
    x_big = jnp.concatenate([x_small] * 8, axis=1)             # 64 tokens
    y_big = mlp.apply(params, x_big)                           # XLA path
    np.testing.assert_allclose(np.asarray(y_small[0]),
                               np.asarray(y_big[0, :8]),
                               rtol=2e-2, atol=2e-2)


def test_mlp_fused_decode_path_matches_xla_path(rng):
    """The decode-shaped (tokens<=32) fused int8 MLP must agree with the
    prefill-shaped XLA path on the same params."""
    from otter_tpu.config import TextConfig
    from otter_tpu.models.decoder import MLP

    cfg = TextConfig(arch="mpt", hidden_size=64, intermediate_size=128,
                     num_hidden_layers=1, num_attention_heads=4,
                     act="gelu", no_bias=True, quant="int8")
    mlp = MLP(cfg, dtype=jnp.float32)
    x_small = jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x_small)
    # params are zeros from init; fill with a real quantized kernel
    from otter_tpu.ops.quant import quantize_kernel
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    for name, shape in (("up_proj", (64, 128)), ("down_proj", (128, 64))):
        w = rng.standard_normal(shape).astype(np.float32) * 0.1
        q, s = quantize_kernel(w)
        flat[f"{name}/kernel_q"] = jnp.asarray(q)
        flat[f"{name}/scale_q"] = jnp.asarray(s)
    params = {"params": traverse_util.unflatten_dict(flat, sep="/")}

    y_small = mlp.apply(params, x_small)                       # fused path
    x_big = jnp.concatenate([x_small] * 8, axis=1)             # 64 tokens
    y_big = mlp.apply(params, x_big)                           # XLA path
    np.testing.assert_allclose(np.asarray(y_small[0]),
                               np.asarray(y_big[0, :8]),
                               rtol=2e-2, atol=2e-2)


def test_fused_layer_tail_matches_unfused(rng):
    """The fused out-proj+norm+MLP decode tail must agree with the unfused
    chain on the same params (decode shape vs the cacheless path)."""
    from otter_tpu.config import TextConfig
    from otter_tpu.models.decoder import DecoderLayer, init_cache
    from otter_tpu.ops.quant import quantize_kernel
    from flax import traverse_util

    cfg = TextConfig(arch="mpt", vocab_size=64, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=1,
                     num_attention_heads=4, max_seq_len=32, act="gelu",
                     no_bias=True, quant="int8", pos="alibi")
    layer = DecoderLayer(cfg, dtype=jnp.float32, fused_tail=True)
    b, L = 2, 16
    x1 = jnp.asarray(rng.standard_normal((b, 1, 64)), jnp.float32)
    cache = init_cache(cfg, b, L, jnp.float32)
    kv_valid = jnp.asarray(np.arange(L)[None, :] <= 4).repeat(b, 0)
    pos = jnp.full((b, 1), 4, jnp.int32)
    kwargs = dict(positions=pos, cache=cache, kv_valid=kv_valid, cache_pos=4)
    params = layer.init(jax.random.PRNGKey(0), x1, **kwargs)
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    r2 = np.random.default_rng(1)
    for k in list(flat):
        if k.endswith("kernel_q"):
            w = r2.standard_normal(flat[k].shape).astype(np.float32) * 0.1
            q, s = quantize_kernel(w)
            flat[k] = jnp.asarray(q)
            flat[k[:-len("kernel_q")] + "scale_q"] = jnp.asarray(s)
        elif k.endswith("/kernel"):
            flat[k] = jnp.asarray(
                r2.standard_normal(flat[k].shape).astype(np.float32) * 0.1)
        elif k.endswith("scale") and "scale_q" not in k:
            flat[k] = jnp.asarray(
                1.0 + 0.1 * r2.standard_normal(flat[k].shape)
                .astype(np.float32))
    params = {"params": traverse_util.unflatten_dict(flat, sep="/")}

    y_fused, _ = layer.apply(params, x1, **kwargs)        # decode: fused

    # unfused reference: same decode call with tokens > 32 is awkward at
    # q_len 1, so replicate the batch to exceed the token threshold
    x_big = jnp.concatenate([x1] * 17, axis=0)            # 34 tokens
    cache_big = init_cache(cfg, 34, L, jnp.float32)
    kwargs_big = dict(positions=jnp.full((34, 1), 4, jnp.int32),
                      cache=cache_big,
                      kv_valid=jnp.asarray(
                          np.arange(L)[None, :] <= 4).repeat(34, 0),
                      cache_pos=4)
    y_big, _ = layer.apply(params, x_big, **kwargs_big)
    np.testing.assert_allclose(np.asarray(y_fused[0]), np.asarray(y_big[0]),
                               rtol=2e-2, atol=2e-2)


def test_quant_embed_matches_bf16_rows():
    """quantize_embed + TextConfig(quant_embed=True) reproduces the bf16
    embedding path within int8 row-quantization error (the table is a
    residency lever: values must survive the round trip, traffic/shape
    semantics are unchanged)."""
    import numpy as np
    from otter_tpu.config import FuyuConfig
    from otter_tpu.models.decoder import Decoder
    from otter_tpu.ops.quant import quantize_embed

    t = FuyuConfig().text.replace(
        num_hidden_layers=1, hidden_size=64, num_attention_heads=4,
        intermediate_size=128, vocab_size=128, max_seq_len=64)
    assert not t.tie_embeddings
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 120, (2, 6)), jnp.int32)

    dec = Decoder(t, dtype=jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), ids)
    # give the embedding real values (init is normal already; scale up)
    ref, _ = dec.apply(params, ids)

    qdec = Decoder(t.replace(quant_embed=True), dtype=jnp.float32)
    qparams = quantize_embed(params)
    got, _ = qdec.apply(qparams, ids)

    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.02, (err, scale)
