"""Numerics for the decode megakernel (ops/megakernel.py) vs a composed
reference of the same math: LN1 -> int8 qkv -> cached attention with the
new token in-register -> int8 out-proj + residual [-> LN2 -> int8 MLP]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")


def _quant_cols(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32) / np.sqrt(shape[0])
    amax = np.abs(w).max(axis=0, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale[0]), jnp.asarray(
        q.astype(np.float32) * scale)


def _setup(rng, b, h, dh, L, pos):
    d = h * dh
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32
                    ).astype(jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, h, L, dh)), jnp.float32
                     ).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, h, L, dh)), jnp.float32
                     ).astype(jnp.bfloat16)
    # positions >= pos are garbage in the cache — poison them to prove
    # the kernel masks correctly
    poison = jnp.full((b, h, L - pos, dh), 1e4, jnp.bfloat16)
    kc = kc.at[:, :, pos:].set(poison)
    vc = vc.at[:, :, pos:].set(poison)
    bias = jnp.asarray(rng.standard_normal((h, L)) * 0.1, jnp.float32)
    ln1 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    wq, sq, wq_f = _quant_cols(rng, (d, 3 * d))
    wo, so, wo_f = _quant_cols(rng, (d, d))
    wqo = jnp.concatenate([wq, wo], axis=1)
    sqo = jnp.concatenate([sq, so])
    return d, x, kc, vc, bias, ln1, wqo, sqo, wq_f, wo_f


def _reference(x, kc, vc, pos, bias, ln1, wq_f, wo_f, eps=1e-5):
    b, d = x.shape
    h, L, dh = kc.shape[1], kc.shape[2], kc.shape[3]
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    n = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln1).astype(jnp.bfloat16)
    qkv = (n @ wq_f.astype(jnp.bfloat16)).astype(jnp.float32)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, h, dh)
    knh = k_new.reshape(b, h, dh).astype(jnp.bfloat16)
    vnh = v_new.reshape(b, h, dh).astype(jnp.bfloat16)
    kfull = jnp.concatenate([kc, knh[:, :, None]], axis=2)
    vfull = jnp.concatenate([vc, vnh[:, :, None]], axis=2)
    sm = 1.0 / np.sqrt(dh)
    s = jnp.einsum("bhd,bhld->bhl",
                   qh.astype(jnp.bfloat16).astype(jnp.float32),
                   kfull.astype(jnp.float32)) * sm
    bias_full = jnp.concatenate([bias, bias[:, pos][:, None]], axis=1)
    s = s + bias_full[None]
    idx = jnp.arange(L + 1)
    valid = (idx < pos) | (idx == L)      # cache rows < pos, plus new
    s = jnp.where(valid[None, None], s, -0.7 * np.finfo(np.float32).max)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhl,bhld->bhd", p.astype(jnp.float32),
                   vfull.astype(jnp.float32))
    attn = o.reshape(b, d).astype(jnp.bfloat16)
    y = (x.astype(jnp.float32)
         + (attn @ wo_f.astype(jnp.bfloat16)).astype(jnp.float32)
         .astype(jnp.bfloat16).astype(jnp.float32))
    return y.astype(jnp.bfloat16), knh, vnh


@pytest.mark.parametrize("b,h,dh,L,pos", [
    (3, 4, 128, 256, 57),
    (8, 4, 128, 512, 511),   # last slot: full cache
    (2, 8, 128, 256, 0),     # empty cache: only the new token
])
def test_megakernel_matches_reference(b, h, dh, L, pos):
    from otter_tpu.ops.megakernel import decode_attn_megakernel

    rng = np.random.default_rng(0)
    d, x, kc, vc, bias, ln1, wqo, sqo, wq_f, wo_f = _setup(
        rng, b, h, dh, L, pos)
    y, kn, vn = decode_attn_megakernel(
        x, kc, vc, pos, bias, ln1, wqo, sqo, interpret=True)
    y_ref, kn_ref, vn_ref = _reference(x, kc, vc, pos, bias, ln1,
                                       wq_f, wo_f)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(kn_ref, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(vn_ref, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_megakernel_stacked_cache_mode():
    """Layer-indexed stacked cache [B, n_layers, H, L, Dh] gives the same
    result as slicing the layer out first."""
    from otter_tpu.ops.megakernel import decode_attn_megakernel

    rng = np.random.default_rng(2)
    b, h, dh, L, pos, n_layers, layer = 2, 4, 128, 256, 19, 3, 1
    d, x, kc, vc, bias, ln1, wqo, sqo, wq_f, wo_f = _setup(
        rng, b, h, dh, L, pos)
    kst = jnp.asarray(rng.standard_normal((b, n_layers, h, L, dh)),
                      jnp.float32).astype(jnp.bfloat16)
    vst = jnp.asarray(rng.standard_normal((b, n_layers, h, L, dh)),
                      jnp.float32).astype(jnp.bfloat16)
    kst = kst.at[:, layer].set(kc)
    vst = vst.at[:, layer].set(vc)
    y0, kn0, vn0 = decode_attn_megakernel(
        x, kc, vc, pos, bias, ln1, wqo, sqo, interpret=True)
    y1, kn1, vn1 = decode_attn_megakernel(
        x, kst, vst, pos, bias, ln1, wqo, sqo, layer=layer,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(y0, np.float32),
                                  np.asarray(y1, np.float32))
    np.testing.assert_array_equal(np.asarray(kn0, np.float32),
                                  np.asarray(kn1, np.float32))


def test_full_layer_megakernel_appends_cache():
    from otter_tpu.ops.megakernel import mpt_decode_layer_megakernel

    rng = np.random.default_rng(1)
    b, h, dh, L, pos = 2, 4, 128, 256, 3
    d, x, kc, vc, bias, ln1, wqo, sqo, wq_f, wo_f = _setup(
        rng, b, h, dh, L, pos)
    ln2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    w1, s1, _ = _quant_cols(rng, (d, 4 * d))
    w2, s2, _ = _quant_cols(rng, (4 * d, d))
    out, kc2, vc2 = mpt_decode_layer_megakernel(
        x, kc, vc, pos, bias, ln1, wqo, sqo, ln2, w1, s1, w2, s2,
        interpret=True)
    assert out.shape == (b, d) and jnp.isfinite(
        out.astype(jnp.float32)).all()
    # the new k/v landed at pos; other rows untouched
    _, kn, vn = __import__(
        "otter_tpu.ops.megakernel", fromlist=["decode_attn_megakernel"]
    ).decode_attn_megakernel(x, kc, vc, pos, bias, ln1, wqo, sqo,
                             interpret=True)
    np.testing.assert_array_equal(
        np.asarray(kc2[:, :, pos], np.float32),
        np.asarray(kn.astype(kc.dtype), np.float32))
    np.testing.assert_array_equal(np.asarray(kc2[:, :, pos + 1]),
                                  np.asarray(kc[:, :, pos + 1]))


def test_model_level_megakernel_decode_matches_int8_path(rng=None):
    """TextConfig(megakernel=True) cached decode (after
    ops.quant.add_fused_wqo) tracks the standard int8 decode path."""
    import numpy as np

    from otter_tpu.config import TextConfig
    from otter_tpu.models.decoder import Decoder, init_cache
    from otter_tpu.ops.quant import add_fused_wqo, quantize_params

    rng = np.random.default_rng(3)
    cfg0 = TextConfig(arch="mpt", vocab_size=128, hidden_size=256,
                      num_hidden_layers=2, num_attention_heads=2,
                      max_seq_len=64, pos="alibi",
                      norm_type="low_precision_layernorm", act="gelu",
                      tie_embeddings=True, no_bias=True)
    assert cfg0.head_dim == 128
    m0 = Decoder(cfg0)
    b, s, max_len = 2, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg0.vocab_size, (b, s)), jnp.int32)
    params = m0.init(jax.random.PRNGKey(0), ids)
    qparams = add_fused_wqo(quantize_params(params))

    def run(cfg):
        m = Decoder(cfg)
        cache = init_cache(cfg, b, max_len, jnp.bfloat16)
        _, cache = m.apply(qparams, ids, cache=cache)
        outs = []
        pos = s
        tok = ids[:, -1:]
        for _ in range(3):
            kv_valid = (jnp.arange(max_len)[None] <= pos)
            logits, cache = m.apply(
                qparams, tok, cache=cache, cache_pos=pos,
                kv_valid=kv_valid,
                positions=jnp.full((b, 1), pos, jnp.int32))
            outs.append(np.asarray(logits[:, 0], np.float32))
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            pos += 1
        return outs

    ref = run(cfg0.replace(quant="int8"))
    got = run(cfg0.replace(quant="int8", megakernel=True))
    for a, e in zip(got, ref):
        np.testing.assert_allclose(a, e, atol=5e-2, rtol=5e-2)

    # prove the megakernel branch actually executed: without the fused
    # wqo leaves the decode apply must fail on the missing param
    mcfg = cfg0.replace(quant="int8", megakernel=True)
    m = Decoder(mcfg)
    cache = init_cache(mcfg, b, max_len, jnp.bfloat16)
    qonly = quantize_params(params)        # no add_fused_wqo
    _, cache = m.apply(qonly, ids, cache=cache)   # prefill ok
    with pytest.raises(Exception):
        m.apply(qonly, ids[:, -1:], cache=cache, cache_pos=s,
                kv_valid=(jnp.arange(max_len)[None] <= s),
                positions=jnp.full((b, 1), s, jnp.int32))
