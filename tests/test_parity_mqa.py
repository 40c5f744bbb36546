"""Golden-logit parity for MPT MultiQueryAttention (reference
`mpt/attention.py:317-363`, `attn_config["attn_type"] =
"multiquery_attention"`): no Otter preset ships it, but MPT exposes it —
the unified decoder covers it via num_kv_heads=1 (VERDICT r2 missing #5)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

from otter_tpu.config import TextConfig  # noqa: E402
from otter_tpu.models.decoder import Decoder  # noqa: E402


def _tiny_text():
    return TextConfig(arch="mpt", vocab_size=256, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_kv_heads=1, intermediate_size=128,
                      max_seq_len=64, pos="alibi", alibi_bias_max=8,
                      norm_type="low_precision_layernorm",
                      act="gelu", tie_embeddings=True, no_bias=True)


@pytest.mark.parity
def test_mpt_multiquery_logit_parity(rng):
    from otter_ai.models.mpt.configuration_mpt import MPTConfig
    from otter_ai.models.mpt.modeling_mpt import MPTForCausalLM

    t = _tiny_text()
    torch.manual_seed(0)
    mpt = MPTForCausalLM(MPTConfig(
        d_model=t.hidden_size, n_heads=t.num_attention_heads,
        n_layers=t.num_hidden_layers,
        expansion_ratio=t.mlp_dim // t.hidden_size,
        max_seq_len=t.max_seq_len, vocab_size=t.total_vocab, no_bias=True,
        norm_type="low_precision_layernorm",
        attn_config={"attn_type": "multiquery_attention", "attn_pdrop": 0.0,
                     "attn_impl": "torch", "qk_ln": False, "clip_qkv": None,
                     "softmax_scale": None, "prefix_lm": False,
                     "attn_uses_sequence_id": False, "alibi": True,
                     "alibi_bias_max": int(t.alibi_bias_max)},
        init_config={"name": "baseline_", "init_std": 0.02}))
    mpt.eval()
    for prm in mpt.parameters():
        if prm.dim() > 1:
            torch.nn.init.normal_(prm, std=0.05)

    b, s = 2, 24
    ids = rng.integers(5, 250, (b, s)).astype(np.int64)
    with torch.no_grad():
        ref = mpt(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.ones((b, s), dtype=torch.long)
                  ).logits.numpy()

    # reference state dict -> unified Decoder params (decoder-only map)
    sd = {k: v.numpy() for k, v in mpt.state_dict().items()}
    model = Decoder(t, dtype=jnp.float32)
    shapes = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ids[:, :4], jnp.int32))
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    out = {}
    for i in range(t.num_hidden_layers):
        pre = f"transformer.blocks.{i}."
        out[f"layers_{i}/norm_1/scale"] = sd[pre + "norm_1.weight"]
        out[f"layers_{i}/norm_2/scale"] = sd[pre + "norm_2.weight"]
        out[f"layers_{i}/attn/Wqkv/kernel"] = sd[pre + "attn.Wqkv.weight"].T
        out[f"layers_{i}/attn/out_proj/kernel"] = \
            sd[pre + "attn.out_proj.weight"].T
        out[f"layers_{i}/ffn/up_proj/kernel"] = sd[pre + "ffn.up_proj.weight"].T
        out[f"layers_{i}/ffn/down_proj/kernel"] = \
            sd[pre + "ffn.down_proj.weight"].T
    out["wte/embedding"] = sd["transformer.wte.weight"]
    out["norm_f/scale"] = sd["transformer.norm_f.weight"]
    assert set(out) == set(flat), (set(flat) - set(out),
                                   set(out) - set(flat))
    for k in out:
        assert flat[k].shape == out[k].shape, (k, flat[k].shape,
                                               out[k].shape)
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(v, jnp.float32) for k, v in out.items()}, sep="/")}

    got, _ = model.apply(params, jnp.asarray(ids, jnp.int32),
                         attention_mask=jnp.ones((b, s), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-3)


def test_mpt_multiquery_cached_decode_consistency(rng):
    """MQA decode against the cache (kv_heads=1 cache, einsum path with
    head broadcast) matches the uncached forward."""
    t = _tiny_text()
    from otter_tpu.models.decoder import init_cache

    model = Decoder(t, dtype=jnp.float32)
    b, s = 2, 12
    ids = jnp.asarray(rng.integers(5, 250, (b, s)), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids)

    full, _ = model.apply(params, ids,
                          attention_mask=jnp.ones((b, s), jnp.int32))

    L = 16
    cache = init_cache(t, b, L, jnp.float32)
    assert cache["k"].shape[2] == 1          # kv_heads=1 cache
    _, cache = model.apply(params, ids[:, :-1], cache=cache)
    kv_valid = (jnp.arange(L)[None, :] < s).repeat(b, 0)
    last, _ = model.apply(params, ids[:, -1:], cache=cache,
                          cache_pos=s - 1, kv_valid=kv_valid)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(full[:, -1]),
                               atol=2e-4, rtol=2e-4)
