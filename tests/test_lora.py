"""LoRA tests: zero-init adapters are identity, adapters are trainable
while the base stays frozen, target-module selection per arch."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from otter_tpu.config import OtterConfig
from otter_tpu.models.decoder import Decoder
from otter_tpu.train.step import split_params


def test_lora_identity_at_init(rng):
    cfg = OtterConfig.tiny("mpt").text
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    base = Decoder(cfg)
    params = base.init(jax.random.PRNGKey(0), ids)["params"]
    logits0, _ = base.apply({"params": params}, ids)

    lcfg = cfg.replace(lora_rank=4)
    lora = Decoder(lcfg)
    lparams = lora.init(jax.random.PRNGKey(0), ids)["params"]
    # graft the base weights into the lora param tree
    flat = dict(traverse_util.flatten_dict(params, sep="/"))
    lflat = dict(traverse_util.flatten_dict(lparams, sep="/"))
    assert any(k.endswith("lora_a") for k in lflat)
    for k in lflat:
        src = k.replace("/base/", "/")
        if src in flat:
            lflat[k] = flat[src]
    lparams = traverse_util.unflatten_dict(lflat, sep="/")
    logits1, _ = lora.apply({"params": lparams}, ids)
    # lora_b zero-init -> identical outputs
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1),
                               atol=1e-5)


def test_lora_params_trainable(rng):
    otter_cfg = OtterConfig.tiny("mpt")
    otter_cfg = otter_cfg.replace(text=otter_cfg.text.replace(lora_rank=4))
    from otter_tpu.models.otter import OtterVLM
    m = OtterVLM(otter_cfg)
    vx = jnp.zeros((1, 1, 1, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), vx, ids)["params"]
    trainable, frozen = split_params(params, otter_cfg)
    t_flat = traverse_util.flatten_dict(trainable, sep="/")
    f_flat = traverse_util.flatten_dict(frozen, sep="/")
    assert any(k.endswith("lora_a") for k in t_flat)
    assert any(k.endswith("Wqkv/base/kernel") for k in f_flat)
    assert not any("lora" in k for k in f_flat)


def test_lora_targets_llama(rng):
    cfg = OtterConfig.tiny("llama").text.replace(lora_rank=2)
    m = Decoder(cfg)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    flat = traverse_util.flatten_dict(params, sep="/")
    assert any("q_proj/lora_a" in k for k in flat)
    assert any("v_proj/lora_a" in k for k in flat)
    assert not any("k_proj/lora_a" in k for k in flat)


def test_lora_over_int8_base(rng):
    """QLoRA-style: int8-quantized base kernels + LoRA adapters."""
    from otter_tpu.ops.quant import quantize_params
    cfg = OtterConfig.tiny("mpt").text
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    base = Decoder(cfg)
    params = base.init(jax.random.PRNGKey(0), ids)["params"]
    logits_f32, _ = base.apply({"params": params}, ids)

    qcfg = cfg.replace(quant="int8", lora_rank=4)
    qmodel = Decoder(qcfg)
    qinit = qmodel.init(jax.random.PRNGKey(0), ids)["params"]
    # graft: quantize the f32 kernels, reuse lora zero-init
    from flax import traverse_util
    qflat = dict(traverse_util.flatten_dict(qinit, sep="/"))
    quantized = traverse_util.flatten_dict(quantize_params(params), sep="/")
    for k in qflat:
        src = k.replace("/base/", "/")
        if src in quantized:
            qflat[k] = quantized[src]
    qparams = traverse_util.unflatten_dict(qflat, sep="/")
    logits_q, _ = qmodel.apply({"params": qparams}, ids)
    scale = float(jnp.std(logits_f32))
    err = float(jnp.max(jnp.abs(logits_q.astype(jnp.float32) - logits_f32)))
    assert err < 0.2 * max(scale, 1.0), (err, scale)
    # lora params exist and base kernels are int8
    flat = traverse_util.flatten_dict(qparams, sep="/")
    assert any(k.endswith("lora_a") for k in flat)
    assert any(v.dtype == jnp.int8 for k, v in flat.items()
               if k.endswith("kernel_q"))
