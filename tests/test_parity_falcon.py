"""Falcon (RW) decoder parity vs the reference `modelling_RW.py` at tiny
dims: fused multiquery attention, rotary, parallel attn+MLP block."""

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


@pytest.mark.parity
def test_falcon_decoder_logit_parity(rng):
    from otter_ai.models.falcon.configuration_RW import RWConfig
    from otter_ai.models.falcon.modelling_RW import RWForCausalLM

    torch.manual_seed(0)
    d, heads, layers, vocab = 64, 4, 3, 128
    ref_cfg = RWConfig(
        vocab_size=vocab, hidden_size=d, n_layer=layers, n_head=heads,
        multi_query=True, alibi=False, bias=False, parallel_attn=True,
        tie_word_embeddings=False)
    ref = RWForCausalLM(ref_cfg)
    ref.eval()
    for prm in ref.parameters():
        if prm.dim() > 1:
            torch.nn.init.normal_(prm, std=0.05)

    ids_np = rng.integers(0, vocab, (2, 16)).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref(input_ids=torch.from_numpy(ids_np)).logits.numpy()

    cfg = TextConfig(arch="falcon", vocab_size=vocab, hidden_size=d,
                     num_hidden_layers=layers, num_attention_heads=heads,
                     num_kv_heads=1, intermediate_size=4 * d,
                     max_seq_len=64, pos="rope",
                     norm_type="low_precision_layernorm", act="gelu",
                     tie_embeddings=False, no_bias=True)
    model = Decoder(cfg)
    ids = jnp.asarray(ids_np.astype(np.int32))
    params0 = model.init(jax.random.PRNGKey(0), ids)["params"]
    flat0 = traverse_util.flatten_dict(params0, sep="/")

    from otter_tpu.models.convert import hf_to_flax
    from otter_tpu.config import OtterConfig
    ocfg = OtterConfig(text=cfg)
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in
          ref.state_dict().items()}
    converted = hf_to_flax(sd, ocfg, wrapped=False)
    flat = {k[len("lang_encoder/"):]: v for k, v in converted.items()
            if k.startswith("lang_encoder/")}
    missing = set(flat0) - set(flat)
    assert not missing, sorted(missing)[:10]
    for k in flat0:
        assert tuple(flat[k].shape) == tuple(flat0[k].shape), (
            k, flat[k].shape, flat0[k].shape)
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(flat[k]) for k in flat0}, sep="/")}

    logits, _ = model.apply(params, ids)
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"falcon parity failed: {diff}"
