"""Param-init zoo parity: per-leaf distribution match vs the reference
`param_init_fns.py` MODEL_INIT_REGISTRY applied to a real torch MPT.

For every scheme both sides initialize the same tiny-MPT shapes; the
torch tree is converted with the standard checkpoint rules and each
leaf's std (and mean for uniform schemes) must agree within sampling
tolerance. This checks the fan conventions ([in,out] flax vs [out,in]
torch), the residual-projection division, the fused-Wqkv chunking, and
the norm/bias/embedding special cases in one shot.
"""

import math
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

from otter_tpu.config import OtterConfig, TextConfig  # noqa: E402
from otter_tpu.models.decoder import Decoder  # noqa: E402
from otter_tpu.models.init_fns import (INIT_REGISTRY,  # noqa: E402
                                       init_decoder_params)

D, HEADS, LAYERS, VOCAB = 128, 4, 3, 512


def _cfg():
    return TextConfig(arch="mpt", vocab_size=VOCAB, hidden_size=D,
                      num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                      intermediate_size=4 * D, max_seq_len=32, pos="alibi",
                      norm_type="low_precision_layernorm", act="gelu",
                      tie_embeddings=True, no_bias=True)


def _flax_tree(cfg, name, icfg):
    model = Decoder(cfg)
    params0 = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8), jnp.int32))["params"]
    tree = init_decoder_params(jax.random.PRNGKey(1), params0, cfg,
                               init_config=dict(icfg, name=name))
    return traverse_util.flatten_dict(tree, sep="/")


def _torch_tree(cfg, name, icfg):
    from otter_ai.models.mpt.configuration_mpt import MPTConfig
    from otter_ai.models.mpt.modeling_mpt import MPTForCausalLM
    torch.manual_seed(0)
    ref_cfg = MPTConfig(
        d_model=D, n_heads=HEADS, n_layers=LAYERS, expansion_ratio=4,
        max_seq_len=32, vocab_size=VOCAB, no_bias=True,
        attn_config={"attn_impl": "torch", "alibi": True,
                     "alibi_bias_max": 8, "prefix_lm": False,
                     "attn_uses_sequence_id": False,
                     "attn_type": "multihead_attention",
                     "attn_pdrop": 0.0, "qk_ln": False,
                     "clip_qkv": None, "softmax_scale": None},
        init_config=dict(icfg, name=name, verbose=0))
    ref = MPTForCausalLM(ref_cfg)
    # the reference applies its init zoo via param_init_fn(module)
    from otter_ai.models.mpt.param_init_fns import MODEL_INIT_REGISTRY
    init_fn = MODEL_INIT_REGISTRY[name]
    ref.apply(lambda m: init_fn(module=m, n_layers=LAYERS, d_model=D,
                                **{k: v for k, v in icfg.items()
                                   if k != "name"}))
    from otter_tpu.models.convert import hf_to_flax
    sd = {f"lang_encoder.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    conv = hf_to_flax(sd, OtterConfig(text=cfg), wrapped=False)
    return {k[len("lang_encoder/"):]: v for k, v in conv.items()
            if k.startswith("lang_encoder/")}


SCHEMES = [
    ("baseline_", {"init_std": 0.04}),
    ("small_init_", {}),
    ("neox_init_", {}),
    ("kaiming_normal_", {"fan_mode": "fan_in",
                         "init_nonlinearity": "relu", "init_gain": 0.0}),
    ("kaiming_uniform_", {"fan_mode": "fan_in",
                          "init_nonlinearity": "relu", "init_gain": 0.0}),
    ("xavier_uniform_", {"init_gain": 1.0}),
    ("xavier_normal_", {"init_gain": 1.0}),
    ("default_", {}),
    ("small_init_", {"emb_init_std": 0.3}),
    ("small_init_", {"init_div_is_residual": 7.0}),
]


@pytest.mark.parametrize("name,icfg", SCHEMES,
                         ids=[f"{n}{i}" for i, (n, _) in enumerate(SCHEMES)])
def test_init_scheme_matches_reference(name, icfg):
    cfg = _cfg()
    ours = _flax_tree(cfg, name, icfg)
    ref = _torch_tree(cfg, name, icfg)
    assert set(ours) == set(ref), (sorted(set(ours) ^ set(ref))[:8])
    for path in sorted(ours):
        a = np.asarray(ours[path], np.float64)
        b = np.asarray(ref[path], np.float64)
        assert a.shape == b.shape, path
        sa, sb = a.std(), b.std()
        if sb < 1e-12:  # constant leaves (norm scales=1, zeros)
            np.testing.assert_allclose(a, b, atol=0, err_msg=path)
            continue
        # distribution match: std within sampling noise, mean ~0
        assert abs(sa - sb) / sb < 0.12, (path, sa, sb)
        assert abs(a.mean()) < 5 * sb / math.sqrt(a.size), (path, a.mean())


def test_registry_complete():
    from otter_ai.models.mpt.param_init_fns import MODEL_INIT_REGISTRY
    assert set(INIT_REGISTRY) == set(MODEL_INIT_REGISTRY)


def test_residual_division_applied():
    cfg = _cfg()
    base = _flax_tree(cfg, "small_init_", {"init_div_is_residual": False})
    div = _flax_tree(cfg, "small_init_", {"init_div_is_residual": True})
    want = math.sqrt(2 * LAYERS)
    for path in base:
        if path.endswith(("attn/out_proj/kernel", "ffn/down_proj/kernel")):
            ratio = np.std(np.asarray(base[path])) / \
                np.std(np.asarray(div[path]))
            assert abs(ratio - want) / want < 0.1, (path, ratio)
