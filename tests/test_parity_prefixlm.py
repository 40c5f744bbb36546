"""Prefix-LM + sequence-id attention parity vs the reference MPT.

Covers the M7 surface the rebuild previously lacked: the bidirectional-
over-prefix attention path (`/root/reference/src/otter_ai/models/mpt/
modeling_mpt.py:147-162,206` `_apply_prefix_mask`) and block-diagonal
intra-document attention (`modeling_mpt.py:164-172,216-221`
`_apply_sequence_id`), at tiny dims with converted weights.

The TPU-native design needs no S×S mask for either alone: prefix-LM
rides the flash kernel's ids_mode="ge" comparison (prefix keys id 0,
other keys their position) and sequence_id the existing eq segment
mask. Only the combined case materializes a bias, as the reference
always does.
"""

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

D, HEADS, LAYERS, VOCAB, B, S = 64, 4, 3, 128, 2, 16


def _build_pair(rng, *, prefix_lm=False, seq_id=False):
    from otter_ai.models.mpt.configuration_mpt import MPTConfig
    from otter_ai.models.mpt.modeling_mpt import MPTForCausalLM

    torch.manual_seed(0)
    ref_cfg = MPTConfig(
        d_model=D, n_heads=HEADS, n_layers=LAYERS, expansion_ratio=4,
        max_seq_len=64, vocab_size=VOCAB, no_bias=True,
        attn_config={"attn_impl": "torch", "alibi": True,
                     "alibi_bias_max": 8, "prefix_lm": prefix_lm,
                     "attn_uses_sequence_id": seq_id,
                     "attn_type": "multihead_attention",
                     "attn_pdrop": 0.0, "qk_ln": False,
                     "clip_qkv": None, "softmax_scale": None})
    ref = MPTForCausalLM(ref_cfg)
    ref.eval()
    for prm in ref.parameters():
        if prm.dim() > 1:
            torch.nn.init.normal_(prm, std=0.05)

    cfg = TextConfig(arch="mpt", vocab_size=VOCAB, hidden_size=D,
                     num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                     intermediate_size=4 * D, max_seq_len=64, pos="alibi",
                     norm_type="low_precision_layernorm", act="gelu",
                     tie_embeddings=True, no_bias=True,
                     prefix_lm=prefix_lm, attn_uses_sequence_id=seq_id)
    model = Decoder(cfg)
    ids_np = rng.integers(0, VOCAB, (B, S)).astype(np.int64)
    ids = jnp.asarray(ids_np.astype(np.int32))

    params0 = model.init(
        jax.random.PRNGKey(0), ids,
        prefix_mask=(jnp.ones((B, S), bool) if prefix_lm else None),
        sequence_id=(jnp.zeros((B, S), jnp.int32) if seq_id else None),
    )["params"]
    flat0 = traverse_util.flatten_dict(params0, sep="/")

    from otter_tpu.models.convert import hf_to_flax
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in
          ref.state_dict().items()}
    converted = hf_to_flax(sd, OtterConfig(text=cfg), wrapped=False)
    flat = {k[len("lang_encoder/"):]: v for k, v in converted.items()
            if k.startswith("lang_encoder/")}
    missing = set(flat0) - set(flat)
    assert not missing, sorted(missing)[:10]
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(flat[k]) for k in flat0}, sep="/")}
    return ref, model, params, ids_np, ids


@pytest.mark.parity
def test_prefix_lm_parity(rng):
    ref, model, params, ids_np, ids = _build_pair(rng, prefix_lm=True)
    # ragged prefixes: row 0 first 5 tokens bidirectional, row 1 first 9
    pm_np = np.zeros((B, S), bool)
    pm_np[0, :5] = True
    pm_np[1, :9] = True
    with torch.no_grad():
        ref_logits = ref(input_ids=torch.from_numpy(ids_np),
                         prefix_mask=torch.from_numpy(pm_np)).logits.numpy()
    logits, _ = model.apply(params, ids, prefix_mask=jnp.asarray(pm_np))
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"prefix-LM parity failed: {diff}"

    # the prefix must actually change the result vs plain causal
    causal_model = Decoder(model.cfg.replace(prefix_lm=False))
    causal_logits, _ = causal_model.apply(params, ids)
    assert np.max(np.abs(np.asarray(logits - causal_logits))) > 1e-3


@pytest.mark.parity
def test_prefix_lm_with_padding_parity(rng):
    ref, model, params, ids_np, ids = _build_pair(rng, prefix_lm=True)
    pm_np = np.zeros((B, S), bool)
    pm_np[:, :4] = True
    am_np = np.ones((B, S), bool)
    am_np[0, -3:] = False          # right padding (MPT forbids left pads)
    am_np[1, -1:] = False
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.from_numpy(ids_np),
            prefix_mask=torch.from_numpy(pm_np),
            attention_mask=torch.from_numpy(am_np)).logits.numpy()
    logits, _ = model.apply(params, ids, prefix_mask=jnp.asarray(pm_np),
                            attention_mask=jnp.asarray(am_np))
    real = am_np[:, :, None] & np.ones((B, S, VOCAB), bool)
    diff = np.max(np.abs(np.asarray(logits, np.float32)
                         - ref_logits)[real[:, :, 0]])
    assert diff <= 1e-3, f"prefix-LM+padding parity failed: {diff}"


@pytest.mark.parity
def test_sequence_id_parity(rng):
    ref, model, params, ids_np, ids = _build_pair(rng, seq_id=True)
    sid_np = np.zeros((B, S), np.int64)
    sid_np[0, 6:] = 1              # two documents packed in row 0
    sid_np[1, 4:10] = 1            # three in row 1
    sid_np[1, 10:] = 2
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.from_numpy(ids_np),
            sequence_id=torch.from_numpy(sid_np)).logits.numpy()
    logits, _ = model.apply(params, ids,
                            sequence_id=jnp.asarray(sid_np, jnp.int32))
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"sequence-id parity failed: {diff}"


@pytest.mark.parity
def test_prefix_lm_and_sequence_id_parity(rng):
    ref, model, params, ids_np, ids = _build_pair(rng, prefix_lm=True,
                                                  seq_id=True)
    pm_np = np.zeros((B, S), bool)
    pm_np[0, :3] = True
    pm_np[1, 8:11] = True          # a prefix inside the second document
    sid_np = np.zeros((B, S), np.int64)
    sid_np[0, 7:] = 1
    sid_np[1, 8:] = 1
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.from_numpy(ids_np),
            prefix_mask=torch.from_numpy(pm_np),
            sequence_id=torch.from_numpy(sid_np)).logits.numpy()
    logits, _ = model.apply(params, ids, prefix_mask=jnp.asarray(pm_np),
                            sequence_id=jnp.asarray(sid_np, jnp.int32))
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"combined prefix+sequence-id parity failed: {diff}"


def test_prefix_lm_requires_mask():
    cfg = TextConfig(arch="mpt", vocab_size=VOCAB, hidden_size=D,
                     num_hidden_layers=1, num_attention_heads=HEADS,
                     intermediate_size=4 * D, max_seq_len=64, pos="alibi",
                     prefix_lm=True)
    model = Decoder(cfg)
    with pytest.raises(ValueError, match="prefix_mask"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
