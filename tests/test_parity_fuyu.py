"""Golden-logit parity for Fuyu/OtterHD: HF `FuyuForCausalLM` (the exact
model class the reference trains for OtterHD,
`/root/reference/pipeline/train/instruction_following.py` model_name=fuyu /
`docs/OtterHD.md`) at tiny dims vs otter_tpu's FuyuVLM, weights moved
through `fuyu_hf_to_flax`. Completes golden parity across every
first-party model family (otter/flamingo-mpt, llama, mosaic, falcon,
idefics, fuyu)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

from otter_tpu.config import FuyuConfig, TextConfig  # noqa: E402
from otter_tpu.models.convert import fuyu_hf_to_flax  # noqa: E402
from otter_tpu.models.fuyu import FuyuVLM  # noqa: E402

PATCH = 6


def _tiny_cfg() -> FuyuConfig:
    return FuyuConfig(
        text=TextConfig(
            arch="persimmon", vocab_size=512, hidden_size=64,
            num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=96, max_seq_len=64, pos="rope",
            rope_theta=25000.0, rope_partial_factor=0.5,
            norm_type="layernorm", qk_ln=True, act="sq_relu",
            tie_embeddings=False, no_bias=False),
        patch_size=PATCH, num_channels=3)


def _build_reference():
    from transformers import FuyuConfig as HFFuyuConfig
    from transformers import FuyuForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFFuyuConfig(
        text_config={"model_type": "persimmon", "hidden_size": 64,
                     "num_hidden_layers": 3, "num_attention_heads": 4,
                     "intermediate_size": 96, "vocab_size": 512,
                     "hidden_act": "relu2", "qk_layernorm": True,
                     "partial_rotary_factor": 0.5, "rope_theta": 25000.0,
                     "max_position_embeddings": 64,
                     "tie_word_embeddings": False},
        hidden_size=64, patch_size=PATCH, num_channels=3,
        image_token_id=500, attn_implementation="eager")
    model = FuyuForCausalLM(hf_cfg)
    with torch.no_grad():
        for prm in model.parameters():
            if prm.ndim >= 2:
                prm.normal_(0.0, 0.05)
    model.eval()
    return model


def test_fuyu_logit_parity():
    rng = np.random.default_rng(11)
    cfg = _tiny_cfg()
    ref = _build_reference()

    b, s, n_patches = 2, 20, 6
    patch_dim = PATCH * PATCH * 3
    patches = rng.standard_normal((b, n_patches, patch_dim)) \
        .astype(np.float32)
    ids = np.asarray(rng.integers(3, 500, (b, s)), np.int64)
    # first n_patches positions hold image patches (Fuyu stream layout);
    # HF places them at input_ids == image_token_id, ours via indices
    indices = np.full((b, s), -1, np.int64)
    indices[:, :n_patches] = np.arange(n_patches)
    ids[:, :n_patches] = 500            # image_token_id placeholders

    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids),
                  image_patches=torch.tensor(patches),
                  image_patches_indices=torch.tensor(indices),
                  attention_mask=torch.ones(b, s, dtype=torch.long))
    ref_logits = out.logits.float().numpy()

    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    flat = fuyu_hf_to_flax(sd, num_heads=4)
    model = FuyuVLM(cfg)
    init = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids.astype(np.int32)),
        image_patches=jnp.asarray(patches),
        image_patches_indices=jnp.asarray(indices.astype(np.int32)))
    init_flat = traverse_util.flatten_dict(init["params"], sep="/")
    missing = set(init_flat) - set(flat)
    assert not missing, sorted(missing)[:10]
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(flat[k]) for k in init_flat}, sep="/")}

    logits, _ = model.apply(
        params, jnp.asarray(ids.astype(np.int32)),
        image_patches=jnp.asarray(patches),
        image_patches_indices=jnp.asarray(indices.astype(np.int32)),
        attention_mask=jnp.ones((b, s), jnp.int32))
    got = np.asarray(logits, np.float32)

    assert got.shape == ref_logits.shape
    diff = np.max(np.abs(got - ref_logits))
    assert diff <= 1e-3, f"max logit diff {diff}"
