"""Golden-logit parity for the IDEFICS family: HF
`IdeficsForVisionText2Text` (the exact model class the reference trains,
`/root/reference/pipeline/train/instruction_following.py:331-427`) at tiny
dims vs otter_tpu's IdeficsVLM, weights moved through the converter."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

from otter_tpu.config import (IdeficsModelConfig, IdeficsPerceiverConfig,  # noqa: E402
                              TextConfig, VisionConfig)
from otter_tpu.models.convert import hf_to_flax, idefics_rules  # noqa: E402
from otter_tpu.models.idefics import (IdeficsVLM,  # noqa: E402
                                      image_attention_incremental,
                                      incremental_to_binary)

IMAGE_TOKEN_ID = 126
EOS_TOKEN_ID = 2


def _tiny_cfg() -> IdeficsModelConfig:
    return IdeficsModelConfig(
        vision=VisionConfig(hidden_size=48, intermediate_size=96,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=28, patch_size=14, hidden_act="gelu"),
        text=TextConfig(arch="llama", vocab_size=120, hidden_size=64,
                        num_hidden_layers=4, num_attention_heads=4,
                        intermediate_size=96, max_seq_len=64, pos="rope",
                        norm_type="rmsnorm", norm_eps=1e-6,
                        act="silu_glu", tie_embeddings=False, no_bias=True),
        perceiver=IdeficsPerceiverConfig(depth=2, n_heads=4, head_dim=16,
                                         n_latents=6, qk_layer_norms=True),
        cross_layer_interval=2, alpha_type="float", qk_layer_norms=True,
        additional_vocab_size=8,
        media_token_id=IMAGE_TOKEN_ID, eoc_token_id=EOS_TOKEN_ID,
        eos_token_id=EOS_TOKEN_ID)


def _build_reference(cfg: IdeficsModelConfig):
    from transformers import IdeficsConfig, IdeficsForVisionText2Text
    from transformers.models.idefics.configuration_idefics import (
        IdeficsPerceiverConfig as HFPerceiverConfig,
        IdeficsVisionConfig as HFVisionConfig)

    torch.manual_seed(0)
    v, t, p = cfg.vision, cfg.text, cfg.perceiver
    hf_cfg = IdeficsConfig(
        vocab_size=t.vocab_size,
        additional_vocab_size=cfg.additional_vocab_size,
        hidden_size=t.hidden_size, intermediate_size=t.mlp_dim,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        rms_norm_eps=t.norm_eps, cross_layer_interval=cfg.cross_layer_interval,
        qk_layer_norms=cfg.qk_layer_norms, use_resampler=True,
        alpha_initializer="zeros", alpha_type=cfg.alpha_type, tie_word_embeddings=False,
        freeze_text_layers=False, freeze_vision_layers=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=EOS_TOKEN_ID,
        perceiver_config=HFPerceiverConfig(
            use_resampler=True, resampler_depth=p.depth,
            resampler_n_heads=p.n_heads, resampler_head_dim=p.head_dim,
            resampler_n_latents=p.n_latents,
            qk_layer_norms_perceiver=p.qk_layer_norms),
        vision_config=HFVisionConfig(
            embed_dim=v.hidden_size, hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_hidden_layers,
            num_attention_heads=v.num_attention_heads,
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_act=v.hidden_act, layer_norm_eps=v.layer_norm_eps),
        attn_implementation="eager")
    model = IdeficsForVisionText2Text(hf_cfg)
    # non-degenerate params everywhere: HF zero-inits the alpha gates
    # (which would silence the whole cross-attention path), so randomize
    # every all-zero 1-d param too
    with torch.no_grad():
        for prm in model.parameters():
            if prm.ndim >= 2:
                prm.normal_(0.0, 0.05)
            elif torch.all(prm == 0):
                prm.normal_(0.0, 0.5)
    model.eval()
    return model


def test_image_attention_mask_semantics_match_hf():
    """Vectorized incremental mask == HF's python-loop builder."""
    from transformers.models.idefics.processing_idefics import (
        image_attention_mask_for_packed_input_ids_pt,
        incremental_to_binary_attention_mask)

    class Tok:
        eos_token_id = EOS_TOKEN_ID

        def convert_tokens_to_ids(self, s):
            return IMAGE_TOKEN_ID

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 100, (4, 24))
    # sprinkle images and eos
    for r, cols in enumerate([(0, 9), (5,), (), (2, 10, 17)]):
        for c in cols:
            ids[r, c] = IMAGE_TOKEN_ID
    ids[0, 12] = EOS_TOKEN_ID
    ids[3, 4] = EOS_TOKEN_ID
    ids[3, 20] = EOS_TOKEN_ID
    n_images = 3

    ref_incr, _ = image_attention_mask_for_packed_input_ids_pt(
        torch.tensor(ids), Tok())
    ref_bin = incremental_to_binary_attention_mask(
        ref_incr.clone(), "pt", num_classes=n_images).numpy()

    incr = image_attention_incremental(jnp.asarray(ids, jnp.int32),
                                       IMAGE_TOKEN_ID, EOS_TOKEN_ID)
    got = np.asarray(incremental_to_binary(incr, n_images)).astype(ref_bin.dtype)
    np.testing.assert_array_equal(got, ref_bin)


@pytest.mark.parity
def test_idefics_logit_parity():
    # own deterministic rng: the session fixture's state depends on test
    # order, and the 1e-3 budget leaves little headroom over fp32
    # accumulation noise across 4 layers + perceiver
    rng = np.random.default_rng(7)
    cfg = _tiny_cfg()
    ref = _build_reference(cfg)

    b, n, s = 2, 2, 16
    pix = rng.standard_normal((b, n, 3, 28, 28)).astype(np.float32)
    ids = np.asarray(rng.integers(3, 100, (b, s)), np.int64)
    ids[:, 1] = IMAGE_TOKEN_ID
    ids[0, 7] = IMAGE_TOKEN_ID
    ids[1, 4] = EOS_TOKEN_ID
    ids[1, 6] = IMAGE_TOKEN_ID
    ids[0, 10] = cfg.text.vocab_size + 3   # exercise the decoupled vocab
    attn = np.ones((b, s), np.int64)
    from transformers.models.idefics.processing_idefics import (
        image_attention_mask_for_packed_input_ids_pt,
        incremental_to_binary_attention_mask)

    class Tok:
        eos_token_id = EOS_TOKEN_ID

        def convert_tokens_to_ids(self, _):
            return IMAGE_TOKEN_ID

    incr, _ = image_attention_mask_for_packed_input_ids_pt(
        torch.tensor(ids), Tok())
    iam = incremental_to_binary_attention_mask(incr, "pt", num_classes=n)

    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(attn),
                  pixel_values=torch.tensor(pix),
                  image_attention_mask=iam)
    ref_logits = out.logits.float().numpy()

    # convert weights and run the flax model (it computes the image mask
    # from input_ids internally; semantics pinned by the test above)
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    flat = hf_to_flax(sd, cfg, rules=idefics_rules(cfg), strict=False)
    model = IdeficsVLM(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(pix),
                      jnp.asarray(ids.astype(np.int32)))["params"]
    init_flat = traverse_util.flatten_dict(init, sep="/")
    missing = set(init_flat) - set(flat)
    assert not missing, sorted(missing)[:10]
    params = {"params": traverse_util.unflatten_dict(
        {k: flat[k] for k in init_flat}, sep="/")}

    logits, _, _ = model.apply(
        params, jnp.asarray(pix), jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(attn.astype(np.int32)))
    got = np.asarray(logits, np.float32)

    assert got.shape == ref_logits.shape
    diff = np.max(np.abs(got - ref_logits))
    assert diff <= 1e-3, f"max logit diff {diff}"
