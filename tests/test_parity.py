"""Golden-logit parity vs the PyTorch reference (BASELINE.md: <=1e-3).

Assembles the reference's own modules (perceiver, gated xattn, MPT decoder,
HF CLIP vision tower) at tiny dims using the reference's `init_otter`
surgery, copies the weights through otter_tpu's converter, and compares
logits of the full multimodal forward pass.
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

from otter_tpu.config import (OtterConfig, PerceiverConfig, TextConfig,  # noqa: E402
                              VisionConfig)
from otter_tpu.models.convert import hf_to_flax  # noqa: E402
from otter_tpu.models.otter import OtterVLM  # noqa: E402


def _build_reference(cfg: OtterConfig):
    """Reference composite: CLIPVisionModel + OtterPerceiverResampler +
    MPT wrapped by OtterLMMixin/init_otter (modeling_otter.py:539-597)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from otter_ai.models.mpt.configuration_mpt import MPTConfig
    from otter_ai.models.mpt.modeling_mpt import MPTForCausalLM
    from otter_ai.models.otter import modeling_otter as mo

    torch.manual_seed(0)
    v = cfg.vision
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_hidden_layers,
        num_attention_heads=v.num_attention_heads, image_size=v.image_size,
        patch_size=v.patch_size, hidden_act=v.hidden_act,
        layer_norm_eps=v.layer_norm_eps))

    t = cfg.text
    mpt = MPTForCausalLM(MPTConfig(
        d_model=t.hidden_size, n_heads=t.num_attention_heads,
        n_layers=t.num_hidden_layers, expansion_ratio=t.mlp_dim
        // t.hidden_size, max_seq_len=t.max_seq_len,
        vocab_size=t.total_vocab, no_bias=True,
        norm_type="low_precision_layernorm",
        attn_config={"attn_type": "multihead_attention", "attn_pdrop": 0.0,
                     "attn_impl": "torch", "qk_ln": False, "clip_qkv": None,
                     "softmax_scale": None, "prefix_lm": False,
                     "attn_uses_sequence_id": False, "alibi": True,
                     "alibi_bias_max": int(t.alibi_bias_max)},
        init_config={"name": "baseline_", "init_std": 0.02}))

    p = cfg.perceiver
    perceiver = mo.OtterPerceiverResampler(
        dim=p.dim, depth=p.depth, dim_head=p.dim_head, heads=p.heads,
        num_latents=p.num_latents, max_num_frames=p.max_num_frames,
        max_num_media=p.max_num_media, ff_mult=p.ff_mult)

    mpt.config.hidden_size = t.hidden_size  # init_otter reads hidden_size
    mo.extend_instance(mpt, mo.OtterLMMixin)
    mpt.set_decoder_layers_attr_name("transformer.blocks")
    mpt.init_otter(media_token_id=cfg.media_token_id,
                   vis_hidden_size=p.dim,
                   cross_attn_every_n_layers=cfg.cross_attn_every_n_layers,
                   use_media_placement_augmentation=False)
    # reference xattn blocks default dim_head=64/heads=8; rebuild tiny ones
    for i, layer in enumerate(mpt._get_decoder_layers()):
        if layer.gated_cross_attn_layer is not None:
            layer.gated_cross_attn_layer = mo.OtterGatedCrossAttentionBlock(
                dim=t.hidden_size, dim_visual=p.dim,
                dim_head=cfg.xattn_dim_head, heads=cfg.xattn_heads,
                ff_mult=cfg.xattn_ff_mult,
                only_attend_immediate_media=cfg.only_attend_immediate_media)
    for m in (clip, perceiver, mpt):
        m.eval()
        for prm in m.parameters():
            if prm.dim() > 1:
                torch.nn.init.normal_(prm, std=0.05)
            # keep gates at 0 for one case; set nonzero below
    # make gates nonzero so xattn actually contributes
    for layer in mpt._get_decoder_layers():
        g = layer.gated_cross_attn_layer
        if g is not None:
            with torch.no_grad():
                g.attn_gate.fill_(0.7)
                g.ff_gate.fill_(-0.3)
    return clip, perceiver, mpt


def _reference_forward(clip, perceiver, mpt, vision_x, input_ids,
                       media_token_id):
    """_encode_vision_x + conditioned forward (modeling_otter.py:917-997)."""
    with torch.no_grad():
        b, T, F = vision_x.shape[:3]
        vx = vision_x.reshape(b * T * F, *vision_x.shape[3:])
        feats = clip(vx)[0][:, 1:, :]
        feats = feats.reshape(b, T, F, *feats.shape[1:])
        latents = perceiver(feats)
        for layer in mpt._get_decoder_layers():
            layer.condition_vis_x(latents)
            layer.condition_media_locations(input_ids == media_token_id)
            layer.condition_attend_previous(True)
        out = mpt(input_ids=input_ids,
                  attention_mask=torch.ones_like(input_ids))
        for layer in mpt._get_decoder_layers():
            layer.condition_vis_x(None)
            layer.condition_media_locations(None)
            layer.condition_attend_previous(None)
    return out.logits.numpy()


@pytest.mark.parity
def test_full_otter_logit_parity(rng):
    cfg = OtterConfig.tiny("mpt")
    clip, perceiver, mpt = _build_reference(cfg)

    b, T, F, s = 2, 2, 1, 24
    vision_np = rng.standard_normal(
        (b, T, F, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    ids_np = rng.integers(5, 200, (b, s)).astype(np.int64)
    ids_np[:, 2] = cfg.media_token_id
    ids_np[:, 13] = cfg.media_token_id

    ref_logits = _reference_forward(
        clip, perceiver, mpt, torch.from_numpy(vision_np),
        torch.from_numpy(ids_np), cfg.media_token_id)

    # assemble the HF-style state dict the converter expects
    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"vision_encoder.{k}"] = v.numpy()
    for k, v in perceiver.state_dict().items():
        sd[f"perceiver.{k}"] = v.numpy()
    for k, v in mpt.state_dict().items():
        sd[f"lang_encoder.{k}"] = v.numpy()

    flat = hf_to_flax(sd, cfg, strict=True)

    model = OtterVLM(cfg)
    vision_x = jnp.asarray(vision_np)
    lang_x = jnp.asarray(ids_np.astype(np.int32))
    params0 = model.init(jax.random.PRNGKey(0), vision_x, lang_x)["params"]
    flat0 = traverse_util.flatten_dict(params0, sep="/")
    assert set(flat) == set(flat0), (
        sorted(set(flat0) - set(flat))[:10], sorted(set(flat) - set(flat0))[:10])
    for k in flat0:
        assert tuple(flat[k].shape) == tuple(flat0[k].shape), k
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat.items()}, sep="/")}

    logits, _, _ = model.apply(params, vision_x, lang_x)
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"logit parity failed: max diff {diff}"
