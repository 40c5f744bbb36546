"""Golden-logit parity for the MosaicGPT (mpt-1B-redpajama) Otter variant —
the architecture the driver benchmark runs — including qk_ln."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

from otter_tpu.config import OtterConfig  # noqa: E402
from otter_tpu.models.convert import hf_to_flax  # noqa: E402
from otter_tpu.models.otter import OtterVLM  # noqa: E402


def _tiny_cfg():
    cfg = OtterConfig.tiny("mpt")
    return cfg.replace(text=cfg.text.replace(arch="mosaic_gpt", qk_ln=True))


def _build_reference(cfg):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from otter_ai.models.mpt_redpajama.configuration_mosaic_gpt import \
        MosaicGPTConfig
    from otter_ai.models.mpt_redpajama.mosaic_gpt import MosaicGPT
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
    gpt = MosaicGPT(MosaicGPTConfig(
        d_model=t.hidden_size, n_heads=t.num_attention_heads,
        n_layers=t.num_hidden_layers, mlp_ratio=t.mlp_dim // t.hidden_size,
        max_seq_len=t.max_seq_len, vocab_size=t.total_vocab,
        attn_impl="torch", attn_qk_ln=True, alibi=True,
        alibi_bias_max=int(t.alibi_bias_max), no_bias=True,
        low_precision_layernorm=True))

    p = cfg.perceiver
    perceiver = mo.OtterPerceiverResampler(
        dim=p.dim, depth=p.depth, dim_head=p.dim_head, heads=p.heads,
        num_latents=p.num_latents, max_num_frames=p.max_num_frames,
        ff_mult=p.ff_mult)

    wrapped = torch.nn.ModuleList()
    for i, block in enumerate(gpt.transformer.blocks):
        gated = None
        if (i + 1) % cfg.cross_attn_every_n_layers == 0:
            gated = mo.OtterGatedCrossAttentionBlock(
                dim=t.hidden_size, dim_visual=p.dim,
                dim_head=cfg.xattn_dim_head, heads=cfg.xattn_heads,
                ff_mult=cfg.xattn_ff_mult,
                only_attend_immediate_media=cfg.only_attend_immediate_media)
            with torch.no_grad():
                gated.attn_gate.fill_(0.3)
                gated.ff_gate.fill_(0.6)
        wrapped.append(mo.OtterLayer(gated, block))
    gpt.transformer.blocks = wrapped
    for m in (clip, perceiver, gpt):
        m.eval()
        for prm in m.parameters():
            if prm.dim() > 1:
                torch.nn.init.normal_(prm, std=0.05)
    return clip, perceiver, gpt


@pytest.mark.parity
def test_mosaic_gpt_otter_logit_parity(rng):
    cfg = _tiny_cfg()
    clip, perceiver, gpt = _build_reference(cfg)

    b, s = 1, 20
    vision_np = rng.standard_normal(
        (b, 1, 1, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    ids_np = rng.integers(5, 200, (b, s)).astype(np.int64)
    ids_np[:, 0] = cfg.media_token_id

    with torch.no_grad():
        vx = torch.from_numpy(vision_np).reshape(
            b, 3, cfg.vision.image_size, cfg.vision.image_size)
        feats = clip(vx)[0][:, 1:, :].reshape(b, 1, 1, -1,
                                              cfg.vision.hidden_size)
        latents = perceiver(feats)
        ids_t = torch.from_numpy(ids_np)
        for layer in gpt.transformer.blocks:
            layer.condition_vis_x(latents)
            layer.condition_media_locations(ids_t == cfg.media_token_id)
            layer.condition_attend_previous(True)
        ref_logits = gpt(input_ids=ids_t).logits.numpy()

    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"vision_encoder.{k}"] = v.numpy()
    for k, v in perceiver.state_dict().items():
        sd[f"perceiver.{k}"] = v.numpy()
    for k, v in gpt.state_dict().items():
        sd[f"lang_encoder.{k}"] = v.numpy()

    flat = hf_to_flax(sd, cfg, strict=True)

    model = OtterVLM(cfg)
    vision_x = jnp.asarray(vision_np)
    lang_x = jnp.asarray(ids_np.astype(np.int32))
    params0 = model.init(jax.random.PRNGKey(0), vision_x, lang_x)["params"]
    flat0 = traverse_util.flatten_dict(params0, sep="/")
    assert set(flat) == set(flat0), (
        sorted(set(flat0) - set(flat))[:8], sorted(set(flat) - set(flat0))[:8])
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat.items()}, sep="/")}

    logits, _, _ = model.apply(params, vision_x, lang_x)
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"mosaic_gpt otter parity failed: {diff}"
