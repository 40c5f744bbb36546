"""Golden-logit parity for the LLaMA-backed Otter variant
(OTTER-Video-LLaMA7B architecture at tiny dims): HF LlamaForCausalLM
wrapped by the reference's OtterLayer + gated xattn vs otter_tpu."""

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


def _build_reference_llama(cfg: OtterConfig):
    from transformers import CLIPVisionConfig, CLIPVisionModel, LlamaConfig
    from transformers import LlamaForCausalLM
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
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=t.total_vocab, hidden_size=t.hidden_size,
        intermediate_size=t.mlp_dim, num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_attention_heads,
        max_position_embeddings=t.max_seq_len, rms_norm_eps=t.norm_eps,
        rope_theta=t.rope_theta, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False, attn_implementation="eager"))

    p = cfg.perceiver
    perceiver = mo.OtterPerceiverResampler(
        dim=p.dim, depth=p.depth, dim_head=p.dim_head, heads=p.heads,
        num_latents=p.num_latents, max_num_frames=p.max_num_frames,
        ff_mult=p.ff_mult)

    # wrap decoder layers with gated xattn per cross_attn_every_n_layers
    layers = llama.model.layers
    wrapped = torch.nn.ModuleList()
    for i, layer in enumerate(layers):
        gated = None
        if (i + 1) % cfg.cross_attn_every_n_layers == 0:
            gated = mo.OtterGatedCrossAttentionBlock(
                dim=t.hidden_size, dim_visual=p.dim,
                dim_head=cfg.xattn_dim_head, heads=cfg.xattn_heads,
                ff_mult=cfg.xattn_ff_mult,
                only_attend_immediate_media=cfg.only_attend_immediate_media)
            with torch.no_grad():
                gated.attn_gate.fill_(0.5)
                gated.ff_gate.fill_(-0.2)
        wrapped.append(mo.OtterLayer(gated, layer))
    llama.model.layers = wrapped
    for m in (clip, perceiver, llama):
        m.eval()
        for prm in m.parameters():
            if prm.dim() > 1:
                torch.nn.init.normal_(prm, std=0.05)
    return clip, perceiver, llama


@pytest.mark.parity
def test_llama_otter_logit_parity(rng):
    cfg = OtterConfig.tiny("llama")
    clip, perceiver, llama = _build_reference_llama(cfg)

    b, T, F, s = 1, 1, 1, 16
    vision_np = rng.standard_normal(
        (b, T, F, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    ids_np = rng.integers(5, 200, (b, s)).astype(np.int64)
    ids_np[:, 1] = cfg.media_token_id

    with torch.no_grad():
        vx = torch.from_numpy(vision_np).reshape(
            b * T * F, 3, cfg.vision.image_size, cfg.vision.image_size)
        feats = clip(vx)[0][:, 1:, :]
        feats = feats.reshape(b, T, F, *feats.shape[1:])
        latents = perceiver(feats)
        ids_t = torch.from_numpy(ids_np)
        for layer in llama.model.layers:
            layer.condition_vis_x(latents)
            layer.condition_media_locations(ids_t == cfg.media_token_id)
            layer.condition_attend_previous(True)
        ref_logits = llama(input_ids=ids_t).logits.numpy()

    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"vision_encoder.{k}"] = v.numpy()
    for k, v in perceiver.state_dict().items():
        sd[f"perceiver.{k}"] = v.numpy()
    for k, v in llama.state_dict().items():
        sd[f"lang_encoder.{k}"] = v.numpy()

    flat = hf_to_flax(sd, cfg, strict=False)

    model = OtterVLM(cfg)
    vision_x = jnp.asarray(vision_np)
    lang_x = jnp.asarray(ids_np.astype(np.int32))
    params0 = model.init(jax.random.PRNGKey(0), vision_x, lang_x)["params"]
    flat0 = traverse_util.flatten_dict(params0, sep="/")
    missing = set(flat0) - set(flat)
    assert not missing, sorted(missing)[:10]
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat.items() if k in flat0},
        sep="/")}

    logits, _, _ = model.apply(params, vision_x, lang_x)
    diff = np.max(np.abs(np.asarray(logits, np.float32) - ref_logits))
    assert diff <= 1e-3, f"llama otter logit parity failed: {diff}"
