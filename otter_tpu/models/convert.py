"""Weight conversion: HF/PyTorch Otter checkpoints <-> otter_tpu param trees.

Replaces the reference's conversion/surgery tooling (SURVEY.md §2 C1:
`injecting_*_into_flamingo.py`, `converting_otter_pt_to_hf.py`,
`pipeline/utils/apply_delta.py`) with bidirectional name/layout mapping:

  HF checkpoint names (state_dict of `OtterForConditionalGeneration`,
  modeling_otter.py:739) <-> flax param paths of `OtterVLM`.

Layout conventions: torch Linear weight [out, in] -> flax Dense kernel
[in, out] (transposed); torch Conv2d weight [O, I, kh, kw] -> flax Conv
kernel [kh, kw, I, O]; norms weight/bias -> scale/bias.

Loading helpers read .pt/.bin (torch.load) and .safetensors without
importing any reference code.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from otter_tpu.config import OtterConfig

# ── low-level file loading ──────────────────────────────────────────


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load one or many checkpoint shards into {name: np.ndarray}."""
    paths = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith((".safetensors", ".bin", ".pt")):
                paths.append(os.path.join(path, f))
    else:
        paths = [path]
    out: Dict[str, np.ndarray] = {}
    for p in paths:
        if p.endswith(".safetensors"):
            from safetensors.numpy import load_file
            out.update(load_file(p))
        else:
            import torch
            sd = torch.load(p, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            for k, v in sd.items():
                out[k] = v.float().numpy() if v.dtype == torch.bfloat16 \
                    else v.numpy()
    return out


# ── name mapping ────────────────────────────────────────────────────


def _t(x):  # torch Linear -> flax Dense
    return np.ascontiguousarray(x.T)


def _conv(x):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _clip_rules(hf_prefix: str = "vision_encoder.vision_model."
                ) -> Iterable[Tuple[str, str, Any]]:
    """(hf regex, flax template, transform). The same ViT layout serves
    Otter's CLIP tower and the idefics vision tower (different prefix)."""
    p = hf_prefix
    yield (re.escape(p) + r"embeddings\.class_embedding",
           "vision_encoder/class_embedding", None)
    yield (re.escape(p) + r"embeddings\.patch_embedding\.weight",
           "vision_encoder/patch_embedding/kernel", _conv)
    yield (re.escape(p) + r"embeddings\.position_embedding\.weight",
           "vision_encoder/position_embedding", None)
    yield (re.escape(p) + r"pre_layrnorm\.weight",
           "vision_encoder/pre_layernorm/scale", None)
    yield (re.escape(p) + r"pre_layrnorm\.bias",
           "vision_encoder/pre_layernorm/bias", None)
    yield (re.escape(p) + r"post_layernorm\.weight",
           "vision_encoder/post_layernorm/scale", None)
    yield (re.escape(p) + r"post_layernorm\.bias",
           "vision_encoder/post_layernorm/bias", None)
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.self_attn\.{proj}"
               r"\.weight",
               f"vision_encoder/layers_{{0}}/self_attn/{proj}/kernel", _t)
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.self_attn\.{proj}"
               r"\.bias",
               f"vision_encoder/layers_{{0}}/self_attn/{proj}/bias", None)
    for ln in ("layer_norm1", "layer_norm2"):
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.{ln}\.weight",
               f"vision_encoder/layers_{{0}}/{ln}/scale", None)
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.{ln}\.bias",
               f"vision_encoder/layers_{{0}}/{ln}/bias", None)
    for fc in ("fc1", "fc2"):
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.mlp\.{fc}\.weight",
               f"vision_encoder/layers_{{0}}/{fc}/kernel", _t)
        yield (re.escape(p) + rf"encoder\.layers\.(\d+)\.mlp\.{fc}\.bias",
               f"vision_encoder/layers_{{0}}/{fc}/bias", None)


def _perceiver_rules() -> Iterable[Tuple[str, str, Any]]:
    yield (r"perceiver\.latents", "perceiver/latents", None)
    yield (r"perceiver\.frame_embs", "perceiver/frame_embs", None)
    yield (r"perceiver\.media_time_embs", "perceiver/media_time_embs", None)
    yield (r"perceiver\.norm\.weight", "perceiver/norm/scale", None)
    yield (r"perceiver\.norm\.bias", "perceiver/norm/bias", None)
    for tn, fn, tr in (("to_q", "to_q", _t), ("to_kv", "to_kv", _t),
                       ("to_out", "to_out", _t)):
        yield (rf"perceiver\.layers\.(\d+)\.{tn}\.weight",
               f"perceiver/layers_{{0}}/{fn}/kernel", tr)
    for tn, fn in (("norm_media", "norm_media"),
                   ("norm_latents", "norm_latents")):
        yield (rf"perceiver\.layers\.(\d+)\.{tn}\.weight",
               f"perceiver/layers_{{0}}/{fn}/scale", None)
        yield (rf"perceiver\.layers\.(\d+)\.{tn}\.bias",
               f"perceiver/layers_{{0}}/{fn}/bias", None)
    # feed_forward ModuleList: 0=LN, 1=up, 3=down (modeling_otter.py:142-149)
    yield (r"perceiver\.layers\.(\d+)\.feed_forward\.0\.weight",
           "perceiver/layers_{0}/ff_norm/scale", None)
    yield (r"perceiver\.layers\.(\d+)\.feed_forward\.0\.bias",
           "perceiver/layers_{0}/ff_norm/bias", None)
    yield (r"perceiver\.layers\.(\d+)\.feed_forward\.1\.weight",
           "perceiver/layers_{0}/ff_up/kernel", _t)
    yield (r"perceiver\.layers\.(\d+)\.feed_forward\.3\.weight",
           "perceiver/layers_{0}/ff_down/kernel", _t)


def _xattn_rules(lang_prefix: str, block_attr: str
                 ) -> Iterable[Tuple[str, str, Any]]:
    """Gated xattn blocks wrapped around decoder layers (`OtterLayer`)."""
    p = rf"{lang_prefix}\.{block_attr}\.(\d+)\.gated_cross_attn_layer\."
    yield (p + r"attn_gate", "lang_encoder/xattn_{0}/attn_gate", None)
    yield (p + r"ff_gate", "lang_encoder/xattn_{0}/ff_gate", None)
    yield (p + r"attn\.norm\.weight",
           "lang_encoder/xattn_{0}/attn/norm/scale", None)
    yield (p + r"attn\.norm\.bias",
           "lang_encoder/xattn_{0}/attn/norm/bias", None)
    for proj in ("to_q", "to_kv", "to_out"):
        yield (p + rf"attn\.{proj}\.weight",
               f"lang_encoder/xattn_{{0}}/attn/{proj}/kernel", _t)
    yield (p + r"feed_forward\.0\.weight",
           "lang_encoder/xattn_{0}/ff_norm/scale", None)
    yield (p + r"feed_forward\.0\.bias",
           "lang_encoder/xattn_{0}/ff_norm/bias", None)
    yield (p + r"feed_forward\.1\.weight",
           "lang_encoder/xattn_{0}/ff_up/kernel", _t)
    yield (p + r"feed_forward\.3\.weight",
           "lang_encoder/xattn_{0}/ff_down/kernel", _t)


def _mpt_rules(wrapped: bool) -> Iterable[Tuple[str, str, Any]]:
    """MPT/MosaicGPT decoder (`transformer.*`). `wrapped`: blocks are inside
    `OtterLayer.decoder_layer` after init_otter."""
    mid = r"\.decoder_layer\." if wrapped else r"\."
    p = r"lang_encoder\.transformer\."
    yield (p + r"wte\.weight", "lang_encoder/wte/embedding", None)
    yield (p + r"norm_f\.weight", "lang_encoder/norm_f/scale", None)
    yield (p + r"norm_f\.bias", "lang_encoder/norm_f/bias", None)
    # mosaic_gpt (mpt_redpajama) names the final norm ln_f
    yield (p + r"ln_f\.weight", "lang_encoder/norm_f/scale", None)
    yield (p + r"ln_f\.bias", "lang_encoder/norm_f/bias", None)
    b = p + r"blocks\.(\d+)" + mid
    for ln in ("norm_1", "norm_2"):
        yield (b + rf"{ln}\.weight", f"lang_encoder/layers_{{0}}/{ln}/scale",
               None)
        yield (b + rf"{ln}\.bias", f"lang_encoder/layers_{{0}}/{ln}/bias",
               None)
    yield (b + r"attn\.Wqkv\.weight",
           "lang_encoder/layers_{0}/attn/Wqkv/kernel", _t)
    yield (b + r"attn\.Wqkv\.bias",
           "lang_encoder/layers_{0}/attn/Wqkv/bias", None)
    yield (b + r"attn\.q_ln\.weight",
           "lang_encoder/layers_{0}/attn/q_ln/scale", None)
    yield (b + r"attn\.k_ln\.weight",
           "lang_encoder/layers_{0}/attn/k_ln/scale", None)
    yield (b + r"attn\.out_proj\.weight",
           "lang_encoder/layers_{0}/attn/out_proj/kernel", _t)
    yield (b + r"ffn\.up_proj\.weight",
           "lang_encoder/layers_{0}/ffn/up_proj/kernel", _t)
    yield (b + r"ffn\.down_proj\.weight",
           "lang_encoder/layers_{0}/ffn/down_proj/kernel", _t)
    # mosaic_gpt variant uses mlp_up/mlp_down inside GPTBlock
    yield (b + r"mlp\.mlp_up\.weight",
           "lang_encoder/layers_{0}/ffn/up_proj/kernel", _t)
    yield (b + r"mlp\.mlp_down\.weight",
           "lang_encoder/layers_{0}/ffn/down_proj/kernel", _t)
    yield (b + r"ln_1\.weight", "lang_encoder/layers_{0}/norm_1/scale", None)
    yield (b + r"ln_2\.weight", "lang_encoder/layers_{0}/norm_2/scale", None)


def _llama_rules(wrapped: bool) -> Iterable[Tuple[str, str, Any]]:
    mid = r"\.decoder_layer\." if wrapped else r"\."
    p = r"lang_encoder\.model\."
    yield (p + r"embed_tokens\.weight", "lang_encoder/wte/embedding", None)
    yield (p + r"norm\.weight", "lang_encoder/norm_f/scale", None)
    yield (r"lang_encoder\.lm_head\.weight", "lang_encoder/lm_head/kernel",
           _t)
    b = p + r"layers\.(\d+)" + mid
    for proj in ("q_proj", "k_proj", "v_proj"):
        yield (b + rf"self_attn\.{proj}\.weight",
               f"lang_encoder/layers_{{0}}/attn/{proj}/kernel", _t)
    yield (b + r"self_attn\.o_proj\.weight",
           "lang_encoder/layers_{0}/attn/out_proj/kernel", _t)
    for proj in ("gate_proj", "up_proj", "down_proj"):
        yield (b + rf"mlp\.{proj}\.weight",
               f"lang_encoder/layers_{{0}}/ffn/{proj}/kernel", _t)
    yield (b + r"input_layernorm\.weight",
           "lang_encoder/layers_{0}/norm_1/scale", None)
    yield (b + r"post_attention_layernorm\.weight",
           "lang_encoder/layers_{0}/norm_2/scale", None)


def _falcon_rules(wrapped: bool) -> Iterable[Tuple[str, str, Any]]:
    """Falcon/RW decoder (reference `falcon/modelling_RW.py:507+`:
    transformer.word_embeddings / h.N.self_attention.query_key_value /
    .dense / mlp.dense_h_to_4h / dense_4h_to_h / input_layernorm / ln_f)."""
    mid = r"\.decoder_layer\." if wrapped else r"\."
    p = r"lang_encoder\.transformer\."
    yield (p + r"word_embeddings\.weight", "lang_encoder/wte/embedding",
           None)
    yield (p + r"ln_f\.weight", "lang_encoder/norm_f/scale", None)
    yield (p + r"ln_f\.bias", "lang_encoder/norm_f/bias", None)
    yield (r"lang_encoder\.lm_head\.weight", "lang_encoder/lm_head/kernel",
           _t)
    b = p + r"h\.(\d+)" + mid
    yield (b + r"self_attention\.query_key_value\.weight",
           "lang_encoder/layers_{0}/attn/Wqkv/kernel", _t)
    yield (b + r"self_attention\.dense\.weight",
           "lang_encoder/layers_{0}/attn/out_proj/kernel", _t)
    yield (b + r"mlp\.dense_h_to_4h\.weight",
           "lang_encoder/layers_{0}/ffn/up_proj/kernel", _t)
    yield (b + r"mlp\.dense_4h_to_h\.weight",
           "lang_encoder/layers_{0}/ffn/down_proj/kernel", _t)
    yield (b + r"input_layernorm\.weight",
           "lang_encoder/layers_{0}/norm_1/scale", None)
    yield (b + r"input_layernorm\.bias",
           "lang_encoder/layers_{0}/norm_1/bias", None)


def otter_rules(cfg: OtterConfig, wrapped: bool = True):
    rules = list(_clip_rules()) + list(_perceiver_rules())
    if cfg.text.arch in ("mpt", "mosaic_gpt"):
        attr = "blocks"
        rules += list(_xattn_rules(r"lang_encoder\.transformer", attr))
        rules += list(_mpt_rules(wrapped))
    elif cfg.text.arch == "llama":
        rules += list(_xattn_rules(r"lang_encoder\.model", "layers"))
        rules += list(_llama_rules(wrapped))
    elif cfg.text.arch == "falcon":
        rules += list(_xattn_rules(r"lang_encoder\.transformer", "h"))
        rules += list(_falcon_rules(wrapped))
    else:
        raise NotImplementedError(cfg.text.arch)
    return [(re.compile(pat + r"$"), tmpl, tr) for pat, tmpl, tr in rules]


def idefics_rules(cfg) -> list:
    """HF `IdeficsForVisionText2Text` state_dict names -> IdeficsVLM param
    paths (reference trains idefics via instruction_following.py:331-427).
    `cfg` is an IdeficsModelConfig (needs cross_layer_interval and layer
    counts for the concrete gated-xattn index mapping)."""
    rules: list = list(_clip_rules("model.vision_model."))

    # decoupled embedding / lm_head
    rules += [
        (r"model\.embed_tokens\.weight", "wte/embedding", None),
        (r"model\.embed_tokens\.additional_embedding\.weight",
         "additional_embedding/embedding", None),
        (r"lm_head\.weight", "lm_head/kernel", _t),
        (r"lm_head\.additional_fc\.weight", "additional_fc/kernel", _t),
        (r"model\.norm\.weight", "norm_f/scale", None),
    ]

    # perceiver resampler (blocks.N.0 = attention, blocks.N.1 = MLP)
    p = r"model\.perceiver_resampler\."
    rules += [
        (p + r"latents", "perceiver/latents", None),
        (p + r"layer_norm\.weight", "perceiver/layer_norm/scale", None),
        (p + r"layer_norm\.bias", "perceiver/layer_norm/bias", None),
    ]
    for ln in ("context_layer_norm", "latents_layer_norm",
               "q_layer_norm", "k_layer_norm"):
        rules += [
            (p + rf"blocks\.(\d+)\.0\.{ln}\.weight",
             f"perceiver/blocks_{{0}}_attn/{ln}/scale", None),
            (p + rf"blocks\.(\d+)\.0\.{ln}\.bias",
             f"perceiver/blocks_{{0}}_attn/{ln}/bias", None),
        ]
    for proj in ("q_proj", "k_proj", "v_proj", "output_proj"):
        rules.append((p + rf"blocks\.(\d+)\.0\.{proj}\.weight",
                      f"perceiver/blocks_{{0}}_attn/{proj}/kernel", _t))
    rules += [
        (p + r"blocks\.(\d+)\.1\.ln\.weight",
         "perceiver/blocks_{0}_mlp/ln/scale", None),
        (p + r"blocks\.(\d+)\.1\.ln\.bias",
         "perceiver/blocks_{0}_mlp/ln/bias", None),
        (p + r"blocks\.(\d+)\.1\.fc\.weight",
         "perceiver/blocks_{0}_mlp/fc/kernel", _t),
        (p + r"blocks\.(\d+)\.1\.c_proj\.weight",
         "perceiver/blocks_{0}_mlp/c_proj/kernel", _t),
    ]

    # gated cross-attn: HF indexes them densely (gated_cross_attn_layers.J);
    # flax names them by the decoder layer they precede (xattn_{J*interval})
    n_xattn = cfg.text.num_hidden_layers // cfg.cross_layer_interval
    for j in range(n_xattn):
        g = re.escape(f"model.gated_cross_attn_layers.{j}.")
        fx = f"xattn_{j * cfg.cross_layer_interval}"
        for hf_p, fl_p in (("cross_attn.q_proj", "q_proj"),
                           ("cross_attn.k_proj", "k_proj"),
                           ("cross_attn.v_proj", "v_proj"),
                           ("cross_attn.o_proj", "o_proj"),
                           ("mlp.gate_proj", "gate_proj"),
                           ("mlp.up_proj", "up_proj"),
                           ("mlp.down_proj", "down_proj")):
            rules.append((g + re.escape(hf_p) + r"\.weight",
                          f"{fx}/{fl_p}/kernel", _t))
        for hf_n, fl_n in (("input_layernorm", "input_layernorm"),
                           ("post_attention_layernorm",
                            "post_attention_layernorm"),
                           ("cross_attn.q_layer_norm", "q_layer_norm"),
                           ("cross_attn.k_layer_norm", "k_layer_norm")):
            rules.append((g + re.escape(hf_n) + r"\.weight",
                          f"{fx}/{fl_n}/scale", None))
        rules.append((g + r"alpha_cross_attn", f"{fx}/alpha_cross_attn",
                      None))
        rules.append((g + r"alpha_dense", f"{fx}/alpha_dense", None))

    # LLaMA trunk (+ per-head q/k RMS norms)
    b = r"model\.layers\.(\d+)\."
    for proj in ("q_proj", "k_proj", "v_proj"):
        rules.append((b + rf"self_attn\.{proj}\.weight",
                      f"layers_{{0}}/attn/{proj}/kernel", _t))
    rules += [
        (b + r"self_attn\.o_proj\.weight",
         "layers_{0}/attn/out_proj/kernel", _t),
        (b + r"self_attn\.q_layer_norm\.weight",
         "layers_{0}/attn/q_ln/scale", None),
        (b + r"self_attn\.k_layer_norm\.weight",
         "layers_{0}/attn/k_ln/scale", None),
        (b + r"input_layernorm\.weight", "layers_{0}/norm_1/scale", None),
        (b + r"post_attention_layernorm\.weight",
         "layers_{0}/norm_2/scale", None),
    ]
    for proj in ("gate_proj", "up_proj", "down_proj"):
        rules.append((b + rf"mlp\.{proj}\.weight",
                      f"layers_{{0}}/ffn/{proj}/kernel", _t))

    return [(re.compile(pat + r"$"), tmpl, tr) for pat, tmpl, tr in rules]


def fuyu_rules(num_heads: int = 64) -> list:
    """adept/fuyu-8b checkpoint names -> FuyuVLM param paths
    (reference `fuyu/modeling_fuyu.py`/`modeling_persimmon.py` attribute
    names). The HF persimmon fused qkv is per-head INTERLEAVED
    ([h, 3, d] row blocks, `PersimmonAttention._split_heads`); our
    decoder splits flat [q | k | v], so the qkv weight/bias rows are
    de-interleaved here (a pure permutation)."""

    def _deint_w(x):          # [3hd, in] torch -> [in, 3hd] flax, flat qkv
        out, inn = x.shape
        d = out // (3 * num_heads)
        x = x.reshape(num_heads, 3, d, inn).transpose(1, 0, 2, 3)
        return np.ascontiguousarray(x.reshape(out, inn).T)

    def _deint_b(x):          # [3hd] bias
        d = x.shape[0] // (3 * num_heads)
        return np.ascontiguousarray(
            x.reshape(num_heads, 3, d).transpose(1, 0, 2).reshape(-1))

    rules = [
        (r"vision_embed_tokens\.weight", "vision_embed_tokens/kernel", _t),
        (r"vision_embed_tokens\.bias", "vision_embed_tokens/bias", None),
        (r"language_model\.model\.embed_tokens\.weight",
         "language_model/wte/embedding", None),
        (r"language_model\.model\.final_layernorm\.weight",
         "language_model/norm_f/scale", None),
        (r"language_model\.model\.final_layernorm\.bias",
         "language_model/norm_f/bias", None),
        (r"language_model\.lm_head\.weight",
         "language_model/lm_head/kernel", _t),
    ]
    b = r"language_model\.model\.layers\.(\d+)\."
    rules += [
        (b + r"self_attn\.query_key_value\.weight",
         "language_model/layers_{0}/attn/Wqkv/kernel", _deint_w),
        (b + r"self_attn\.query_key_value\.bias",
         "language_model/layers_{0}/attn/Wqkv/bias", _deint_b),
        (b + r"self_attn\.dense\.weight",
         "language_model/layers_{0}/attn/out_proj/kernel", _t),
        (b + r"self_attn\.dense\.bias",
         "language_model/layers_{0}/attn/out_proj/bias", None),
        (b + r"self_attn\.q_layernorm\.weight",
         "language_model/layers_{0}/attn/q_ln/scale", None),
        (b + r"self_attn\.q_layernorm\.bias",
         "language_model/layers_{0}/attn/q_ln/bias", None),
        (b + r"self_attn\.k_layernorm\.weight",
         "language_model/layers_{0}/attn/k_ln/scale", None),
        (b + r"self_attn\.k_layernorm\.bias",
         "language_model/layers_{0}/attn/k_ln/bias", None),
        (b + r"mlp\.dense_h_to_4h\.weight",
         "language_model/layers_{0}/ffn/up_proj/kernel", _t),
        (b + r"mlp\.dense_h_to_4h\.bias",
         "language_model/layers_{0}/ffn/up_proj/bias", None),
        (b + r"mlp\.dense_4h_to_h\.weight",
         "language_model/layers_{0}/ffn/down_proj/kernel", _t),
        (b + r"mlp\.dense_4h_to_h\.bias",
         "language_model/layers_{0}/ffn/down_proj/bias", None),
        (b + r"input_layernorm\.weight",
         "language_model/layers_{0}/norm_1/scale", None),
        (b + r"input_layernorm\.bias",
         "language_model/layers_{0}/norm_1/bias", None),
        (b + r"post_attention_layernorm\.weight",
         "language_model/layers_{0}/norm_2/scale", None),
        (b + r"post_attention_layernorm\.bias",
         "language_model/layers_{0}/norm_2/bias", None),
    ]
    return [(re.compile(p + r"$"), tmpl, tr) for p, tmpl, tr in rules]


def _normalize_fuyu_key(name: str) -> str:
    """Accept both checkpoint vintages: adept/fuyu-8b files use
    `language_model.model.layers...` / `language_model.lm_head`, while
    post-refactor transformers state_dicts use `model.language_model.
    layers...` / top-level `lm_head` (HF remaps old files through
    `_checkpoint_conversion_mapping`). Normalize to the on-disk naming
    the rules target."""
    if name.startswith("model.language_model."):
        name = "language_model.model." + name[len("model.language_model."):]
    elif name.startswith("model.vision_embed_tokens."):
        name = name[len("model."):]
    elif name == "lm_head.weight":
        name = "language_model.lm_head.weight"
    return name


def fuyu_hf_to_flax(state_dict: Dict[str, np.ndarray], *, dtype=None,
                    strict: bool = False,
                    num_heads: int = 64) -> Dict[str, np.ndarray]:
    rules = fuyu_rules(num_heads)
    state_dict = {_normalize_fuyu_key(k): v for k, v in state_dict.items()}
    out, unmatched = {}, []
    for name, arr in state_dict.items():
        for pat, tmpl, tr in rules:
            m = pat.fullmatch(name)
            if m:
                val = tr(arr) if tr else np.asarray(arr)
                if dtype is not None:
                    val = val.astype(dtype)
                out[tmpl.format(*m.groups())] = val
                break
        else:
            unmatched.append(name)
    if strict and unmatched:
        raise KeyError(f"unmatched fuyu keys: {unmatched[:20]}")
    return out


def hf_to_flax(state_dict: Dict[str, np.ndarray], cfg: OtterConfig,
               *, wrapped: bool = True, dtype=None,
               strict: bool = False, rules=None) -> Dict[str, Any]:
    """HF state_dict -> flat flax param dict ('/'-separated paths).

    Checkpoints saved by the trainer contain only trainable params
    (`get_checkpoint`, train_utils.py:60-67) — non-strict mode converts
    whatever is present. `rules` overrides the Otter rule table (e.g.
    `idefics_rules(cfg)`).
    """
    rules = rules if rules is not None else otter_rules(cfg, wrapped)
    out: Dict[str, np.ndarray] = {}
    unmatched = []
    for name, arr in state_dict.items():
        hit = False
        for pat, tmpl, tr in rules:
            m = pat.fullmatch(name)
            if m:
                path = tmpl.format(*m.groups())
                val = tr(arr) if tr else np.asarray(arr)
                if dtype is not None:
                    val = val.astype(dtype)
                out[path] = val
                hit = True
                break
        if not hit:
            unmatched.append(name)
    if strict and unmatched:
        raise KeyError(f"unmatched checkpoint keys: {unmatched[:20]}"
                       f"{'...' if len(unmatched) > 20 else ''}")
    return out


def flax_to_hf(flat_params: Dict[str, np.ndarray], cfg: OtterConfig,
               *, wrapped: bool = True, rules=None) -> Dict[str, np.ndarray]:
    """Inverse mapping for HF-interop export (`save_hf_model` parity,
    train_utils.py:234-262). Round-trips through the same rule table."""
    rules = rules if rules is not None else otter_rules(cfg, wrapped)
    out: Dict[str, np.ndarray] = {}
    for path, arr in flat_params.items():
        arr = np.asarray(arr)
        for pat, tmpl, tr in rules:
            # invert the template into a matcher for the flax path
            tmpl_re = re.escape(tmpl).replace(r"\{0\}", r"(\d+)")
            m = re.fullmatch(tmpl_re, path)
            if m is None:
                continue
            hf_name = _expand_pattern(pat.pattern, m.groups())
            if tr is _t:
                arr_out = np.ascontiguousarray(arr.T)
            elif tr is _conv:
                arr_out = np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
            else:
                arr_out = arr
            out[hf_name] = arr_out
            break
    return out


def _expand_pattern(pattern: str, groups) -> str:
    """Turn a checkpoint-name regex back into a concrete name."""
    s = pattern[:-1] if pattern.endswith("$") else pattern
    for g in groups:
        s = s.replace(r"(\d+)", g, 1)
    s = s.replace(r"\.", ".")
    return s


def load_otter_checkpoint(path: str, cfg: OtterConfig, params: Dict,
                          *, dtype=None) -> Dict:
    """Load an HF Otter checkpoint into an existing param tree (partial
    update — mirrors `--trained_ckpt` partial load,
    instruction_following.py:438-443)."""
    from flax import traverse_util
    sd = load_state_dict(path)
    converted = hf_to_flax(sd, cfg, dtype=dtype)
    # accept either the bare param tree or the {"params": ...} variables dict
    wrapped_root = isinstance(params, dict) and set(params) == {"params"}
    tree = params["params"] if wrapped_root else params
    flat = dict(traverse_util.flatten_dict(tree, sep="/"))
    import jax.numpy as jnp
    n_loaded = 0
    for k, v in converted.items():
        if k not in flat:
            # LoRA-wrapped projections nest the frozen kernel under base/
            for alt in (k.replace("/kernel", "/base/kernel"),
                        k.replace("/bias", "/base/bias")):
                if alt in flat:
                    k = alt
                    break
        if k in flat:
            if tuple(flat[k].shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch for {k}: "
                                 f"{flat[k].shape} vs {v.shape}")
            flat[k] = jnp.asarray(v, flat[k].dtype)
            n_loaded += 1
    if n_loaded == 0:
        raise ValueError(
            f"checkpoint {path} matched 0 of {len(flat)} params "
            f"({len(converted)} converted keys) — wrong config/arch?")
    out = traverse_util.unflatten_dict(flat, sep="/")
    return {"params": out} if wrapped_root else out
