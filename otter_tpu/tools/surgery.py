"""Checkpoint surgery: build Otter/Flamingo trees from separate sources,
apply delta weights, merge LoRA, downcast.

Rebuild of the reference's conversion scripts (SURVEY.md §2 C1):
  - injecting_{mpt,llama2,vicuna,falcon,mpt-1B}_into_flamingo.py:28-60 ->
    `inject_lm_into_flamingo` (base LM state dict + OpenFlamingo
    perceiver/xattn weights -> one Otter tree)
  - converting_otter_pt_to_hf.py:14-33 -> CheckpointStore.export_hf
  - pipeline/utils/apply_delta.py:12 -> `apply_delta`
  - fp32->fp16/bf16 downcast -> parallel.precision.cast_params
  - LoRA merge -> `merge_lora`
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
from flax import traverse_util


def inject_lm_into_flamingo(lm_state: Dict[str, np.ndarray],
                            flamingo_state: Dict[str, np.ndarray],
                            cfg, *, lm_prefix: str = "lang_encoder."
                            ) -> Dict[str, np.ndarray]:
    """Merge a bare LM checkpoint (HF names WITHOUT the lang_encoder/
    OtterLayer wrapping) with OpenFlamingo perceiver/xattn/vision weights
    into one flax param dict.

    The LM's `transformer.blocks.N.x` names are rewritten to the wrapped
    `transformer.blocks.N.decoder_layer.x` form init_otter produces
    (injecting_mpt_into_flamingo.py:28-60 renames in the other direction).
    """
    import re
    from otter_tpu.models.convert import hf_to_flax

    merged = {}
    for k, v in lm_state.items():
        k = lm_prefix + k
        # wrap decoder layers: blocks.N.attn -> blocks.N.decoder_layer.attn
        k = re.sub(r"(\.(?:blocks|layers|h)\.\d+\.)(?!decoder_layer|"
                   r"gated_cross_attn_layer)", r"\1decoder_layer.", k)
        merged[k] = v
    merged.update(flamingo_state)
    return hf_to_flax(merged, cfg)


def apply_delta(base: Dict[str, np.ndarray], delta: Dict[str, np.ndarray],
                *, subtract: bool = False) -> Dict[str, np.ndarray]:
    """target = base + delta (or extract delta with subtract=True) —
    apply_delta.py:12 behavior. Keys only in one dict pass through."""
    out = dict(delta if not subtract else base)
    for k, b in base.items():
        if k in delta:
            d = np.asarray(delta[k])
            b = np.asarray(b)
            if b.shape != d.shape:
                raise ValueError(f"shape mismatch for {k}")
            out[k] = (d - b) if subtract else (b + d)
    return out


def merge_lora(params: Any) -> Any:
    """Fold lora_a/lora_b adapters into the base kernels and drop them
    (the peft merge used before HF export)."""
    flat = dict(traverse_util.flatten_dict(params, sep="/"))
    out = {}
    for k, v in flat.items():
        if k.endswith("lora_a") or k.endswith("lora_b"):
            continue
        out[k] = v
    for k in list(flat):
        if not k.endswith("lora_a"):
            continue
        prefix = k[: -len("lora_a")]
        a = np.asarray(flat[k], np.float32)
        b = np.asarray(flat[prefix + "lora_b"], np.float32)
        rank = a.shape[1]
        # alpha defaults to 16 in the config; scale = alpha / rank
        scale = 16.0 / rank
        base_key = prefix + "base/kernel"
        if base_key in out:
            w = np.asarray(out[base_key], np.float32)
            out[base_key] = (w + a @ b * scale).astype(flat[base_key].dtype)
    return traverse_util.unflatten_dict(out, sep="/")
