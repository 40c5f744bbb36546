"""Fuyu/OtterHD benchmark adapter (reference
`pipeline/benchmarks/models/fuyu.py` / `models/otterhd.py`): prompt
`User:{q} Assistant:\\x04`, variable-resolution patches, answer after the
beginning-of-answer token."""

from __future__ import annotations

from typing import Optional

import numpy as np


class Fuyu:
    def __init__(self, model_path: str = "", *, tokenizer: str = "",
                 max_new_tokens: int = 256, resolution=None,
                 model=None, tok=None, processor=None, cfg=None):
        self.name = "fuyu"
        self.max_new_tokens = max_new_tokens
        self.resolution = resolution
        if model is not None:
            self.model, self.tokenizer = model, tok
            self.processor = processor
            self.cfg = cfg
        else:
            import jax
            import jax.numpy as jnp
            from flax import traverse_util
            from transformers import AutoTokenizer
            from otter_tpu.config import FuyuConfig
            from otter_tpu.data.fuyu_processor import (FuyuImageProcessor,
                                                       FuyuProcessor)
            from otter_tpu.models.convert import (fuyu_hf_to_flax,
                                                  load_state_dict)
            from otter_tpu.models.fuyu import FuyuVLM
            self.cfg = FuyuConfig()
            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer)
            self.processor = FuyuProcessor(
                self.tokenizer,
                FuyuImageProcessor(patch_size=self.cfg.patch_size),
                image_placeholder_id=self.cfg.image_placeholder_id,
                image_newline_id=self.cfg.image_newline_id)
            self.model = FuyuVLM(self.cfg, dtype=jnp.bfloat16)
            converted = fuyu_hf_to_flax(load_state_dict(model_path),
                                        dtype=jnp.bfloat16)
            self._params = {"params": traverse_util.unflatten_dict(
                {k: jnp.asarray(v) for k, v in converted.items()},
                sep="/")}

    def generate(self, question: str, raw_image_data=None) -> str:
        from otter_tpu.data.templates import inference_prompt
        import jax.numpy as jnp
        from otter_tpu.config import GenerationConfig
        prompt = inference_prompt(question, "fuyu")
        batch = self.processor([prompt], [raw_image_data],
                               target_resolution=self.resolution,
                               left_pad=True)
        logits_fn = self._decode_greedy
        return logits_fn(batch)

    def _decode_greedy(self, batch) -> str:
        """Greedy decode via cached engine-style loop on the FuyuVLM."""
        import jax.numpy as jnp
        from otter_tpu.models.decoder import init_cache
        ids = jnp.asarray(batch["input_ids"])
        b, s = ids.shape
        max_len = -(-(s + self.max_new_tokens) // 128) * 128
        cache = init_cache(self.cfg.text, b, max_len, jnp.bfloat16)
        positions = jnp.clip(jnp.cumsum(jnp.asarray(
            batch["attention_mask"]), -1) - 1, 0, None)
        logits, cache = self.model.apply(
            self.params, ids,
            image_patches=jnp.asarray(batch["image_patches"]),
            image_patches_indices=jnp.asarray(
                batch["image_patches_indices"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            positions=positions, cache=cache)
        real_len = int(batch["attention_mask"].sum())
        out_ids = []
        tok = int(jnp.argmax(logits[0, -1]))
        kv_valid = jnp.asarray(batch["attention_mask"]).astype(bool)
        kv_valid = jnp.concatenate(
            [kv_valid, jnp.zeros((b, max_len - s), bool)], -1)
        eos = self.tokenizer.eos_token_id
        for t in range(self.max_new_tokens):
            if tok == eos:
                break
            out_ids.append(tok)
            kv_valid = kv_valid | (jnp.arange(max_len)[None] == s + t)
            logits, cache = self.model.apply(
                self.params, jnp.full((b, 1), tok, jnp.int32),
                cache=cache, cache_pos=s + t, kv_valid=kv_valid,
                positions=jnp.full((b, 1), real_len + t, jnp.int32))
            tok = int(jnp.argmax(logits[0, -1]))
        return self.tokenizer.decode(out_ids,
                                     skip_special_tokens=True).strip()

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, v):
        self._params = v

    def eval_forward(self, question: str, answer: str, image=None) -> float:
        """Mean log-likelihood of `answer` after the boa token."""
        import jax.numpy as jnp
        from otter_tpu.data.templates import inference_prompt
        from otter_tpu.train.step import causal_lm_loss
        prompt = inference_prompt(question, "fuyu")
        batch = self.processor([prompt + " " + answer], [image],
                               target_resolution=self.resolution)
        # unmask everything after the (single) beginning-of-answer token
        ids = batch["input_ids"]
        labels = np.full_like(ids, -100)
        boa = self.processor.boa_id()
        for i in range(ids.shape[0]):
            pos = np.nonzero(ids[i] == boa)[0]
            if len(pos):
                labels[i, pos[0] + 1:] = ids[i, pos[0] + 1:]
        labels[ids == self.tokenizer.eos_token_id] = -100
        logits, _ = self.model.apply(
            self.params, jnp.asarray(batch["input_ids"]),
            image_patches=jnp.asarray(batch["image_patches"]),
            image_patches_indices=jnp.asarray(
                batch["image_patches_indices"]),
            attention_mask=jnp.asarray(batch["attention_mask"]))
        loss, _ = causal_lm_loss(logits, jnp.asarray(labels))
        return -float(loss)


class OtterHD(Fuyu):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.name = "otterhd"
