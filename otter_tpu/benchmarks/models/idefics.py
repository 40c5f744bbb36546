"""IDEFICS benchmark adapter (reference
`pipeline/benchmarks/models/idefics.py`): prompt contract
`User:<fake_token_around_image><image><fake_token_around_image>{q}
<end_of_utterance>\\nAssistant:`, answer split on
<answer>/<end_of_utterance>."""

from __future__ import annotations

from typing import Optional

import numpy as np

from otter_tpu.data.templates import (IDEFICS_STANDARD_MEAN,
                                      IDEFICS_STANDARD_STD,
                                      inference_prompt)


class Idefics:
    def __init__(self, model_path: str = "", *, tokenizer: str = "",
                 max_new_tokens: int = 512, model=None, tok=None,
                 cfg=None, params=None, patch_size: int = 224):
        """model/tok/cfg/params may be injected directly (tests); otherwise
        loaded from an HF IdeficsForVisionText2Text checkpoint dir."""
        self.name = "idefics"
        self.max_new_tokens = max_new_tokens
        self.patch_size = patch_size
        if model is not None:
            self.model, self.tokenizer, self.cfg = model, tok, cfg
            self.params = params
        else:
            import jax
            import jax.numpy as jnp
            from flax import traverse_util
            from transformers import AutoTokenizer
            from otter_tpu.config import idefics9b
            from otter_tpu.models.convert import (hf_to_flax, idefics_rules,
                                                  load_state_dict)
            from otter_tpu.models.idefics import IdeficsVLM
            self.cfg = cfg or idefics9b()
            self.model = IdeficsVLM(self.cfg, dtype=jnp.bfloat16)
            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer
                                                           or model_path)
            sd = load_state_dict(model_path)
            flat = hf_to_flax(sd, self.cfg, rules=idefics_rules(self.cfg),
                              dtype=np.float32)
            self.params = {"params": traverse_util.unflatten_dict(
                flat, sep="/")}
        self._engine = None

    def _get_engine(self):
        if self._engine is None:
            import jax.numpy as jnp
            from otter_tpu.generation.engine import OtterGenerator
            if self.params is None:
                raise ValueError("no params loaded")
            self._engine = OtterGenerator(self.model, self.params, self.cfg,
                                          cache_dtype=jnp.bfloat16)
        return self._engine

    def _vision(self, raw_image_data) -> np.ndarray:
        from otter_tpu.data.mimicit import preprocess_image
        if raw_image_data is None:
            return np.zeros((1, 1, 3, self.patch_size, self.patch_size),
                            np.float32)
        img = raw_image_data
        if isinstance(img, (bytes, str)):
            from otter_tpu.data.mimicit import decode_base64_image
            img = decode_base64_image(img if isinstance(img, str)
                                      else img.decode())
        arr = preprocess_image(img.convert("RGB"), self.patch_size,
                               IDEFICS_STANDARD_MEAN, IDEFICS_STANDARD_STD)
        return arr[None, None]                 # [1, N=1, C, H, W]

    def _prompt(self, question: str, with_image: bool) -> str:
        placeholder = ("<fake_token_around_image><image>"
                       "<fake_token_around_image>" if with_image else "")
        return (f"User:{placeholder}{question}<end_of_utterance>\n"
                f"Assistant:")

    def generate(self, question: str, raw_image_data=None) -> str:
        import jax.numpy as jnp
        from otter_tpu.config import GenerationConfig
        vision_x = self._vision(raw_image_data)
        prompt = self._prompt(question, raw_image_data is not None)
        ids = self.tokenizer(prompt, return_tensors="np")[
            "input_ids"].astype(np.int32)
        eng = self._get_engine()
        out = eng.generate(
            jnp.asarray(vision_x), ids,
            gen=GenerationConfig(max_new_tokens=self.max_new_tokens,
                                 eos_token_id=self.cfg.eoc_token_id))
        text = self.tokenizer.decode(out[0, ids.shape[1]:])
        text = text.split("<answer>")[-1]
        for stop in ("<end_of_utterance>", "</s>"):
            text = text.split(stop)[0]
        return text.strip().strip('"')

    def generate_batch(self, prompts, raw_images) -> list:
        """Batched generate for the public eval suite: FULL prompt strings
        (few-shot context included), left-padded into one batch (the
        reference batches idefics eval via eval_model.py:21-60)."""
        import jax.numpy as jnp
        from otter_tpu.config import GenerationConfig
        vision = np.concatenate([self._vision(im) for im in raw_images], 0)
        encs = [self.tokenizer(p, return_tensors="np")["input_ids"][0]
                .astype(np.int32) for p in prompts]
        width = max(len(e) for e in encs)
        ids = np.zeros((len(encs), width), np.int32)
        mask = np.zeros((len(encs), width), np.int32)
        for i, e in enumerate(encs):
            ids[i, width - len(e):] = e
            mask[i, width - len(e):] = 1
        eng = self._get_engine()
        out = eng.generate(
            jnp.asarray(vision), jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            gen=GenerationConfig(max_new_tokens=self.max_new_tokens,
                                 eos_token_id=self.cfg.eoc_token_id))
        texts = []
        for row in np.asarray(out[:, width:]):
            text = self.tokenizer.decode(row)
            text = text.split("<answer>")[-1]
            for stop in ("<end_of_utterance>", "</s>"):
                text = text.split(stop)[0]
            texts.append(text.strip().strip('"'))
        return texts

    def eval_forward(self, question: str, answer: str, image=None) -> float:
        import jax
        import jax.numpy as jnp
        vision_x = self._vision(image)
        prompt = self._prompt(question, image is not None)
        full = prompt + answer
        ids = self.tokenizer(full, return_tensors="np")[
            "input_ids"].astype(np.int32)
        p_len = self.tokenizer(prompt, return_tensors="np")[
            "input_ids"].shape[1]
        logits, _, _ = self.model.apply(
            self.params, jnp.asarray(vision_x), jnp.asarray(ids))
        lp = np.asarray(jax.nn.log_softmax(
            logits[0, p_len - 1: -1].astype(jnp.float32), axis=-1))
        toks = ids[0, p_len:]
        return float(lp[np.arange(len(toks)), toks].sum())
