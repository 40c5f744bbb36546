"""Shared test fixtures: a deterministic fake tokenizer (HF-ish surface)
and a synthetic on-disk MIMIC-IT dataset matching OtterConfig.tiny."""

import base64
import io
import json

import numpy as np


class TinyTokenizer:
    """Maps words to ids < 200; special tokens match OtterConfig.tiny
    (media 253, eoc 252, answer 251)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    specials = {"<image>": 253, "<|endofchunk|>": 252, "<answer>": 251,
                "<PAD>": 0}

    def _tok(self, text):
        import re
        ids = []
        pattern = "(" + "|".join(map(re.escape, self.specials)) + ")"
        for part in re.split(pattern, text):
            if not part:
                continue
            if part in self.specials:
                ids.append(self.specials[part])
            else:
                ids.extend(hash(w) % 240 + 10 for w in part.split())
        return ids

    def __call__(self, text, add_special_tokens=False, truncation=True,
                 max_length=None, return_tensors=None):
        ids = self._tok(text)
        if max_length:
            ids = ids[:max_length]
        out = {"input_ids": ids, "attention_mask": [1] * len(ids)}
        if return_tensors == "np":
            out = {k: np.asarray([v]) for k, v in out.items()}
        return out

    def convert_tokens_to_ids(self, token):
        return self.specials.get(token, 9)

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.specials.items()}
        out = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and (i in inv or i in (0, 1, 2)):
                continue
            out.append(f"w{i}")
        return " ".join(out)


def write_mimicit_fixture(tmp_path, rng, n: int = 8, image_size: int = 28):
    """Writes instruction/images JSONs + data YAML; returns yaml path."""
    from PIL import Image
    import yaml

    images = {}
    for i in range(n):
        arr = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        images[f"IMG_{i}"] = base64.urlsafe_b64encode(
            buf.getvalue()).decode()
    data = {f"INS_{i}": {"instruction": f"describe item {i}",
                         "answer": f"item {i} is red",
                         "image_ids": [f"IMG_{i}"],
                         "rel_ins_ids": []} for i in range(n)}
    ins = tmp_path / "DC_instructions.json"
    img = tmp_path / "DC.json"
    ins.write_text(json.dumps({"data": data}))
    img.write_text(json.dumps(images))
    spec = {"IMAGE_TEXT": {"DC": {
        "mimicit_path": str(ins), "images_path": str(img),
        "num_samples": 0}}}
    ypath = tmp_path / "data.yaml"
    ypath.write_text(yaml.safe_dump(spec))
    return str(ypath)
