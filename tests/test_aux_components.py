"""Tests for auxiliary components: joint transforms, RLHF value head,
syphus/convert-it tooling, demo wrappers."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from helpers import TinyTokenizer


def _img(rng, h=40, w=60):
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def test_transforms_crop_boxes(rng):
    from otter_tpu.data.transforms import crop, hflip, resize
    img = _img(rng)
    target = {"boxes": np.asarray([[10, 5, 30, 25]], np.float32),
              "labels": np.asarray([1]),
              "area": np.asarray([400.0])}
    out, t = crop(img, target, (0, 0, 30, 40))
    assert out.size == (40, 30)
    np.testing.assert_allclose(t["boxes"][0], [10, 5, 30, 25])
    # crop that excludes the box entirely -> box deleted
    _, t2 = crop(img, target, (30, 35, 10, 20))
    assert len(t2["boxes"]) == 0 and len(t2["labels"]) == 0

    flipped, t3 = hflip(img, target)
    np.testing.assert_allclose(t3["boxes"][0], [60 - 30, 5, 60 - 10, 25])

    resized, t4 = resize(img, target, (20, 30))
    assert resized.size == (30, 20)
    np.testing.assert_allclose(t4["boxes"][0], [5, 2.5, 15, 12.5])


def test_transforms_pipeline(rng):
    from otter_tpu.data.transforms import (Compose, LargeScaleJitter,
                                           Normalize, RandomDistortion,
                                           ToArray)
    import random
    random.seed(0)
    pipeline = Compose([
        RandomDistortion(prob=1.0),
        LargeScaleJitter(output_size=32),
        ToArray(),
        Normalize([0.5] * 3, [0.5] * 3),
    ])
    target = {"boxes": np.asarray([[5, 5, 20, 20]], np.float32),
              "labels": np.asarray([0]), "area": np.asarray([225.0])}
    arr, t = pipeline(_img(rng), target)
    assert arr.shape == (3, 32, 32)


def test_value_head(rng):
    from otter_tpu.config import OtterConfig
    from otter_tpu.train.value_head import DecoderWithValueHead
    cfg = OtterConfig.tiny("mpt").text
    m = DecoderWithValueHead(cfg)
    ids = jnp.asarray(rng.integers(0, 200, (2, 8)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    logits, values = m.apply(params, ids)
    assert logits.shape == (2, 8, cfg.total_vocab)
    assert values.shape == (2, 8)


def test_syphus_generation(tmp_path):
    from otter_tpu.tools.syphus import (JsonAnnotationsDataset,
                                        generate_instructions,
                                        parse_qa_pairs)
    pairs = parse_qa_pairs(
        "instruction: What color?\nanswer: Red.\n"
        "instruction: How many?\nanswer: Three.")
    assert len(pairs) == 2 and pairs[1]["answer"] == "Three."

    prompt = {"system_message": "You generate QA pairs.",
              "in_context": [
                  {"role": "user", "content": "a dog in a park"},
                  {"role": "assistant", "content": [
                      {"instruction": "What animal?", "answer": "A dog"}]},
              ]}
    ppath = tmp_path / "prompt.json"
    ppath.write_text(json.dumps(prompt))
    qpath = tmp_path / "annotations.json"
    qpath.write_text(json.dumps({"V1": "a cat on a sofa"}))

    ds = JsonAnnotationsDataset("DC", str(ppath), str(qpath))
    assert "What animal?" in ds.prompt["in_context"][1]["content"]

    def fake_chat(messages):
        assert messages[0]["role"] == "system"
        return "instruction: What is shown?\nanswer: A cat."

    out = generate_instructions(ds, fake_chat, num_threads=1)
    assert len(out["data"]) == 1
    (key, val), = out["data"].items()
    assert val["answer"] == "A cat."
    assert val["image_ids"] == ["V1"]


def test_convert_it(tmp_path, rng):
    from otter_tpu.tools.convert_it import (convert_json_to_parquet,
                                            pack_image_folder, save_json)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        _img(rng, 16, 16).save(folder / f"img{i}.png")
    images = pack_image_folder(str(folder), prefix="T", resize_res=8)
    assert len(images) == 3 and "T_img0" in images
    jpath = save_json(images, str(tmp_path / "imgs.json"))
    ppath = convert_json_to_parquet(jpath, str(tmp_path / "imgs.parquet"))

    # loadable by the MimicitDataset ImageStore
    from otter_tpu.data.mimicit import ImageStore, decode_base64_image
    store = ImageStore()
    store.load(ppath)
    img = decode_base64_image(store.get("T_img0"))
    assert img.size == (8, 8)


def test_demo_model_tiny(rng):
    from otter_tpu import OtterConfig, OtterForConditionalGeneration
    from otter_tpu.demos.demo_models import TestOtter
    cfg = OtterConfig.tiny("mpt")
    model = OtterForConditionalGeneration(cfg, dtype=jnp.float32)
    demo = TestOtter(model=model, tok=TinyTokenizer(), patch_size=28,
                     max_new_tokens=3)
    out = demo.ask("what is this?", _img(rng, 28, 28))
    assert isinstance(out, str)


def test_device_image_prep_matches_pil(rng):
    """Device-side resize+normalize vs the PIL host reference."""
    from otter_tpu.data.mimicit import preprocess_image
    from otter_tpu.ops.image_prep import device_preprocess
    arrs = [(rng.random((180, 240, 3)) * 255).astype(np.uint8)
            for _ in range(3)]
    out = device_preprocess(arrs, size=64)
    refs = np.stack([preprocess_image(Image.fromarray(a), 64)
                     for a in arrs])
    diff = np.abs(np.asarray(out) - refs)
    # different antialias prefilters: compare loosely but meaningfully
    assert np.percentile(diff, 95) < 0.15, float(diff.max())
    assert np.corrcoef(np.asarray(out).ravel(), refs.ravel())[0, 1] > 0.99


@pytest.mark.slow
def test_inference_yaml_driver(tmp_path, rng):
    """YAML batch inference (demos/inference.py) over the tiny model."""
    import yaml
    from otter_tpu import OtterConfig, OtterForConditionalGeneration
    from otter_tpu.demos.demo_models import TestOtter
    from otter_tpu.demos.inference import run_cases

    img_path = tmp_path / "i.png"
    _img(rng, 28, 28).save(img_path)
    cases = [{"image": str(img_path),
              "questions": ["what is this?", "how many?"]},
             {"image": str(img_path), "question": "color?"}]

    cfg = OtterConfig.tiny("mpt")
    model = OtterForConditionalGeneration(cfg, dtype=jnp.float32)
    demo = TestOtter(model=model, tok=TinyTokenizer(), patch_size=28,
                     max_new_tokens=2)
    results = run_cases(demo, cases)
    assert len(results) == 3
    assert all("answer" in r and "question" in r for r in results)
