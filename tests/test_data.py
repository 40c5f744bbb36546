"""Data-pipeline tests over a synthetic on-disk MIMIC-IT fixture: templates,
dataset loading, video frame resampling, collation, label masking, YAML
validation (the reference's prerun gate), loader arithmetic."""

import base64
import io
import json
import os

import numpy as np
import pytest

from otter_tpu.data import (MimicitDataset, MimicitLoader, MimicitTask,
                            WeightedMultiLoader, mask_answer_labels,
                            find_and_remove_tokens, validate_spec,
                            verify_yaml, DataSpecError)
from otter_tpu.data import templates


class FakeTokenizer:
    """Whitespace tokenizer with HF-ish surface for tests."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False, truncation=True,
                 max_length=None):
        ids = [hash(w) % 1000 + 10 for w in text.split()]
        if max_length:
            ids = ids[:max_length]
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}


def _png_b64(rng, size=8):
    from PIL import Image
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode()


@pytest.fixture
def mimicit_fixture(tmp_path, rng):
    images = {f"IMG_{i}": _png_b64(rng) for i in range(6)}
    data = {
        f"INS_{i}": {
            "instruction": f"what is in image {i}?",
            "answer": f"object {i}",
            "image_ids": [f"IMG_{i}"],
            "rel_ins_ids": [f"INS_{(i + 1) % 3}"] if i < 3 else [],
        } for i in range(6)
    }
    ins_path = tmp_path / "DC_instructions.json"
    img_path = tmp_path / "DC.json"
    ins_path.write_text(json.dumps({"data": data}))
    img_path.write_text(json.dumps(
        {k: {"base64": v} for k, v in images.items()}))
    return str(ins_path), str(img_path), tmp_path


def test_templates():
    t = templates.format_pair("what?", "cat", "simple", insert_image=True)
    assert t == "<image>User:what? GPT:<answer>cat<|endofchunk|>"
    t2 = templates.format_pair("q", "a", "llama2", insert_image=True)
    assert t2.startswith("[INST]<image>\n") and t2.endswith("<|endofchunk|>")
    assert "\x04" in templates.format_pair("q", "a", "fuyu")


def test_dataset_image_text(mimicit_fixture):
    ins, img, _ = mimicit_fixture
    ds = MimicitDataset(
        [MimicitTask("DC", ins, img)], FakeTokenizer(),
        task_group="IMAGE_TEXT", patch_image_size=16)
    assert len(ds) == 6
    ex = ds[0]
    assert ex["input_ids"][0] == 1 and ex["input_ids"][-1] == 2
    assert ex["patch_images"].shape == (1, 1, 3, 16, 16)
    assert "<image>User:" in ex["full_text"]

    batch = ds.collate([ds[0], ds[1]], pad_to_multiple=8)
    assert batch["net_input"]["input_ids"].shape[1] % 8 == 0
    assert batch["net_input"]["patch_images"].shape[:3] == (2, 1, 1)


def test_dataset_video_resampling(mimicit_fixture):
    ins, img, tmp = mimicit_fixture
    data = {"V_0": {"instruction": "desc", "answer": "a video",
                    "image_ids": [f"IMG_{i}" for i in range(6)]}}
    vpath = tmp / "video_instructions.json"
    vpath.write_text(json.dumps({"data": data}))
    ds = MimicitDataset(
        [MimicitTask("VID", str(vpath), img)], FakeTokenizer(),
        task_group="VIDEO_TEXT", patch_image_size=16, resample_frames_to=4)
    ex = ds[0]
    assert ex["patch_images"].shape == (1, 4, 3, 16, 16)


def test_in_context_examples(mimicit_fixture):
    ins, img, _ = mimicit_fixture
    ds = MimicitDataset(
        [MimicitTask("DC", ins, img)], FakeTokenizer(),
        task_group="IMAGE_TEXT_IN_CONTEXT", patch_image_size=16,
        populate_rel_ins=True)
    ex = ds[0]  # INS_0 has rel_ins INS_1 -> two pairs, two images
    assert ex["full_text"].count("<answer>") == 2
    assert ex["full_text"].count("<image>") == 2


def test_mask_answer_labels():
    # ids:     bos  q   <ans> a1  a2 <eoc>  q2  <ans> a3 <eoc> eos
    ANS, EOC, EOS = 90, 91, 2
    ids = np.asarray([[1, 11, ANS, 21, 22, EOC, 12, ANS, 23, EOC, EOS]])
    labels = mask_answer_labels(ids, answer_token_id=ANS, eoc_token_id=EOC,
                                eos_token_id=EOS)
    exp = np.asarray([[-100, -100, -100, 21, 22, EOC, -100, -100, 23, EOC,
                       EOS]])
    np.testing.assert_array_equal(labels, exp)


def test_find_and_remove_tokens():
    ids = np.asarray([[1, 5, 90, 6, 2]])
    labels = np.asarray([[-100, -100, -100, 6, 2]])
    mask = np.ones_like(ids)
    out_ids, out_lab, out_mask = find_and_remove_tokens(
        ids, labels, mask, 90, pad_id=0)
    np.testing.assert_array_equal(out_ids, [[1, 5, 6, 2, 0]])
    np.testing.assert_array_equal(out_lab, [[-100, -100, 6, 2, -100]])
    np.testing.assert_array_equal(out_mask, [[1, 1, 1, 1, 0]])


def test_yaml_validation(mimicit_fixture, tmp_path):
    ins, img, _ = mimicit_fixture
    good = {"IMAGE_TEXT": {"DC": {"mimicit_path": ins, "images_path": img,
                                  "num_samples": 0}}}
    assert validate_spec(good) == []
    bad = {"IMAGE_TEXT": {"DC": {"mimicit_path": "/nonexistent.json"}},
           "BOGUS_GROUP": {}}
    problems = validate_spec(bad)
    assert len(problems) == 2

    import yaml as _yaml
    yml = tmp_path / "data.yaml"
    yml.write_text(_yaml.safe_dump(good))
    verify_yaml(str(yml))  # should not raise
    yml.write_text(_yaml.safe_dump(bad))
    with pytest.raises(DataSpecError):
        verify_yaml(str(yml))


def test_loader_sharding_and_weights(mimicit_fixture):
    ins, img, _ = mimicit_fixture
    ds = MimicitDataset([MimicitTask("DC", ins, img)], FakeTokenizer(),
                        task_group="IMAGE_TEXT", patch_image_size=16)
    # world of 2: each rank sees 3 samples -> 1 batch of 2 (drop_last)
    l0 = MimicitLoader(ds, 2, rank=0, world_size=2, num_workers=2,
                       pad_to_multiple=8)
    assert len(l0) == 1
    batches = list(l0)
    assert len(batches) == 1
    assert batches[0]["net_input"]["input_ids"].shape[0] == 2

    multi = WeightedMultiLoader([MimicitLoader(ds, 2, num_workers=2)])
    assert len(list(multi)) == len(multi)


def test_device_preprocess_split(mimicit_fixture):
    """device_preprocess=True: the host emits uint8 HWC at patch size and
    the model's device-side normalize reproduces the float pipeline."""
    import jax
    import jax.numpy as jnp
    from otter_tpu.ops.image_prep import normalize_u8

    ins, img, _ = mimicit_fixture
    ds_f = MimicitDataset([MimicitTask("DC", ins, img)], FakeTokenizer(),
                          task_group="IMAGE_TEXT", patch_image_size=16)
    ds_u8 = MimicitDataset([MimicitTask("DC", ins, img)], FakeTokenizer(),
                           task_group="IMAGE_TEXT", patch_image_size=16,
                           device_preprocess=True)
    ex_u = ds_u8[0]
    assert ex_u["patch_images"].dtype == np.uint8
    assert ex_u["patch_images"].shape == (1, 1, 16, 16, 3)
    got = np.asarray(normalize_u8(jnp.asarray(ex_u["patch_images"])))
    # like-for-like reference: PIL resize + host float normalize (the
    # float path may route through the native C++ resizer, whose bicubic
    # differs from PIL's by a few ULPs of a pixel)
    from otter_tpu.data.mimicit import decode_base64_image, preprocess_image
    iid = ds_f.dataset[ds_f.train_data_list[0]]["image_ids"][0]
    ref = preprocess_image(decode_base64_image(ds_f.images.get(iid)), 16)
    np.testing.assert_allclose(got[0, 0], ref, atol=1e-5)

    # collate keeps uint8 (3x less host->device traffic)
    batch = ds_u8.collate([ds_u8[0], ds_u8[1]])
    assert batch["net_input"]["patch_images"].dtype == np.uint8


def test_model_accepts_uint8_vision(mimicit_fixture):
    """OtterVLM normalizes uint8 vision input on device; logits match the
    host-normalized float path."""
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.ops.image_prep import normalize_u8

    rng = np.random.default_rng(0)
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    u8 = rng.integers(0, 256, (1, 1, 1, 28, 28, 3)).astype(np.uint8)
    vx_f = np.asarray(normalize_u8(jnp.asarray(u8)))
    ids = np.asarray(rng.integers(5, 200, (1, 8)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(vx_f),
                        jnp.asarray(ids))
    lf, _, _ = model.apply(params, jnp.asarray(vx_f), jnp.asarray(ids))
    lu, _, _ = model.apply(params, jnp.asarray(u8), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf), atol=1e-5)
