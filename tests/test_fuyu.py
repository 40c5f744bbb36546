"""Fuyu/OtterHD tests: patching geometry, token stream layout, label
masking, model forward with patch merge, cached decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from otter_tpu.config import FuyuConfig
from otter_tpu.data.fuyu_processor import FuyuImageProcessor, FuyuProcessor
from otter_tpu.models.decoder import init_cache
from otter_tpu.models.fuyu import FuyuVLM
from helpers import TinyTokenizer


class FuyuTok(TinyTokenizer):
    specials = dict(TinyTokenizer.specials)
    specials["\x04"] = 250


def _img(rng, h, w):
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def test_image_processor_geometry(rng):
    ip = FuyuImageProcessor(patch_size=10, buckets=((30, 30), (50, 60)))
    enc = ip.process(_img(rng, 28, 24))       # fits 30x30 -> pad to 30x30
    assert (enc["n_rows"], enc["n_cols"]) == (3, 3)
    assert enc["patches"].shape == (9, 300)
    enc = ip.process(_img(rng, 100, 100))     # downscale to fit 50x60
    assert enc["n_rows"] * 10 <= 50
    enc = ip.process(_img(rng, 33, 33), target_resolution=(20, 20))
    assert (enc["n_rows"], enc["n_cols"]) == (2, 2)


def test_processor_token_stream(rng):
    tok = FuyuTok()
    proc = FuyuProcessor(tok, FuyuImageProcessor(
        patch_size=10, buckets=((20, 30),)),
        image_placeholder_id=240, image_newline_id=241)
    s = proc.encode_sample("describe this", _img(rng, 20, 30))
    ids = s["input_ids"]
    # 2 rows x 3 cols: [ph ph ph nl] x 2 then bos + text
    assert list(ids[:4]) == [240, 240, 240, 241]
    assert list(ids[4:8]) == [240, 240, 240, 241]
    assert ids[8] == tok.bos_token_id
    idx = s["image_patches_indices"]
    assert list(idx[:4]) == [0, 1, 2, -1]
    assert (idx[8:] == -1).all()
    assert s["image_patches"].shape == (6, 300)


def test_processor_batched_and_labels(rng):
    tok = FuyuTok()
    proc = FuyuProcessor(tok, FuyuImageProcessor(
        patch_size=10, buckets=((20, 20),)),
        image_placeholder_id=240, image_newline_id=241)
    batch = proc(["User:q Assistant:\x04 a \x04",
                  "User:longer question Assistant:\x04 b \x04"],
                 [_img(rng, 20, 20), _img(rng, 15, 10)])
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    labels = proc.get_labels(batch["input_ids"])
    # span between first and second \x04 unmasked (incl. second)
    for i in range(2):
        row = batch["input_ids"][i]
        boa = np.nonzero(row == 250)[0]
        assert labels[i, boa[0] + 1] == row[boa[0] + 1]
        assert labels[i, boa[1]] == 250
        assert (labels[i, :boa[0] + 1] == -100).all()
    ids2, lab2 = proc.find_and_remove_tokens(batch["input_ids"], labels)
    for i in range(2):
        boa = np.nonzero(batch["input_ids"][i] == 250)[0]
        assert ids2[i, boa[-1]] == tok.eos_token_id


def test_fuyu_model_forward_and_merge(rng):
    cfg = FuyuConfig.tiny()
    model = FuyuVLM(cfg)
    b, s, p = 2, 20, 8
    pd = cfg.patch_size ** 2 * 3
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, :4] = cfg.image_placeholder_id
    indices = np.full((b, s), -1, np.int32)
    indices[:, :4] = np.arange(4)
    patches = rng.standard_normal((b, p, pd)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        image_patches=jnp.asarray(patches),
                        image_patches_indices=jnp.asarray(indices))
    logits, _ = model.apply(params, jnp.asarray(ids),
                            image_patches=jnp.asarray(patches),
                            image_patches_indices=jnp.asarray(indices))
    assert logits.shape == (b, s, cfg.text.total_vocab)
    # patch content must affect logits at/after the patch positions
    patches2 = patches.copy()
    patches2[:, 0] += 1.0
    logits2, _ = model.apply(params, jnp.asarray(ids),
                             image_patches=jnp.asarray(patches2),
                             image_patches_indices=jnp.asarray(indices))
    assert not np.allclose(logits[:, 0], logits2[:, 0], atol=1e-5)


def test_fuyu_cached_decode_matches_full(rng):
    cfg = FuyuConfig.tiny()
    model = FuyuVLM(cfg)
    b, s, p = 1, 12, 4
    pd = cfg.patch_size ** 2 * 3
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, :2] = cfg.image_placeholder_id
    indices = np.full((b, s), -1, np.int32)
    indices[:, :2] = [0, 1]
    patches = rng.standard_normal((b, p, pd)).astype(np.float32)
    args = dict(image_patches=jnp.asarray(patches),
                image_patches_indices=jnp.asarray(indices))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), **args)

    ext = np.asarray(rng.integers(5, 200, (b, 3)), np.int32)
    full_ids = np.concatenate([ids, ext], 1)
    full_idx = np.concatenate([indices, np.full((b, 3), -1, np.int32)], 1)
    full_logits, _ = model.apply(
        params, jnp.asarray(full_ids), image_patches=jnp.asarray(patches),
        image_patches_indices=jnp.asarray(full_idx))

    max_len = 16
    cache = init_cache(cfg.text, b, max_len, jnp.float32)
    _, cache = model.apply(params, jnp.asarray(ids), cache=cache, **args)
    pos = s
    for t in range(3):
        kv_valid = jnp.arange(max_len)[None] <= pos
        logits, cache = model.apply(
            params, jnp.asarray(ext[:, t:t + 1]), cache=cache,
            cache_pos=pos, kv_valid=kv_valid,
            positions=jnp.full((b, 1), pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, pos]),
                                   atol=3e-4, rtol=3e-4)
        pos += 1


def test_box_postprocessing():
    proc = FuyuProcessor(FuyuTok())
    out = proc.post_process_box_coordinates(
        "the cat is at <box>10, 20, 30, 40</box> and <point>5, 6</point>")
    assert "<box>20, 40, 60, 80</box>" in out
    assert "<point>10, 12</point>" in out
