"""Webdataset pipeline tests: brace expansion, tar grouping, sharding
arithmetic (the reference's only dataloader unit test,
unit_tests/test_mmc4_dataset.py, tested exactly this), interleaved
preprocessing semantics, label policies, and an end-to-end pretrain step."""

import base64
import io
import json
import os
import tarfile
import types

import numpy as np
import pytest
from PIL import Image

from helpers import TinyTokenizer
from otter_tpu.data.webdataset import (ShardPipeline, braceexpand,
                                       get_mmc4_dataset,
                                       make_interleaved_preprocessor,
                                       make_pair_preprocessor, tar_samples)
from otter_tpu.train.pretrain import interleaved_labels, pair_labels


def _png_bytes(rng, size=32, big=False):
    n = 256 if big else size
    arr = (rng.random((n, n, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    data = buf.getvalue()
    if big and len(data) < 11000:   # ensure > MIN_KB for the mmc4 filter
        arr = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        data = buf.getvalue()
    return data


def _write_pair_shard(path, rng, n=6):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = _png_bytes(rng)
            txt = f"caption number {i}".encode()
            for ext, data in (("jpg", img), ("txt", txt)):
                info = tarfile.TarInfo(f"{i:05d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_braceexpand():
    assert braceexpand("s-{00..02}.tar") == ["s-00.tar", "s-01.tar",
                                             "s-02.tar"]
    assert set(braceexpand("{a,b}/x{1..2}")) == {"a/x1", "a/x2", "b/x1",
                                                 "b/x2"}


def test_tar_samples_and_pair_pipeline(tmp_path, rng):
    shard = str(tmp_path / "pairs.tar")
    _write_pair_shard(shard, rng, n=6)
    samples = list(tar_samples(shard))
    assert len(samples) == 6
    assert set(samples[0]) == {"__key__", "jpg", "txt"}

    tok = TinyTokenizer()
    pipe = ShardPipeline([shard], make_pair_preprocessor(tok, patch_size=16),
                         batch_size=2, shuffle_buffer=4)
    batches = list(pipe)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 1, 1, 3, 16, 16)
    assert b["input_ids"].shape == (2, 32)


def test_interleaved_preprocessing(rng):
    tok = TinyTokenizer()
    doc = {
        "text_list": ["intro text", "about the first image",
                      "about the second image", "trailing"],
        "image_info": [
            {"image_base64": base64.b64encode(
                _png_bytes(rng, big=True)).decode(),
             "matched_sim": 0.5, "matched_text_index": 1},
            {"image_base64": base64.b64encode(
                _png_bytes(rng, big=True)).decode(),
             "matched_sim": 0.1, "matched_text_index": 2},  # below threshold
        ],
    }
    fn = make_interleaved_preprocessor(
        tok, media_token_id=253, patch_size=16, sim_threshold=0.24,
        single_image_drop=0.0)
    images, ids, mask = fn({"json": json.dumps(doc).encode()})
    assert images.shape == (5, 1, 3, 16, 16)          # padded to 5
    assert (ids == 253).sum() == 1                    # one surviving image
    assert (np.abs(images[1:]) < 1e-9).all()          # padding zeros


def test_mmc4_arithmetic(tmp_path, rng):
    """num_batches/num_samples arithmetic — the reference's
    test_mmc4_dataset.py behavior (batch 10, world 1, 1000 samples)."""
    shard = str(tmp_path / "x.tar")
    _write_pair_shard(shard, rng, n=1)
    args = types.SimpleNamespace(
        mmc4_shards=shard, batch_size_mmc4=10, train_num_samples_mmc4=1000,
        seed=0, rank=0, world_size=1, workers=1,
        mmc4_textsim_threshold=0.24, media_token_id=253,
        dataset_resampled=False)
    info = get_mmc4_dataset(args, TinyTokenizer())
    assert info.num_batches == 100
    assert info.num_samples == 1000


def test_label_policies():
    # ids: [bos, <image>, w, w, <eoc>, w, <image>, w, pad]
    M, E, P = 253, 252, 0
    ids = np.asarray([[1, M, 11, 12, E, 13, M, 14, P]])
    lab = pair_labels(ids, P, M)
    assert lab[0, 0] == -100 and lab[0, 1] == -100 and lab[0, 8] == -100
    assert lab[0, 2] == 11 and lab[0, 5] == 13

    lab = interleaved_labels(ids, P, M, E)
    # before first image masked; text after eoc until next image masked
    assert lab[0, 0] == -100
    assert lab[0, 2] == 11 and lab[0, 3] == 12 and lab[0, 4] == E
    assert lab[0, 5] == -100      # between <eoc> and next <image>
    assert lab[0, 7] == 14


@pytest.mark.slow
def test_pretrain_step_tiny(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.train.pretrain import make_pretrain_step
    from otter_tpu.train.step import TrainState, make_optimizer, split_params

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    b, s = 2, 16
    vx = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 1] = cfg.media_token_id
    labels = pair_labels(ids, 0, cfg.media_token_id)
    batch = {"vision_x": vx, "input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((b, s), jnp.int32),
             "labels": jnp.asarray(labels)}
    params = model.init(jax.random.PRNGKey(0), vx, jnp.asarray(ids))[
        "params"]
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
    state = TrainState.create(params, cfg, tx)
    step = jax.jit(make_pretrain_step(model, cfg, tx),
                   static_argnames=("attend_prev",))
    state, metrics = step(state, batch, batch, attend_prev=True)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_laion" in metrics and "loss_mmc4" in metrics


def test_parallel_shard_reading(tmp_path, rng):
    """Multiple shards read concurrently yield every sample exactly once."""
    from helpers import TinyTokenizer
    shards = []
    for s in range(4):
        path = str(tmp_path / f"p{s}.tar")
        _write_pair_shard(path, rng, n=5)
        shards.append(path)
    pipe = ShardPipeline(
        shards, make_pair_preprocessor(TinyTokenizer(), patch_size=16),
        batch_size=4, shuffle_buffer=8, num_parallel_shards=4)
    batches = list(pipe)
    total = sum(b["input_ids"].shape[0] for b in batches)
    assert total == 20  # 4 shards x 5 samples, drop_last with batch 4


def test_native_deferred_decode_matches_pil(tmp_path, rng):
    """native="auto"/True defers JPEG decode to collate time through the
    C++ batch decoder; the resulting batches must match the per-sample
    PIL path (r3: native decode wired into LAION/MMC4 pipelines)."""
    from otter_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    shard = str(tmp_path / "s-000000.tar")
    _write_pair_shard(shard, rng, n=6)
    tok = TinyTokenizer()

    def run(native_flag):
        pipe = ShardPipeline(
            [shard],
            make_pair_preprocessor(tok, patch_size=16, native=native_flag),
            batch_size=3, shuffle_buffer=0, num_parallel_shards=1)
        return list(pipe)

    a, b = run(False), run(True)
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        assert bb["images"].shape == ba["images"].shape
        # PIL's fixed-point resampler vs the native float path differ by
        # a few u8 LSBs (same bound as tests/test_native_preproc.py)
        diff = np.abs(ba["images"] - bb["images"])
        assert np.percentile(diff, 99) < 4 / 255 / 0.26, \
            np.percentile(diff, 99)
        np.testing.assert_array_equal(ba["input_ids"], bb["input_ids"])
