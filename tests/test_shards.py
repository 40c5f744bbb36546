"""Shard-prep tools (tools/shards.py): writer rollover, MMC4 and
LAION-TSV conversions round-tripped through the actual pretraining
pipelines, make_a_train dedup semantics."""

import base64
import io
import json
import os
import tarfile

import numpy as np
from PIL import Image

from helpers import TinyTokenizer
from otter_tpu.data.webdataset import (ShardPipeline,
                                       make_interleaved_preprocessor,
                                       make_pair_preprocessor, tar_samples)
from otter_tpu.tools.shards import (ShardWriter, convert_laion_tsv_to_wds,
                                    convert_mmc4_to_wds, make_a_train)


def _png(rng, n=32):
    arr = (rng.random((n, n, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def test_shard_writer_rollover(tmp_path, rng):
    out = tmp_path / "wds"
    with ShardWriter(str(out), maxcount=2) as w:
        for i in range(5):
            w.write({"__key__": f"k{i}", "txt": f"c{i}",
                     "png": _png(rng)})
    assert len(w.shards_written) == 3
    total = sum(len(list(tar_samples(p))) for p in w.shards_written)
    assert total == 5
    s = next(iter(tar_samples(w.shards_written[0])))
    assert set(s) == {"__key__", "txt", "png"}


def test_convert_mmc4_roundtrip(tmp_path, rng):
    # fabricate the MMC4 distribution layout: images tar (members under a
    # shard-name dir) + docs jsonl
    img_tar = tmp_path / "shard_0_images_v2.tar"
    with tarfile.open(img_tar, "w") as tf:
        for name in ("a.jpg", "b.jpg"):
            data = _png(rng, 512)
            info = tarfile.TarInfo(f"shard_0/{name}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    doc = {"text_list": ["intro", "about a", "about b"],
           "image_info": [
               {"image_name": "a.jpg", "matched_sim": 0.5,
                "matched_text_index": 1},
               {"image_name": "b.jpg", "matched_sim": 0.6,
                "matched_text_index": 2}]}
    docs = tmp_path / "docs_shard_0_v2.jsonl"
    docs.write_text(json.dumps(doc) + "\n")

    out = tmp_path / "wds"
    n = convert_mmc4_to_wds([str(img_tar)], [str(docs)], str(out))
    assert n == 1
    shards = sorted(os.listdir(out))
    assert shards == ["000000000.tar"]

    # the converted sample flows through the real interleaved preprocessor
    sample = next(iter(tar_samples(str(out / shards[0]))))
    fn = make_interleaved_preprocessor(
        TinyTokenizer(), media_token_id=253, patch_size=16,
        sim_threshold=0.24, single_image_drop=0.0)
    images, ids, mask = fn(sample)
    assert (ids == 253).sum() == 2


def test_convert_laion_tsv_roundtrip(tmp_path, rng):
    root = tmp_path / "tsv"
    root.mkdir()
    rows = []
    for i in range(4):
        b64 = base64.b64encode(_png(rng)).decode()
        rows.append((f"img{i}", b64, json.dumps(
            {"captions": [f"caption {i}" if i != 2 else None]})))
    with open(root / "part-image-0.tsv", "w") as fi, \
            open(root / "part-text-0.tsv", "w") as ft:
        for name, b64, cap in rows:
            fi.write(f"{name}\t{b64}\n")
            ft.write(f"{name}\t{cap}\n")

    out = tmp_path / "wds"
    n = convert_laion_tsv_to_wds(str(root), str(out), num_threads=1)
    assert n == 3   # the None caption row is dropped

    shard = os.path.join(out, sorted(os.listdir(out))[0])
    pipe = ShardPipeline([shard],
                         make_pair_preprocessor(TinyTokenizer(),
                                                patch_size=16),
                         batch_size=3, shuffle_buffer=0)
    b = next(iter(pipe))
    assert b["images"].shape == (3, 1, 1, 3, 16, 16)


def test_make_a_train(tmp_path):
    data = {"data": {
        "A": {"rel_ins_ids": ["B", "ghost"]},
        "B": {"rel_ins_ids": []},
        "C": {"rel_ins_ids": ["A"]},
    }}
    src = tmp_path / "ins.json"
    src.write_text(json.dumps(data))
    out_path = tmp_path / "train.json"
    out = make_a_train(str(src), str(out_path))
    # B was consumed as A's in-context example -> not a primary key;
    # "ghost" is filtered (not in data)
    assert out == {"A": ["B"], "C": ["A"]}
    assert json.loads(out_path.read_text()) == out

    out2 = make_a_train(str(src), str(out_path), remove_rel_ins_ids=True)
    assert out2 == {"A": [], "B": [], "C": []}
