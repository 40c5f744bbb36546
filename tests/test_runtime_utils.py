"""Coverage for runtime utilities: meters/logger, conversation image
handling, sampling filters."""

import json

import jax.numpy as jnp
import numpy as np
from PIL import Image

from otter_tpu.generation import sampling
from otter_tpu.runtime.metrics import AverageMeter, MetricsLogger
from otter_tpu.serve.conversation import otter_v1


def test_average_meter():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0 and m.val == 3.0 and m.count == 3
    m.update(10.0, n=7)
    assert m.count == 10


def test_metrics_logger_jsonl(tmp_path, capsys):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(run_name="t", jsonl_path=str(path), rank=0)
    log.log(5, {"loss": jnp.asarray(1.5), "note": "x"})
    out = capsys.readouterr().out
    assert "loss=1.5" in out
    row = json.loads(path.read_text().strip())
    assert row["step"] == 5 and row["loss"] == 1.5
    # non-zero rank is silent
    log2 = MetricsLogger(run_name="t", rank=1)
    log2.log(1, {"loss": 1.0})
    assert capsys.readouterr().out == ""


def test_conversation_get_images(rng):
    conv = otter_v1.copy()
    img = Image.fromarray((rng.random((1400, 700, 3)) * 255).astype(
        np.uint8))
    conv.append_message("User", ("what is this?", img))
    conv.append_message("GPT", None)
    images = conv.get_images(max_len=640)
    assert len(images) == 1
    import base64, io
    decoded = Image.open(io.BytesIO(base64.urlsafe_b64decode(images[0])))
    assert max(decoded.size) <= 640   # downscaled


def test_apply_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = sampling.apply_top_k(logits, 2)
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0
    assert out[0, 0] < -1e9 and out[0, 3] < -1e9
    np.testing.assert_array_equal(sampling.apply_top_k(logits, 0), logits)


def test_profiler_trace(tmp_path):
    from otter_tpu.runtime.metrics import profiler_trace
    with profiler_trace(None):   # disabled: no-op
        pass
    with profiler_trace(str(tmp_path / "trace")):
        _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    import os
    assert any(os.scandir(tmp_path / "trace"))
