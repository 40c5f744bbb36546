"""Preprocessing throughput (images+frames/sec/chip) — the BASELINE.md
north-star metric. Measures the MIMIC-IT path at 480x640 JPEG -> 224^2
normalized CHW for three pipelines:

  pil:    host decode + resize + float normalize (reference behavior)
  native: C++ batch decode+resize+normalize (otter_tpu/native)
  split:  host decode + uint8 resize, device normalize (device_preprocess)
"""

import base64
import io
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from PIL import Image


def make_jpegs(n=64):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        img = Image.fromarray(
            (rng.random((480, 640, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=85)
        out.append(base64.urlsafe_b64encode(buf.getvalue()).decode())
    return out

def main():
    from otter_tpu.data.mimicit import decode_base64_image, preprocess_image
    b64s = make_jpegs()

    def timed(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return len(b64s) / float(np.median(ts))

    # PIL reference path
    pil = timed(lambda: [preprocess_image(decode_base64_image(s), 224)
                         for s in b64s])
    print(f"pil: {pil:.1f} img/s")

    # native path
    try:
        from otter_tpu import native
        if native.available():
            def nat():
                out, status = native.preprocess_batch(
                    [s.encode() for s in b64s], 224,
                    (0.481, 0.458, 0.408), (0.269, 0.261, 0.276),
                    is_base64=True, scaled_decode=True)
                assert (status == 0).all()
            print(f"native: {timed(nat):.1f} img/s")
    except Exception as e:
        print("native unavailable:", e)

    # split path: host u8 decode+resize, device normalize (async dispatch;
    # force completion via readback)
    import jax
    import jax.numpy as jnp
    from otter_tpu.ops.image_prep import normalize_u8
    from otter_tpu.runtime.timing import enable_compile_cache
    enable_compile_cache()

    def split():
        u8 = np.stack([np.asarray(decode_base64_image(s).resize(
            (224, 224), Image.BICUBIC), np.uint8) for s in b64s], 0)
        out = normalize_u8(jnp.asarray(u8))
        np.asarray(jax.device_get(out.ravel()[0]))
    print(f"split (host u8 + device normalize): {timed(split):.1f} img/s")

    webdataset_bench()


def webdataset_bench(n=256):
    """End-to-end LAION-pair webdataset pipeline (tar read + det-shuffle
    + tokenize + decode + collate), native C++ batch decode vs per-image
    PIL — the round-3 wiring of the native decoder into the pretraining
    pipelines (MMC4 shares the same batch decoder per document)."""
    import os
    import tarfile
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "tests"))
    from helpers import TinyTokenizer

    from otter_tpu.data.webdataset import (ShardPipeline,
                                           make_pair_preprocessor)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    shard = os.path.join(tmp, "000000.tar")
    with tarfile.open(shard, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                (rng.random((480, 640, 3)) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=85)
            for name, data in ((f"{i:06d}.jpg", buf.getvalue()),
                               (f"{i:06d}.txt", b"a test caption")):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    tok = TinyTokenizer()
    for label, use_native in (("pil", False), ("native", True)):
        pipe = ShardPipeline(
            [shard], make_pair_preprocessor(tok, native=use_native),
            batch_size=64, shuffle_buffer=64)
        t0 = time.perf_counter()
        cnt = sum(b["images"].shape[0] for b in pipe)
        dt = time.perf_counter() - t0
        print(f"webdataset pair pipeline [{label}]: "
              f"{cnt / dt:.1f} samples/s ({cnt} samples)")


if __name__ == "__main__":
    main()
