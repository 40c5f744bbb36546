"""ctypes bindings for the native C++ preprocessing library.

Builds `libotter_preproc.so` on first use (g++ -O3 -fopenmp, links
libjpeg/libpng) and exposes `preprocess_batch`. Falls back to None when the
toolchain or libraries are unavailable — callers must handle `available()`
being False (the PIL path remains the reference implementation).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preproc.cpp")
_SO = os.path.join(_DIR, "libotter_preproc.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", _SO, "-ljpeg", "-lpng", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"native preproc build failed: {e}")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            print(f"native preproc load failed: {e}")
            return None
        lib.otter_preprocess_batch2.restype = ctypes.c_int
        lib.otter_preprocess_batch2.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(buffers: Sequence[bytes], size: int,
                     mean: Tuple[float, float, float],
                     std: Tuple[float, float, float],
                     is_base64: bool = False,
                     scaled_decode: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """buffers of encoded images (or base64 text) -> ([N,3,S,S] f32,
    status [N] int32 with 0=ok).

    scaled_decode lets libjpeg IDCT straight to the smallest M/8 scale
    still covering `size` (PIL's Image.draft equivalent): 2-4x fewer
    pixels decoded+resized on typical downscales, numerically a few LSBs
    off a full decode. Default False: bit-stable pixels for every caller
    (eval scores must not drift with a library default — advisor r4);
    the throughput-sensitive training pipelines (webdataset/mimicit
    collate) opt in explicitly."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocessing unavailable")
    n = len(buffers)
    blob = b"".join(buffers)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in buffers], out=offsets[1:])
    out = np.empty((n, 3, size, size), np.float32)
    status = np.zeros(n, np.int32)
    mean_arr = (ctypes.c_float * 3)(*mean)
    std_arr = (ctypes.c_float * 3)(*std)
    blob_buf = ctypes.create_string_buffer(blob, len(blob))
    lib.otter_preprocess_batch2(
        ctypes.cast(blob_buf, ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, int(is_base64), size, int(scaled_decode), mean_arr, std_arr,
        out.ctypes.data_as(ctypes.c_void_p),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status
