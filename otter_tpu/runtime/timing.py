"""Timing + compilation-cache helpers.

The TPU tunnel in this environment dispatches asynchronously and
`block_until_ready` returns before execution finishes, so wall-clock timing
MUST force a device->host readback. Compiles go through a remote-compile
relay (minutes per new graph) — the persistent compilation cache makes every
graph compile once per repo lifetime.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str = None) -> None:
    path = path or _CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_sync(tree) -> None:
    """Force real completion of device work by reading one scalar back."""
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[0]))
            return


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median wall-clock seconds per call, sync-forced."""
    for _ in range(warmup):
        out = fn(*args)
    force_sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        force_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
