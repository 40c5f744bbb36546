"""Dtype policy helpers.

The policy (SURVEY.md §7 stage 1): bf16 storage for the large frozen towers
(halves HBM traffic — decode throughput is weight-bandwidth-bound), f32 for
norm/gate/bias params and for trainable master weights (optimizer
stability). Softmax/normalization statistics are always f32 inside the ops
(ops/layers.py, ops/flash_attention.py).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
from flax import traverse_util

# parameters kept in f32 regardless of the storage dtype
_KEEP_F32 = re.compile(
    r".*(scale|bias|gate$|attn_gate|ff_gate|norm[^/]*/|_ln/).*")


def cast_params(params: Any, dtype=jnp.bfloat16,
                keep_f32=_KEEP_F32) -> Any:
    """Cast floating-point leaves to `dtype`, keeping norm/gate/bias f32."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating) \
                and not keep_f32.match(k):
            out[k] = v.astype(dtype)
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def param_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "dtype"))
