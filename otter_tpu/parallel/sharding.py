"""Parameter partition rules: path-regex -> PartitionSpec.

Replaces DeepSpeed ZeRO configs (`pipeline/accelerate_configs/*.yaml`,
`ds_zero3_config.json`) with one declarative rule table over the
("data", "fsdp", "seq", "tensor") mesh:

  - fsdp axis: ZeRO-3-style fully sharded parameters
  - tensor axis: megatron-style TP (column-parallel up/QKV projections,
    row-parallel down/out projections) — the idiomatic TPU replacement for
    the reference's `device_map="auto"` layer placement
    (`modeling_otter.py:1022-1029`)
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.parallel.mesh import FSDP_AXIS, TENSOR_AXIS

# (path regex, spec). First match wins. Paths are "/"-joined flax param paths.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # column-parallel (out-features sharded over tensor, in over fsdp)
    (r".*(Wqkv|q_proj|k_proj|v_proj|up_proj|gate_proj|to_q|to_kv|ff_up|fc1)"
     r"/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    # row-parallel (in-features sharded over tensor, out over fsdp)
    (r".*(out_proj|down_proj|to_out|ff_down|fc2)/kernel$",
     P(TENSOR_AXIS, FSDP_AXIS)),
    (r".*lm_head/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    # embedding: shard the feature dim only. Sharding the vocab dim makes
    # the token gather un-partitionable (GSPMD falls back to "involuntary
    # full rematerialization" — replicate + repartition — a large silent
    # collective tax on every step); with the gathered dim replicated the
    # gather partitions trivially and the tied lm_head matmul reduces the
    # feature contraction with one psum.
    (r".*wte/embedding$", P(None, (FSDP_AXIS, TENSOR_AXIS))),
    (r".*/wpe$", P(None, FSDP_AXIS)),
    (r".*patch_embedding/kernel$", P(None, None, None, FSDP_AXIS)),
    (r".*position_embedding$", P(None, FSDP_AXIS)),
    (r".*(latents|frame_embs|media_time_embs)$", P()),
    # norms, biases, gates: replicated
    (r".*", P()),
]


def _spec_for(path: str, shape, rules) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            # drop axes that don't divide or exceed rank
            if len([s for s in spec]) > len(shape):
                return P()
            return spec
    return P()


def param_specs(params, rules=None) -> Any:
    """Pytree of PartitionSpecs matching `params`."""
    rules = rules or DEFAULT_RULES
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = _spec_for(path_str(kp), leaf.shape, rules)

    def map_fn(kp, leaf):
        return specs[path_str(kp)]

    return jax.tree_util.tree_map_with_path(map_fn, params)


def _safe_spec(spec: P, shape, mesh: Mesh) -> P:
    """Clear sharding on axes the dim size doesn't divide (e.g. tiny test
    models); keeps the rule table usable at any scale."""
    out = []
    for i, s in enumerate(spec):
        if s is None:
            out.append(None)
            continue
        axis_size = np.prod([mesh.shape[a] for a in
                             (s if isinstance(s, tuple) else (s,))])
        if i < len(shape) and shape[i] % axis_size == 0:
            out.append(s)
        else:
            out.append(None)
    return P(*out)


def param_shardings(mesh: Mesh, params, rules=None):
    """Pytree of NamedShardings for `params` on `mesh`."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda p, s: NamedSharding(mesh, _safe_spec(s, p.shape, mesh)),
        params, specs)


def shard_params(mesh: Mesh, params, rules=None):
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
