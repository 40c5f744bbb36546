"""Scale validation without hardware (VERDICT r2 #5): the docs/scaling.md
7B+ recipes exercised at REAL model dims.

Two layers of checking:
  1. divisibility — every parameter of every recipe preset must divide the
     mesh axes its partition rule assigns (catches partition-rule bugs and
     head/hidden sizes that don't tile the recipe meshes); pure shape math
     via jax.eval_shape, no devices.
  2. GSPMD lowering — the full fwd+bwd (value_and_grad of the SFT loss) at
     Otter-MPT7B dims, abstract params carrying the recipe NamedShardings,
     lowered (no execute) on an 8-virtual-device fsdp=8 mesh. Catches
     sharding propagation/constraint errors at the real 7B shapes the
     2x2x2 tiny dryrun cannot see.

Reference capability being matched: 2-node x 8-GPU ZeRO-3 training
(`pipeline/accelerate_configs/accelerate_config_zero3_slurm.yaml`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.config import (OtterConfig, ParallelConfig, otter_llama2_chat13b,
                              otter_mpt7b, otter_mpt30b, otter_vicuna33b)
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import MESH_AXES
from otter_tpu.parallel.sharding import param_specs

# (preset, mesh axis sizes) — the docs/scaling.md worked recipes
RECIPES = [
    (otter_mpt7b, dict(data=1, fsdp=8, tensor=1)),      # v5e-8 training
    (otter_mpt7b, dict(data=1, fsdp=4, tensor=2)),      # mixed
    (otter_mpt7b, dict(data=2, fsdp=8, tensor=1)),      # v5e-16
    (otter_llama2_chat13b, dict(data=1, fsdp=8, tensor=1)),
    (otter_llama2_chat13b, dict(data=1, fsdp=1, tensor=2)),  # bf16 serving
    (otter_mpt30b, dict(data=1, fsdp=16, tensor=1)),    # v5e-16 training
    (otter_vicuna33b, dict(data=1, fsdp=16, tensor=1)),
    (otter_vicuna33b, dict(data=1, fsdp=8, tensor=4)),  # int8 serving tp=4
]


def _abstract_params(cfg):
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    vision = jax.ShapeDtypeStruct((1, 1, 1, 3, 224, 224), jnp.bfloat16)
    lang = jax.ShapeDtypeStruct((1, 16), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vision, lang)
    return model, shapes["params"]


# dims where a rule axis may legitimately be dropped by _safe_spec's
# mesh-time refinement: odd vocab sizes (32000 + 2 special tokens) cannot
# tile tensor>2 — the head/embedding then stays sharded on its other dim
ACCEPTABLE_DROPS = ("lm_head", "wte")


@pytest.mark.parametrize("preset,axes", RECIPES,
                         ids=[f"{p.__name__}-d{a['data']}f{a['fsdp']}"
                              f"t{a['tensor']}" for p, a in RECIPES])
def test_partition_rules_divide_recipe_meshes(preset, axes):
    _, shapes = _abstract_params(preset())
    specs = param_specs(shapes)
    flat_shapes = jax.tree_util.tree_leaves_with_path(shapes)
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_shapes) == len(flat_specs)

    def axis_size(names):
        names = (names,) if isinstance(names, str) else names
        return int(np.prod([axes[n] for n in names]))

    unexpected = []
    for (path, leaf), spec in zip(flat_shapes, flat_specs):
        for dim, names in zip(leaf.shape, spec):
            if names is None or dim % axis_size(names) == 0:
                continue
            # _safe_spec drops this axis at mesh time; only vocab-sized
            # dims of head/embedding may need that escape hatch
            key = jax.tree_util.keystr(path)
            if not any(tok in key for tok in ACCEPTABLE_DROPS):
                unexpected.append((key, leaf.shape, spec))
    assert not unexpected, \
        f"indivisible params under {axes}: {unexpected[:8]}"


@pytest.mark.slow
def test_7b_fwd_bwd_lowers_on_fsdp8_mesh():
    """Trace + GSPMD-lower (no execute) the 7B SFT fwd+bwd at b8 s1024 on
    the fsdp=8 recipe mesh, abstract params carrying real NamedShardings."""
    cfg = otter_mpt7b()
    model, shapes = _abstract_params(cfg)
    devices = np.asarray(jax.devices()[:8]).reshape(1, 8, 1, 1)
    mesh = Mesh(devices, MESH_AXES)
    specs = param_specs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        shapes, specs, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))

    from otter_tpu.train.step import (causal_lm_loss, merge_params,
                                      split_params)
    trainable, frozen = split_params(params_abs, cfg)

    b, s = 8, 1024
    batch_sharding = NamedSharding(mesh, P(("data", "fsdp")))

    def abs_in(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=batch_sharding)

    batch = {
        "vision_x": jax.ShapeDtypeStruct((b, 1, 1, 3, 224, 224),
                                         jnp.bfloat16,
                                         sharding=batch_sharding),
        "input_ids": abs_in((b, s), jnp.int32),
        "attention_mask": abs_in((b, s), jnp.int32),
        "labels": abs_in((b, s), jnp.int32),
    }

    def loss_fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        logits, _, _ = model.apply(
            {"params": params}, batch["vision_x"], batch["input_ids"],
            attention_mask=batch["attention_mask"])
        loss, _ = causal_lm_loss(logits, batch["labels"])
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    with mesh:
        lowered = jax.jit(grad_fn).lower(trainable, frozen, batch)
    text = lowered.as_text()
    assert "stablehlo" in text or "module" in text


@pytest.mark.slow
def test_7b_long_context_lowers_on_sp4_mesh():
    """Trace + GSPMD-lower (no execute) the 7B SFT fwd+bwd at b1 s=8192 —
    4x the reference's max_seq_len 2048 — on a fsdp=2 x sp=4 mesh with
    ring attention active (the sequence-parallel long-context recipe,
    docs/scaling.md). Validates the ring shard_map + remat + GSPMD
    propagation at real 7B dims without hardware."""
    from otter_tpu.ops.attention import sequence_parallel
    from otter_tpu.train.step import causal_lm_loss, merge_params, \
        split_params

    cfg = otter_mpt7b()
    cfg = cfg.replace(text=cfg.text.replace(max_seq_len=8192))
    model, shapes = _abstract_params(cfg)
    devices = np.asarray(jax.devices()[:8]).reshape(1, 2, 4, 1)
    mesh = Mesh(devices, MESH_AXES)
    specs = param_specs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        shapes, specs, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))
    trainable, frozen = split_params(params_abs, cfg)

    b, s = 1, 8192
    rep = NamedSharding(mesh, P())

    def abs_in(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    batch = {
        "vision_x": jax.ShapeDtypeStruct((b, 1, 1, 3, 224, 224),
                                         jnp.bfloat16, sharding=rep),
        "input_ids": abs_in((b, s), jnp.int32, P(None, "seq")),
        "attention_mask": abs_in((b, s), jnp.int32, P(None, "seq")),
        "labels": abs_in((b, s), jnp.int32, P(None, "seq")),
    }

    def loss_fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        with sequence_parallel(mesh):
            logits, _, _ = model.apply(
                {"params": params}, batch["vision_x"], batch["input_ids"],
                attention_mask=batch["attention_mask"])
        loss, _ = causal_lm_loss(logits, batch["labels"])
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    with mesh:
        lowered = jax.jit(grad_fn).lower(trainable, frozen, batch)
    text = lowered.as_text()
    assert "collective_permute" in text, \
        "ring attention's ppermute should appear in the lowered module"
