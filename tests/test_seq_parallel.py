"""Sequence/context-parallel training: the "seq" mesh axis + ring
attention routed through the attention dispatcher (ops/attention.py
`sequence_parallel`), integrated into the SFT train step.

Beyond-reference capability (the reference's NCCL/accelerate stack has no
sequence parallelism); parity is checked against the plain single-device
path on the CPU virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from otter_tpu.config import OtterConfig, ParallelConfig
from otter_tpu.models.otter import OtterVLM
from otter_tpu.ops.attention import sequence_parallel
from otter_tpu.parallel.mesh import create_mesh
from otter_tpu.parallel.sharding import shard_params
from otter_tpu.train.step import (TrainState, make_optimizer,
                                  make_train_step, split_params)


def _setup(rng, arch="mpt", b=2, s=32, pad=True):
    cfg = OtterConfig.tiny(arch)
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 1] = cfg.media_token_id
    attn_mask = np.ones((b, s), np.int32)
    if pad:
        attn_mask[0, -5:] = 0
        attn_mask[1, -9:] = 0
    lang_x = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, lang_x)["params"]
    labels = np.full((b, s), -100, np.int32)
    labels[:, 6:24] = ids[:, 6:24]
    labels[attn_mask == 0] = -100
    batch = {"vision_x": vision_x, "input_ids": lang_x,
             "attention_mask": jnp.asarray(attn_mask),
             "labels": jnp.asarray(labels)}
    return cfg, model, params, batch


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_forward_matches_plain(rng, arch):
    """Full-model logits under an sp=4 mesh (ALiBi column bias for mpt,
    RoPE for llama; both with padding segment-ids) match the plain path."""
    cfg, model, params, batch = _setup(rng, arch=arch)
    ref_logits, _, _ = model.apply(
        {"params": params}, batch["vision_x"], batch["input_ids"],
        attention_mask=batch["attention_mask"])

    mesh = create_mesh(ParallelConfig(dp=1, fsdp=2, sp=4, tp=1),
                       jax.devices()[:8])

    def fwd(params, vx, ids, mask):
        logits, _, _ = model.apply({"params": params}, vx, ids,
                                   attention_mask=mask)
        return logits

    with mesh, sequence_parallel(mesh):
        sp_logits = jax.jit(fwd)(params, batch["vision_x"],
                                 batch["input_ids"],
                                 batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)


def test_train_step_parity_sp_vs_plain(rng):
    """One full SFT step (fwd+bwd+Adam) on a dp×fsdp×sp×tp = 1×1×4×2 mesh
    matches the unsharded step: same loss, same updated params."""
    cfg, model, params, batch = _setup(rng)

    def one_step(use_mesh):
        trainable, _ = split_params(params, cfg)
        tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
        if use_mesh:
            mesh = create_mesh(ParallelConfig(dp=1, fsdp=1, sp=4, tp=2),
                               jax.devices()[:8])
            with mesh:
                sharded = shard_params(mesh, params)
                state = TrainState.create(sharded, cfg, tx)
                step = jax.jit(make_train_step(model, cfg, tx, mesh=mesh))
                state, metrics = step(state, batch)
                return (jax.device_get(state.trainable),
                        float(metrics["loss"]))
        state = TrainState.create(params, cfg, tx)
        step = jax.jit(make_train_step(model, cfg, tx))
        state, metrics = step(state, batch)
        return jax.device_get(state.trainable), float(metrics["loss"])

    t_sp, loss_sp = one_step(True)
    t_ref, loss_ref = one_step(False)
    assert abs(loss_sp - loss_ref) < 2e-4, (loss_sp, loss_ref)
    f_sp = traverse_util.flatten_dict(t_sp, sep="/")
    f_ref = traverse_util.flatten_dict(t_ref, sep="/")
    for key in f_ref:
        np.testing.assert_allclose(
            np.asarray(f_sp[key]), np.asarray(f_ref[key]),
            atol=3e-4, rtol=3e-3, err_msg=key)


@pytest.mark.slow
def test_train_step_composes_dp_fsdp_sp(rng):
    """sp composes with dp+fsdp: 2×2×2×1 mesh, finite loss, fused-CE path."""
    cfg, model, params, batch = _setup(rng, b=4)
    mesh = create_mesh(ParallelConfig(dp=2, fsdp=2, sp=2, tp=1),
                       jax.devices()[:8])
    with mesh:
        sharded = shard_params(mesh, params)
        trainable, _ = split_params(sharded, cfg)
        tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
        state = TrainState.create(sharded, cfg, tx)
        step = jax.jit(make_train_step(model, cfg, tx, mesh=mesh,
                                       fused_ce_chunk=16))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_fuyu_forward_matches_plain(rng):
    """Persimmon-arch (OtterHD) forward parity under sp=4 — the
    full-resolution Fuyu sequences are the natural sp customer
    (train/fuyu_sft.py make_fuyu_train_step(mesh=...))."""
    from otter_tpu.config import FuyuConfig
    from otter_tpu.models.fuyu import FuyuVLM

    cfg = FuyuConfig.tiny()
    model = FuyuVLM(cfg)
    b, s, p = 2, 32, 8
    pd = cfg.patch_size ** 2 * 3
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, :4] = cfg.image_placeholder_id
    indices = np.full((b, s), -1, np.int32)
    indices[:, :4] = np.arange(4)
    patches = rng.standard_normal((b, p, pd)).astype(np.float32)
    args = dict(image_patches=jnp.asarray(patches),
                image_patches_indices=jnp.asarray(indices))

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), **args)
    ref, _ = model.apply(params, jnp.asarray(ids), **args)

    mesh = create_mesh(ParallelConfig(dp=1, fsdp=2, sp=4, tp=1),
                       jax.devices()[:8])

    def fwd(params, ids_):
        logits, _ = model.apply(params, ids_, **args)
        return logits

    with mesh, sequence_parallel(mesh):
        sp_logits = jax.jit(fwd)(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
