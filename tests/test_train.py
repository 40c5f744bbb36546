"""Training-step tests: freezing policy, weight-decay grouping, loss
masking, end-to-end loss decrease on a tiny model, and the full sharded
step on the 8-device CPU mesh (dp×fsdp×tp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from otter_tpu.config import OtterConfig, ParallelConfig
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import create_mesh
from otter_tpu.parallel.sharding import param_shardings, shard_params
from otter_tpu.train.step import (TrainState, causal_lm_loss, make_optimizer,
                                  make_train_step, merge_params, split_params,
                                  weight_decay_mask)


def _setup(rng, b=2, s=24):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 1] = cfg.media_token_id
    lang_x = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, lang_x)["params"]
    labels = np.full((b, s), -100, np.int32)
    labels[:, 6:18] = ids[:, 6:18]
    batch = {"vision_x": vision_x, "input_ids": lang_x,
             "attention_mask": jnp.ones((b, s), jnp.int32),
             "labels": jnp.asarray(labels)}
    return cfg, model, params, batch


def test_split_params_freezing_policy(rng):
    cfg, model, params, _ = _setup(rng)
    trainable, frozen = split_params(params, cfg)
    t_flat = traverse_util.flatten_dict(trainable, sep="/")
    f_flat = traverse_util.flatten_dict(frozen, sep="/")
    # perceiver + xattn + wte trainable (modeling_otter.py:875-915)
    assert any(k.startswith("perceiver/") for k in t_flat)
    assert any("xattn_" in k for k in t_flat)
    assert any(k.endswith("wte/embedding") for k in t_flat)
    # vision encoder and decoder layers frozen
    assert all(not k.startswith("vision_encoder/") for k in t_flat)
    assert any(k.startswith("vision_encoder/") for k in f_flat)
    assert all("xattn" in k or not k.startswith("lang_encoder/layers_")
               for k in t_flat)
    # round-trips
    merged = merge_params(trainable, frozen)
    assert (jax.tree_util.tree_structure(merged)
            == jax.tree_util.tree_structure(params))


def test_weight_decay_mask(rng):
    cfg, model, params, _ = _setup(rng)
    trainable, _ = split_params(params, cfg)
    mask = traverse_util.flatten_dict(weight_decay_mask(trainable), sep="/")
    assert any(v for k, v in mask.items() if "xattn_" in k and "to_q" in k)
    assert not any(v for k, v in mask.items() if "attn_gate" in k)
    assert not any(v for k, v in mask.items() if "norm" in k)
    assert not any(v for k, v in mask.items() if k.startswith("perceiver"))


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[-100, 2, -100, 3]])
    loss, n = causal_lm_loss(logits, labels)
    assert int(n) == 2
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


@pytest.mark.slow
def test_train_step_decreases_loss_and_freezes(rng):
    cfg, model, params, batch = _setup(rng)
    trainable, frozen = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-2, total_steps=50)
    state = TrainState.create(params, cfg, tx)
    step = jax.jit(make_train_step(model, cfg, tx, mask_embedding=True))

    frozen_before = jax.tree_util.tree_leaves(state.frozen)
    state1, m1 = step(state, batch)
    losses = [float(m1["loss"])]
    for _ in range(5):
        state1, m = step(state1, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # frozen params unchanged
    for a, b in zip(frozen_before, jax.tree_util.tree_leaves(state1.frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # embedding grad mask: only <answer> row (or eoc fallback) may change
    wte0 = traverse_util.flatten_dict(trainable, sep="/")
    wte1 = traverse_util.flatten_dict(state1.trainable, sep="/")
    for k in wte0:
        if k.endswith("wte/embedding"):
            diff = np.abs(np.asarray(wte1[k]) - np.asarray(wte0[k])).sum(1)
            changed = np.nonzero(diff > 0)[0]
            allowed = {cfg.answer_token_id, cfg.eoc_token_id}
            assert set(changed.tolist()) <= allowed, changed


@pytest.mark.slow
def test_sharded_train_step_8dev(rng):
    cfg, model, params, batch = _setup(rng, b=4)
    pcfg = ParallelConfig(dp=2, fsdp=2, tp=2)
    mesh = create_mesh(pcfg, jax.devices()[:8])
    with mesh:
        params = shard_params(mesh, params)
        trainable, _ = split_params(params, cfg)
        tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
        state = TrainState.create(params, cfg, tx)
        step = jax.jit(make_train_step(model, cfg, tx))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_sharded_step_compiles_without_spmd_remat(rng, capfd):
    """GSPMD must partition the whole train step without falling back to
    "involuntary full rematerialization" (replicate + repartition). The
    embedding rule used to shard the vocab dim, which made the token gather
    un-partitionable and taxed every step with a full embedding all-gather;
    this pins the fix (parallel/sharding.py wte rule)."""
    cfg, model, params, batch = _setup(rng, b=4)
    pcfg = ParallelConfig(dp=2, fsdp=2, tp=2)
    mesh = create_mesh(pcfg, jax.devices()[:8])
    with mesh:
        params = shard_params(mesh, params)
        trainable, _ = split_params(params, cfg)
        tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
        state = TrainState.create(params, cfg, tx)
        step = make_train_step(model, cfg, tx, mask_embedding=True)
        capfd.readouterr()  # drop anything emitted so far
        jax.jit(step).lower(state, batch).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err


@pytest.mark.slow
def test_grad_accumulation(rng):
    cfg, model, params, batch = _setup(rng)
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-2, total_steps=50,
                        grad_accum_steps=2)
    state = TrainState.create(params, cfg, tx)
    step = jax.jit(make_train_step(model, cfg, tx))
    t0 = jax.tree_util.tree_leaves(state.trainable)[0]
    state, _ = step(state, batch)
    t1 = jax.tree_util.tree_leaves(state.trainable)[0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))  # mid-accum
    state, _ = step(state, batch)
    t2 = jax.tree_util.tree_leaves(state.trainable)[0]
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_fused_ce_matches_standard(rng):
    """fused_ce_chunk path (skip_head + chunked CE, no [B,S,V] logits)
    reproduces the standard loss AND gradients."""
    import optax
    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.train.step import (TrainState, make_optimizer,
                                      make_train_step, split_params)

    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    b, s = 2, 12
    vx = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    labels = np.where(rng.random((b, s)) < 0.6, ids, -100).astype(np.int32)
    batch = {"vision_x": vx, "input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((b, s), jnp.int32),
             "labels": jnp.asarray(labels)}

    params = model.init(jax.random.PRNGKey(0), vx, batch["input_ids"])
    params = params["params"]
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-3, total_steps=10)

    def run(fused):
        st = TrainState.create(params, cfg, tx)
        step = make_train_step(model, cfg, tx, mask_embedding=True,
                               fused_ce_chunk=4 if fused else 0)
        st2, m = jax.jit(step)(st, batch)
        return m, st2

    m0, st0 = run(False)
    m1, st1 = run(True)
    assert int(m0["tokens"]) == int(m1["tokens"])
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m0["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(st0.trainable)
    bnew = jax.tree_util.tree_leaves(st1.trainable)
    for x, y in zip(a, bnew):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_remat_matches_no_remat(rng):
    """Gradient checkpointing (nn.remat per layer) must not change loss
    or gradients."""
    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.train.step import causal_lm_loss

    cfg = OtterConfig.tiny("mpt")
    b, s = 1, 10
    vx = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    labels = jnp.asarray(np.where(rng.random((b, s)) < 0.5,
                                  np.asarray(ids), -100).astype(np.int32))

    base = OtterVLM(cfg)
    params = base.init(jax.random.PRNGKey(0), vx, ids)

    def loss_for(model):
        def f(p):
            lg, _, _ = model.apply(p, vx, ids)
            return causal_lm_loss(lg, labels)[0]
        return jax.jit(jax.value_and_grad(f))(params)

    l0, g0 = loss_for(base)
    l1, g1 = loss_for(OtterVLM(cfg, remat=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_int8_adam_matches_f32_adam_updates(rng):
    """Blockwise int8 Adam (train/opt8.py) vs optax f32 Adam over several
    updates: step directions within quantization tolerance."""
    import optax

    from otter_tpu.train.opt8 import scale_by_adam8

    params = {"w": jnp.asarray(rng.standard_normal((64, 96)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((96,)), jnp.float32)}
    tx8 = scale_by_adam8(b1=0.9, b2=0.95, block=64)
    txf = optax.scale_by_adam(b1=0.9, b2=0.95)
    s8, sf = tx8.init(params), txf.init(params)
    for i in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(i).standard_normal(p.shape) * 0.1,
                jnp.float32), params)
        u8, s8 = tx8.update(g, s8)
        uf, sf = txf.update(g, sf)
        for a, b in zip(jax.tree_util.tree_leaves(u8),
                        jax.tree_util.tree_leaves(uf)):
            a, b = np.asarray(a), np.asarray(b)
            # int8 block quantization of m/v perturbs typical steps ~1%;
            # elements whose nu sits far below its block max see larger
            # relative error — assert on the distribution, not the tail
            err = np.abs(a - b)
            assert np.mean(err) < 0.01, np.mean(err)
            assert np.mean(err < 0.08) > 0.999, np.mean(err < 0.08)
            assert err.max() < 0.4, err.max()


def test_int8_adam_training_trajectory(rng):
    """150 least-squares steps: int8-state Adam reaches (near) the f32
    Adam loss — the end-to-end check that blockwise quantized states
    don't break optimization."""
    import optax

    from otter_tpu.train.opt8 import scale_by_adam8

    x = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
    w_true = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    y = x @ w_true

    def loss_fn(w):
        return jnp.mean((x @ w - y) ** 2)

    def train(tx):
        w = jnp.zeros((32, 8), jnp.float32)
        st = tx.init(w)
        for _ in range(150):
            g = jax.grad(loss_fn)(w)
            u, st = tx.update(g, st)
            w = w + u
        return float(loss_fn(w))

    lr = optax.scale(-0.05)
    l8 = train(optax.chain(scale_by_adam8(block=64), lr))
    lf = train(optax.chain(optax.scale_by_adam(), lr))
    assert l8 < 0.05, f"int8-Adam failed to optimize: {l8}"
    assert l8 < max(lf * 3, 0.02), (l8, lf)


def test_frozen_int8_grad_parity(rng):
    """The single-chip 7B SFT recipe at tiny dims: gradients wrt the
    TRAINABLE subset with int8-quantized frozen decoder layers match the
    bf16-frozen path when the frozen weights are exactly
    int8-representable (VERDICT r2 #3's correctness gate)."""
    from flax import traverse_util

    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.ops.quant import (FROZEN_DECODER_PATTERNS,
                                     quantize_params)
    from otter_tpu.train.step import causal_lm_loss, merge_params, \
        split_params

    cfg = OtterConfig.tiny("mpt")
    qcfg = cfg.replace(text=cfg.text.replace(quant="int8",
                                             quant_xattn=None))
    b, s = 1, 40        # tokens > 32 so no fused decode kernels engage
    vision_x = jnp.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    labels = jnp.asarray(np.where(rng.random((b, s)) < 0.5,
                                  np.asarray(ids), -100), jnp.int32)

    model = OtterVLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)["params"]

    # snap frozen decoder kernels to exactly int8-representable values
    flat = traverse_util.flatten_dict(params, sep="/")
    for k, v in list(flat.items()):
        if FROZEN_DECODER_PATTERNS.match(k):
            w = np.asarray(v, np.float32)
            amax = np.abs(w).max(axis=0)
            scale = np.where(amax > 0, amax / 127.0, 1.0)
            flat[k] = jnp.asarray(
                np.round(w / scale[None, :]) * scale[None, :], jnp.float32)
    params = traverse_util.unflatten_dict(flat, sep="/")

    trainable, frozen_bf16 = split_params(params, cfg)
    frozen_int8 = quantize_params(frozen_bf16,
                                  patterns=FROZEN_DECODER_PATTERNS)
    qmodel = OtterVLM(qcfg, dtype=jnp.float32)

    def loss(trainable, frozen, m):
        p = merge_params(trainable, frozen)
        logits, _, _ = m.apply({"params": p}, vision_x, ids,
                               attention_mask=jnp.ones((b, s), jnp.int32))
        return causal_lm_loss(logits, labels)[0]

    l0, g0 = jax.value_and_grad(lambda t: loss(t, frozen_bf16, model))(
        trainable)
    l1, g1 = jax.value_and_grad(lambda t: loss(t, frozen_int8, qmodel))(
        trainable)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    for a, c in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=2e-4)
