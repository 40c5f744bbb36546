"""Checkpoint store tests: save/restore round-trip, trainable-only saves,
keep-N pruning, HF export readback."""

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import OtterConfig
from otter_tpu.models.otter import OtterVLM
from otter_tpu.runtime.checkpoint import CheckpointStore
from otter_tpu.train.step import TrainState, make_optimizer, split_params


def _mk_state(rng):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = jnp.asarray(rng.integers(0, 200, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)["params"]
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-4, total_steps=10)
    return cfg, TrainState.create(params, cfg, tx), tx


def test_save_restore_roundtrip(tmp_path, rng):
    cfg, state, tx = _mk_state(rng)
    store = CheckpointStore(str(tmp_path / "ckpts"), keep=2)
    store.save(5, state, metadata={"epoch": 1})

    # perturb, then restore
    perturbed = state.replace(
        trainable=jax.tree_util.tree_map(lambda x: x + 1.0, state.trainable))
    restored, meta = store.restore(perturbed)
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored.trainable),
                    jax.tree_util.tree_leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 5


def test_trainable_only_and_pruning(tmp_path, rng):
    cfg, state, tx = _mk_state(rng)
    store = CheckpointStore(str(tmp_path / "ckpts"), keep=2)
    for s in (1, 2, 3):
        store.save(s, state, trainable_only=True)
    assert store.steps() == [2, 3]

    perturbed = state.replace(
        trainable=jax.tree_util.tree_map(lambda x: x * 0, state.trainable),
        frozen=jax.tree_util.tree_map(lambda x: x * 0, state.frozen))
    restored, meta = store.restore(perturbed)
    assert meta["trainable_only"]
    # trainable restored, frozen untouched (still zeros)
    for a, b in zip(jax.tree_util.tree_leaves(restored.trainable),
                    jax.tree_util.tree_leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(float(jnp.sum(jnp.abs(x))) == 0
               for x in jax.tree_util.tree_leaves(restored.frozen))


def test_hf_export(tmp_path, rng):
    from safetensors.numpy import load_file
    cfg, state, tx = _mk_state(rng)
    store = CheckpointStore(str(tmp_path / "ckpts"))
    out = store.export_hf(state.params, cfg,
                          str(tmp_path / "model.safetensors"))
    sd = load_file(out)
    assert "lang_encoder.transformer.wte.weight" in sd
    assert sd["lang_encoder.transformer.wte.weight"].shape == (
        cfg.text.total_vocab, cfg.text.hidden_size)
