"""Flamingo pretraining: joint LAION + MMC4 (reference
`pipeline/train/pretraining.py`), plus the CC3M variant
(`pretraining_cc3m.py`).

Loss = loss_multiplier_laion * L_laion + loss_multiplier_mmc4 * L_mmc4
(defaults 0.2 / 1.0, pretraining.py:115-116), both batches stepped
together. Label policies (pretraining.py:232-295):

  - pairs (LAION/CC3M): labels = ids; pad, position 0 and <image> -> -100
  - interleaved (MMC4): additionally mask text before the first <image>
    and text between an <|endofchunk|> and the following <image>
    (only image-conditioned spans train)

Epoch resume restores model/optimizer/step from the latest checkpoint
(pretraining.py:493-510) via CheckpointStore.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import OtterConfig, ParallelConfig
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import create_mesh, shard_batch
from otter_tpu.parallel.sharding import shard_params
from otter_tpu.runtime.checkpoint import CheckpointStore
from otter_tpu.runtime.metrics import AverageMeter, MetricsLogger
from otter_tpu.train.step import (TrainState, causal_lm_loss, make_optimizer,
                                  merge_params, split_params)


def pair_labels(input_ids: np.ndarray, pad_id: int,
                media_id: int) -> np.ndarray:
    labels = input_ids.astype(np.int32).copy()
    labels[labels == pad_id] = -100
    labels[:, 0] = -100
    labels[labels == media_id] = -100
    return labels


def interleaved_labels(input_ids: np.ndarray, pad_id: int, media_id: int,
                       eoc_id: int) -> np.ndarray:
    labels = pair_labels(input_ids, pad_id, media_id)
    ids = input_ids
    b, s = ids.shape
    for i in range(b):
        # mask until first <image>
        t = 0
        while t < s and ids[i, t] != media_id:
            labels[i, t] = -100
            t += 1
        # after each <|endofchunk|>, mask until the next <image>
        for start in np.nonzero(ids[i] == eoc_id)[0]:
            t = start + 1
            while t < s and ids[i, t] != media_id:
                labels[i, t] = -100
                t += 1
    return labels


def make_pretrain_step(model, cfg: OtterConfig, tx, *,
                       loss_multiplier_laion: float = 0.2,
                       loss_multiplier_mmc4: float = 1.0,
                       attend_previous: Optional[bool] = None,
                       mesh=None):
    """step(state, laion_batch, mmc4_batch, rng) -> (state, metrics).

    Each batch: {vision_x, input_ids, attention_mask, labels}; either may be
    None (CC3M-only etc.). attend_previous=None draws it randomly per step
    (use_media_placement_augmentation, modeling_flamingo.py:451).
    """
    import contextlib

    import optax

    from otter_tpu.ops.attention import sequence_parallel

    def forward(trainable, frozen, batch, attend_prev):
        params = merge_params(trainable, frozen)
        ctx = (sequence_parallel(mesh) if mesh is not None
               else contextlib.nullcontext())
        with ctx:
            logits, _, _ = _apply(params, batch, attend_prev)
        loss, _ = causal_lm_loss(logits, batch["labels"])
        return loss

    def _apply(params, batch, attend_prev):
        return model.apply(
            {"params": params}, batch["vision_x"], batch["input_ids"],
            attention_mask=batch["attention_mask"],
            attend_previous=attend_prev)

    def loss_fn(trainable, frozen, laion_batch, mmc4_batch, attend_prev):
        total = 0.0
        metrics = {}
        if laion_batch is not None:
            l = forward(trainable, frozen, laion_batch, attend_prev)
            total += loss_multiplier_laion * l
            metrics["loss_laion"] = l
        if mmc4_batch is not None:
            l = forward(trainable, frozen, mmc4_batch, attend_prev)
            total += loss_multiplier_mmc4 * l
            metrics["loss_mmc4"] = l
        metrics["loss"] = total
        return total, metrics

    def step(state: TrainState, laion_batch, mmc4_batch,
             attend_prev: bool = True):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, laion_batch, mmc4_batch,
            attend_prev)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        import optax as _optax
        trainable = _optax.apply_updates(state.trainable, updates)
        return dataclasses.replace(
            state, step=state.step + 1, trainable=trainable,
            opt_state=opt_state), metrics

    return step


def train(args, tokenizer, *, dataset_types=("laion", "mmc4")):
    """Pretraining loop driver; `args` needs the webdataset fields
    (laion_shards/mmc4_shards/batch sizes/train_num_samples_*) plus the
    TrainArgs-style optimization fields."""
    import random as pyrandom

    from otter_tpu.data.webdataset import get_data

    rank = jax.process_index()
    world = jax.process_count()
    args.rank, args.world_size = rank, world

    cfg = args.model_cfg if hasattr(args, "model_cfg") else \
        OtterConfig.tiny("mpt")
    cfg = cfg.replace(use_media_placement_augmentation=True)  # Flamingo
    model = OtterVLM(cfg, dtype=jnp.bfloat16
                     if args.precision == "bf16" else jnp.float32)
    mesh = create_mesh(ParallelConfig(dp=args.dp, fsdp=args.fsdp,
                                      sp=getattr(args, "sp", 1),
                                      tp=args.tp))
    datas = {t: get_data(args, tokenizer, t) for t in dataset_types}
    steps_per_epoch = min(d.num_batches for d in datas.values())

    with mesh:
        vx = jnp.zeros((1, 1, 1, 3, args.patch_image_size,
                        args.patch_image_size), jnp.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(args.seed), vx,
            jnp.zeros((1, 8), jnp.int32))["params"]
        params = shard_params(mesh, {"params": params})["params"]
        trainable, _ = split_params(params, cfg)
        tx = make_optimizer(
            trainable, lr=args.learning_rate, schedule=args.lr_scheduler,
            warmup_steps=args.warmup_steps,
            total_steps=steps_per_epoch * args.num_epochs,
            weight_decay=args.weight_decay)
        state = TrainState.create(params, cfg, tx)
        # the "laion slot" carries whichever image-text-pair source is
        # configured; CC3M uses its own multiplier (reference
        # pretraining_cc3m.py:101 default 1.0, vs LAION's 0.2)
        pair_mult = (args.loss_multiplier_laion if "laion" in datas
                     else getattr(args, "loss_multiplier_cc3m", 1.0))
        step_fn = jax.jit(make_pretrain_step(
            model, cfg, tx,
            loss_multiplier_laion=pair_mult,
            loss_multiplier_mmc4=args.loss_multiplier_mmc4,
            mesh=mesh),
            static_argnames=("attend_prev",), donate_argnums=(0,))

        save_dir = os.path.join(args.external_save_dir, args.run_name)
        store = CheckpointStore(save_dir, keep=3)
        start_epoch = 0
        if store.latest_step() is not None:   # epoch resume
            state, meta = store.restore(state)
            start_epoch = meta.get("epoch", 0)

        logger = MetricsLogger(run_name=args.run_name, rank=rank,
                               jsonl_path=os.path.join(save_dir,
                                                       "metrics.jsonl"))
        pyrng = pyrandom.Random(args.seed + rank)
        media_id = cfg.media_token_id
        eoc_id = cfg.eoc_token_id
        pad_id = tokenizer.pad_token_id or 0

        for epoch in range(start_epoch, args.num_epochs):
            for d in datas.values():
                d.dataloader.set_epoch(epoch)
            iters = {t: iter(d.dataloader) for t, d in datas.items()}
            for _ in range(steps_per_epoch):
                batches = {}
                try:
                    for t, it in iters.items():
                        raw = next(it)
                        labels = (interleaved_labels(
                            raw["input_ids"], pad_id, media_id, eoc_id)
                            if t == "mmc4" else pair_labels(
                                raw["input_ids"], pad_id, media_id))
                        batches[t] = shard_batch(mesh, {
                            "vision_x": jnp.asarray(raw["images"]),
                            "input_ids": jnp.asarray(raw["input_ids"]),
                            "attention_mask": jnp.asarray(
                                raw["attention_mask"]),
                            "labels": jnp.asarray(labels)})
                except StopIteration:
                    break
                attend_prev = pyrng.random() < 0.5   # placement augmentation
                state, metrics = step_fn(
                    state, batches.get("laion") or batches.get("cc3m"),
                    batches.get("mmc4"), attend_prev=attend_prev)
                if int(state.step) % args.logging_steps == 0:
                    logger.log(int(state.step), metrics)
            if rank == 0:
                store.save(int(state.step), state,
                           metadata={"epoch": epoch + 1})
    return state


@dataclasses.dataclass
class PretrainArgs:
    """CLI surface of the reference `pipeline/train/pretraining.py`
    argparse (shards, per-source batch sizes and sample counts, loss
    multipliers) on top of the shared TrainArgs-style optimization
    fields."""
    laion_shards: str = ""             # brace syntax: /p/{00000..01234}.tar
    mmc4_shards: str = ""
    cc3m_shards: str = ""
    batch_size_laion: int = 128
    batch_size_mmc4: int = 32
    batch_size_cc3m: int = 128
    train_num_samples_laion: int = 10000
    train_num_samples_mmc4: int = 10000
    train_num_samples_cc3m: int = 10000
    mmc4_textsim_threshold: float = 0.24
    loss_multiplier_laion: float = 0.2
    loss_multiplier_mmc4: float = 1.0
    loss_multiplier_cc3m: float = 1.0  # pretraining_cc3m.py:101
    model_config: str = "mpt1b"
    tokenizer: str = ""
    workers: int = 4
    patch_image_size: int = 224
    batch_size: int = 128
    num_epochs: int = 1
    learning_rate: float = 1e-4
    lr_scheduler: str = "constant"
    warmup_steps: int = 1875           # pretraining.py default
    weight_decay: float = 0.1
    seed: int = 42
    dp: int = 1
    fsdp: int = -1
    tp: int = 1
    precision: str = "bf16"
    multi_host: bool = False
    external_save_dir: str = "runs"
    run_name: str = "flamingo-pretrain"
    logging_steps: int = 100
    # filled in by train()
    rank: int = 0
    world_size: int = 1
    media_token_id: int = -1


def main(argv=None):
    import argparse

    from otter_tpu.config import PRESETS

    p = argparse.ArgumentParser("otter_tpu pretrainer")
    defaults = PretrainArgs()
    for name, f in defaults.__dataclass_fields__.items():
        if name in ("rank", "world_size", "media_token_id"):
            continue
        val = getattr(defaults, name)
        if isinstance(val, bool):
            p.add_argument("--" + name, action="store_true")
        else:
            p.add_argument("--" + name, type=type(val), default=val)
    ns = p.parse_args(argv)
    args = PretrainArgs(**vars(ns))

    if args.multi_host:
        jax.distributed.initialize()
    cfg = PRESETS[args.model_config]().replace(
        use_media_placement_augmentation=True)
    args.model_cfg = cfg
    args.media_token_id = cfg.media_token_id

    types = []
    if args.laion_shards:
        types.append("laion")
    if args.mmc4_shards:
        types.append("mmc4")
    if args.cc3m_shards:
        types.append("cc3m")
    if not types:
        raise SystemExit("provide at least one of --laion_shards/"
                         "--mmc4_shards/--cc3m_shards")

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    tokenizer.add_special_tokens({"additional_special_tokens": [
        "<|endofchunk|>", "<image>"]})
    if tokenizer.pad_token is None:
        tokenizer.add_special_tokens({"pad_token": "<PAD>"})
    return train(args, tokenizer, dataset_types=tuple(types))


if __name__ == "__main__":
    main()
