"""SFT trainer entry point — the reference's
`pipeline/train/instruction_following.py` rebuilt on the TPU mesh:

  accelerate/DeepSpeed launch        -> mesh (dp, fsdp, sp, tp) + pjit step
  subprocess pytest prerun gate      -> yaml_spec.verify_yaml
  model zoo dispatch (:331-427)      -> config factories
  weighted multi-dataloader sampling -> WeightedMultiLoader
  masking()/find_and_remove_tokens   -> data.mimicit helpers
  ZeRO checkpointing                 -> runtime.checkpoint.CheckpointStore

Run (single host): python -m otter_tpu.train.sft --training_data_yaml=...
Multi-host: same command on every host with --multi_host (jax.distributed).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu import config as cfgmod
from otter_tpu.config import OtterConfig, ParallelConfig
from otter_tpu.data import (MimicitDataset, MimicitLoader,
                            WeightedMultiLoader, mask_answer_labels,
                            find_and_remove_tokens, load_yaml,
                            tasks_from_spec, verify_yaml)
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import create_mesh, shard_batch
from otter_tpu.parallel.sharding import shard_params
from otter_tpu.runtime.checkpoint import CheckpointStore
from otter_tpu.runtime.metrics import AverageMeter, MetricsLogger
from otter_tpu.train.args import TrainArgs, parse_args
from otter_tpu.train.step import (TrainState, make_optimizer,
                                  make_train_step, split_params)

CONFIG_FACTORIES = {
    "mpt7b": cfgmod.otter_mpt7b,
    "mpt1b": cfgmod.otter_mpt1b,
    "llama7b-video": cfgmod.otter_llama7b_video,
    "idefics9b": cfgmod.idefics9b,
    "tiny-idefics": cfgmod.idefics_tiny,
    "tiny": lambda: OtterConfig.tiny("mpt"),
}


def build_model_and_config(args: TrainArgs):
    """Model-zoo dispatch (reference instruction_following.py:331-427:
    otter/flamingo/idefics branches)."""
    cfg = CONFIG_FACTORIES[args.model_config]()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.model_name == "idefics":
        from otter_tpu.models.idefics import IdeficsVLM
        if args.customized_config:
            import json
            with open(args.customized_config) as f:
                cfg = cfgmod.IdeficsModelConfig.from_dict(
                    {**cfg.to_dict(), **json.load(f)})
        return IdeficsVLM(cfg, dtype=dtype,
                          remat=args.gradient_checkpointing), cfg
    if args.customized_config:
        import json
        with open(args.customized_config) as f:
            cfg = OtterConfig.from_dict({**cfg.to_dict(), **json.load(f)})
    if args.model_name == "flamingo":
        cfg = cfg.replace(use_media_placement_augmentation=True)
    return OtterVLM(cfg, dtype=dtype,
                    remat=args.gradient_checkpointing), cfg


def build_loaders(args: TrainArgs, cfg: OtterConfig, tokenizer,
                  rank: int, world: int) -> WeightedMultiLoader:
    spec = load_yaml(args.training_data_yaml)
    per_process_batch = max(args.batch_size // max(world, 1), 1)
    loaders: List[MimicitLoader] = []
    for group, tasks in tasks_from_spec(spec).items():
        if not tasks:
            continue
        ds = MimicitDataset(
            tasks, tokenizer, task_group=group,
            instruction_format=args.instruction_format,
            max_seq_len=args.max_seq_len,
            patch_image_size=args.patch_image_size,
            resample_frames_to=args.resample_frames,
            keep_symbols=args.keep_symbols,
            populate_rel_ins=args.populate_rel_ins,
            with_task_description=args.with_task_description,
            device_preprocess=args.device_preprocess,
            seed=args.seed)
        loaders.append(MimicitLoader(
            ds, per_process_batch, seed=args.seed, num_workers=args.workers,
            rank=rank, world_size=world))
    if not loaders:
        raise ValueError("no task groups in the data YAML")
    return WeightedMultiLoader(loaders, seed=args.seed)


def prepare_batch(batch: dict, tokenizer, args: TrainArgs) -> Dict:
    """Collated loader batch -> train-step batch with masked labels."""
    ni = batch["net_input"]
    input_ids = ni["input_ids"]
    attention_mask = ni["attention_masks"]
    answer_id = tokenizer.convert_tokens_to_ids("<answer>")
    eoc_id = tokenizer.convert_tokens_to_ids("<|endofchunk|>")
    labels = mask_answer_labels(
        input_ids, answer_token_id=answer_id, eoc_token_id=eoc_id,
        eos_token_id=tokenizer.eos_token_id)
    if args.remove_answer_token:
        input_ids, labels, attention_mask = find_and_remove_tokens(
            input_ids, labels, attention_mask, answer_id,
            tokenizer.pad_token_id or 0)
    if args.remove_eos_token:
        input_ids, labels, attention_mask = find_and_remove_tokens(
            input_ids, labels, attention_mask, eoc_id,
            tokenizer.pad_token_id or 0)
    return {
        "vision_x": ni["patch_images"],
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels,
    }


def main(args: TrainArgs, tokenizer=None):
    if args.multi_host:
        jax.distributed.initialize()
    rank = jax.process_index()
    world = jax.process_count()

    # pre-run data validation gate (train_utils.py:155-164 behavior)
    verify_yaml(args.training_data_yaml)

    model, cfg = build_model_and_config(args)
    if tokenizer is None:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        tokenizer.add_special_tokens({"additional_special_tokens": [
            "<|endofchunk|>", "<image>", "<answer>"]})
        if tokenizer.pad_token is None:
            tokenizer.add_special_tokens({"pad_token": "<PAD>"})

    mesh = create_mesh(ParallelConfig(dp=args.dp, fsdp=args.fsdp,
                                      sp=getattr(args, "sp", 1),
                                      tp=args.tp))
    multi = build_loaders(args, cfg, tokenizer, rank, world)
    steps_per_epoch = len(multi) // args.gradient_accumulation_steps
    total_steps = max(steps_per_epoch * args.num_epochs, 1)
    warmup = args.warmup_steps
    if args.warmup_steps_ratio is not None:
        warmup = int(args.warmup_steps_ratio * total_steps)

    rng0 = jax.random.PRNGKey(args.seed)
    sample_vision = jnp.zeros(
        (1, 1, 1, 3, args.patch_image_size, args.patch_image_size),
        jnp.float32)
    sample_ids = jnp.zeros((1, 8), jnp.int32)

    with mesh:
        params = jax.jit(model.init)(rng0, sample_vision, sample_ids)
        params = params["params"]
        if args.pretrained_checkpoint or args.trained_ckpt:
            from otter_tpu.models.convert import load_otter_checkpoint
            path = args.trained_ckpt or args.pretrained_checkpoint
            params = load_otter_checkpoint(path, cfg, params)
        params = shard_params(mesh, {"params": params})["params"]

        trainable, _ = split_params(params, cfg)
        tx = make_optimizer(
            trainable, lr=args.learning_rate, schedule=args.lr_scheduler,
            warmup_steps=warmup, total_steps=total_steps,
            weight_decay=args.weight_decay,
            grad_accum_steps=args.gradient_accumulation_steps,
            mu_dtype=jnp.bfloat16 if args.adam_mu_bf16 else None)
        state = TrainState.create(params, cfg, tx)
        # donate the state: XLA otherwise keeps both the argument buffers
        # and the updated trainable+opt alive across the step (measured
        # ~6.3 GB extra temps on the 2.6B Flamingo-MPT-1B)
        step_fn = jax.jit(make_train_step(
            model, cfg, tx, mask_embedding=args.mask_lm_head,
            attend_previous=not cfg.use_media_placement_augmentation,
            fused_ce_chunk=args.fused_ce_chunk,
            mesh=mesh), donate_argnums=(0,))

        save_dir = os.path.join(args.external_save_dir, args.run_name)
        store = CheckpointStore(
            save_dir, keep=1 if args.delete_previous_checkpoint else 3)
        start_epoch = 0
        if args.resume_from_checkpoint:
            state, meta = store.restore(state)
            start_epoch = meta.get("epoch", 0)

        logger = MetricsLogger(
            run_name=args.run_name, report_to_wandb=args.report_to_wandb,
            wandb_project=args.wandb_project, wandb_entity=args.wandb_entity,
            jsonl_path=os.path.join(save_dir, "metrics.jsonl"), rank=rank)
        step_time = AverageMeter()
        data_time = AverageMeter()

        global_step = int(state.step)
        for epoch in range(start_epoch, args.num_epochs):
            multi.set_epoch(epoch)
            end = time.time()
            for batch in multi:
                data_time.update(time.time() - end)
                prepared = prepare_batch(batch, tokenizer, args)
                prepared = shard_batch(mesh, {
                    k: jnp.asarray(v) for k, v in prepared.items()})
                state, metrics = step_fn(state, prepared)
                global_step = int(state.step)
                step_time.update(time.time() - end)
                end = time.time()
                if global_step % args.logging_steps == 0:
                    bsz = prepared["input_ids"].shape[0]
                    logger.log(global_step, {
                        "loss": metrics["loss"],
                        "grad_norm": metrics["grad_norm"],
                        "step_time": step_time.avg,
                        "data_time": data_time.avg,
                        "samples_per_sec": bsz * world / max(
                            step_time.avg, 1e-9),
                        "samples_per_sec_per_chip": bsz * world / max(
                            step_time.avg, 1e-9) / jax.device_count(),
                        "epoch": epoch,
                    })
                if (args.save_steps_interval > 0
                        and global_step % args.save_steps_interval == 0
                        and rank == 0):
                    store.save(global_step, state,
                               metadata={"epoch": epoch},
                               trainable_only=True)
            if args.save_ckpt_each_epoch and rank == 0:
                store.save(global_step, state, metadata={"epoch": epoch + 1},
                           trainable_only=True)

        if rank == 0:
            store.save(global_step, state,
                       metadata={"epoch": args.num_epochs},
                       trainable_only=not args.save_hf_model)
            if args.save_hf_model:
                store.export_hf(
                    state.params, cfg,
                    os.path.join(save_dir, "final_weights.safetensors"))
    return state


if __name__ == "__main__":
    main(parse_args())
