"""SFT training step: freezing policy, loss, optimizer, pjit-sharded step.

Reproduces the reference training semantics
(`pipeline/train/instruction_following.py:73-251`, `train_utils.py:167-183`):

  - freezing policy: train only perceiver + gated-xattn blocks + input
    embeddings (+ lm_head for untied decoders) — `init_weights`,
    modeling_otter.py:875-915. Frozen params get no gradients and no
    optimizer state (cf. SURVEY.md §7 hard part #7).
  - weight decay only on gated-xattn weights, not gates/norms/biases
    (`get_grouped_params`, train_utils.py:167-183)
  - causal-LM loss with -100 label masking (HF shift-by-one convention)
  - optional embedding-row gradient masking: only special-token rows of the
    embedding train (`mask_embedding`, instruction_following.py:228-244)
  - grad clipping at 1.0, constant/linear/cosine schedules with warmup
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from otter_tpu.config import OtterConfig


def path_is_trainable(path: str, text_tied: bool,
                      idefics: bool = False) -> bool:
    parts = path.split("/")
    if "perceiver" == parts[0]:
        return True
    if any(p.startswith("xattn_") for p in parts):
        return True
    # LoRA adapters train (modeling_otter.py:895-898)
    if parts[-1] in ("lora_a", "lora_b"):
        return True
    if idefics:
        # idefics decoupled design: the frozen base embedding/lm_head stay
        # frozen; only the additional-vocab halves train
        # (IdeficsDecoupledEmbedding/Linear, freeze_text_layers=True)
        return parts[0] in ("additional_embedding", "additional_fc")
    if parts[-2:] and "wte" in parts:
        return True
    if not text_tied and "lm_head" in parts:
        return True
    return False


def split_params(params: Dict, cfg) -> Tuple[Dict, Dict]:
    """-> (trainable, frozen) param dicts (both flat-unflattened trees).
    `cfg` is an OtterConfig or IdeficsModelConfig (detected by the
    decoupled-vocab field)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    tied = cfg.text.tie_embeddings
    idefics = hasattr(cfg, "additional_vocab_size")
    train = {k: v for k, v in flat.items()
             if path_is_trainable(k, tied, idefics)}
    frozen = {k: v for k, v in flat.items()
              if not path_is_trainable(k, tied, idefics)}
    return (traverse_util.unflatten_dict(train, sep="/"),
            traverse_util.unflatten_dict(frozen, sep="/"))


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen, sep="/"))
    flat.update(traverse_util.flatten_dict(trainable, sep="/"))
    return traverse_util.unflatten_dict(flat, sep="/")


def weight_decay_mask(trainable: Dict) -> Dict:
    """True only for gated-xattn weights that are not gates/norms/biases
    (train_utils.py:167-183)."""
    flat = traverse_util.flatten_dict(trainable, sep="/")

    def decay(path):
        parts = path.split("/")
        in_xattn = any(p.startswith("xattn_") for p in parts)
        is_excluded = any(("gate" in p and "gate_proj" not in p)
                          or "norm" in p or p == "bias" for p in parts)
        return in_xattn and not is_excluded

    mask = {k: decay(k) for k in flat}
    return traverse_util.unflatten_dict(mask, sep="/")


def make_schedule(name: str, lr: float, warmup_steps: int,
                  total_steps: int) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    if name == "constant":
        rest = optax.constant_schedule(lr)
    elif name == "linear":
        rest = optax.linear_schedule(lr, 0.0,
                                     max(total_steps - warmup_steps, 1))
    elif name == "cosine":
        rest = optax.cosine_decay_schedule(
            lr, max(total_steps - warmup_steps, 1))
    else:
        raise ValueError(f"unknown schedule {name!r}")
    return optax.join_schedules([warmup, rest], [warmup_steps])


def make_optimizer(trainable: Dict, *, lr: float = 1e-5,
                   schedule: str = "constant", warmup_steps: int = 0,
                   total_steps: int = 10000, weight_decay: float = 0.1,
                   grad_clip: float = 1.0, grad_accum_steps: int = 1,
                   mu_dtype=None,
                   state_bits: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """mu_dtype=jnp.bfloat16 stores Adam's first moment in bf16 — 25% off
    the optimizer-state footprint (4 bytes/param saved), the standard
    memory/precision trade on HBM-limited chips; the variance stays f32.

    state_bits=8 switches to blockwise int8 Adam states (train/opt8.py) —
    8 -> ~2.06 bytes/param, the enabler for single-chip 7B SFT."""
    sched = make_schedule(schedule, lr, warmup_steps, total_steps)
    if state_bits == 8:
        from otter_tpu.train.opt8 import scale_by_adam8
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            scale_by_adam8(b1=0.9, b2=0.95, eps=1e-8),
            optax.add_decayed_weights(weight_decay,
                                      mask=weight_decay_mask(trainable)),
            optax.scale_by_learning_rate(sched),
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(sched, b1=0.9, b2=0.95, eps=1e-8,
                        weight_decay=weight_decay, mu_dtype=mu_dtype,
                        mask=weight_decay_mask(trainable)),
        )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, grad_accum_steps)
    return tx


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF convention: predict labels[t+1] from logits[t]; -100 = ignored.
    Returns (mean loss, token count)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != -100
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n, n


def chunked_causal_lm_loss(hidden: jnp.ndarray, head: jnp.ndarray,
                           labels: jnp.ndarray, *, tied: bool = True,
                           logit_scale=None, chunk: int = 256
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cross-entropy over final hidden states: the [B, S, V] logits
    (and their tangent) are never materialized — each scan iteration
    projects one `chunk`-token slice against the head weights and the
    checkpointed body recomputes it in the backward pass. At b4 s1024
    V=50k this removes 2x394 MB bf16 HLO temps from the train step, the
    largest single activations in the graph.

    hidden [B, S, D] = final-norm decoder output (model skip_head=True);
    head = embedding [V, D] when tied else lm_head kernel [D, V]. Same
    math/shift convention as `causal_lm_loss`.
    """
    from jax import lax

    h = hidden[:, :-1]
    targets = labels[:, 1:]
    b, s, d = h.shape
    n = -(-s // chunk)
    pad = n * chunk - s
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)),
                          constant_values=-100)

    @jax.checkpoint
    def body(carry, i):
        hc = lax.dynamic_slice_in_dim(h, i * chunk, chunk, axis=1)
        tc = lax.dynamic_slice_in_dim(targets, i * chunk, chunk, axis=1)
        logits = (jnp.einsum("bsd,vd->bsv", hc, head) if tied
                  else jnp.einsum("bsd,dv->bsv", hc, head))
        if logit_scale is not None:
            logits = logits * logit_scale
        logits = logits.astype(jnp.float32)
        valid = tc != -100
        safe = jnp.where(valid, tc, 0)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, safe[..., None], -1)[..., 0]
        nll = jnp.where(valid, lse - tgt, 0.0)
        acc_l, acc_n = carry
        return (acc_l + jnp.sum(nll),
                acc_n + jnp.sum(valid.astype(jnp.int32))), None

    (total, count), _ = lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        jnp.arange(n))
    n_tok = jnp.maximum(count, 1)
    return total / n_tok, n_tok


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Dict
    frozen: Dict
    opt_state: Any

    @classmethod
    def create(cls, params: Dict, cfg: OtterConfig,
               tx: optax.GradientTransformation) -> "TrainState":
        trainable, frozen = split_params(params, cfg)
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable,
                   frozen=frozen, opt_state=tx.init(trainable))

    @property
    def params(self) -> Dict:
        return merge_params(self.trainable, self.frozen)


def embedding_grad_mask(cfg: OtterConfig) -> Optional[jnp.ndarray]:
    """Row mask for the embedding gradient: only the <answer> row trains
    (`mask_embedding`, instruction_following.py:228-238 — media/eoc rows are
    commented out in the reference). None disables."""
    ids = [cfg.answer_token_id if cfg.answer_token_id is not None
           else cfg.eoc_token_id]
    v = cfg.text.total_vocab
    mask = jnp.zeros((v, 1), jnp.float32)
    return mask.at[jnp.asarray(ids)].set(1.0)


def make_train_step(model, cfg: OtterConfig,
                    tx: optax.GradientTransformation,
                    *, mask_embedding: bool = False,
                    attend_previous: bool = True,
                    fused_ce_chunk: int = 0,
                    mesh=None):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {vision_x [B,T,F,C,H,W], input_ids [B,S], attention_mask [B,S],
            labels [B,S]} — the collated net_input of the reference
    (`mimicit_dataset.py:510-549`) plus masked labels.

    fused_ce_chunk > 0 routes the loss through `chunked_causal_lm_loss`
    (model forward with skip_head=True; the full-vocab logits are never
    materialized).

    mesh: pass the training Mesh to enable sequence-parallel (ring)
    self-attention when its "seq" axis is > 1 (ParallelConfig.sp) —
    activations shard along S, KV blocks rotate over ICI
    (ops/ring_attention.py). No-op on sp=1 meshes.
    """
    import contextlib

    from otter_tpu.ops.attention import sequence_parallel

    emb_mask = embedding_grad_mask(cfg) if mask_embedding else None
    tcfg = cfg.text

    def sp_ctx():
        return (sequence_parallel(mesh) if mesh is not None
                else contextlib.nullcontext())

    def loss_fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        with sp_ctx():
            return _loss_body(params, batch)

    def _loss_body(params, batch):
        if fused_ce_chunk:
            hidden, _, _ = model.apply(
                {"params": params}, batch["vision_x"], batch["input_ids"],
                attention_mask=batch["attention_mask"],
                attend_previous=attend_previous, skip_head=True)
            dec = params["lang_encoder"]
            head = (dec["wte"]["embedding"] if tcfg.tie_embeddings
                    else dec["lm_head"]["kernel"])
            loss, n = chunked_causal_lm_loss(
                hidden, head, batch["labels"], tied=tcfg.tie_embeddings,
                logit_scale=tcfg.logit_scale, chunk=fused_ce_chunk)
        else:
            logits, _, _ = model.apply(
                {"params": params}, batch["vision_x"], batch["input_ids"],
                attention_mask=batch["attention_mask"],
                attend_previous=attend_previous)
            loss, n = causal_lm_loss(logits, batch["labels"])
        return loss, {"loss": loss, "tokens": n}

    def step(state: TrainState, batch, rng=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch)
        if emb_mask is not None:
            flat = traverse_util.flatten_dict(grads, sep="/")
            for k in list(flat):
                if k.endswith("wte/embedding"):
                    flat[k] = flat[k] * emb_mask.astype(flat[k].dtype)
            grads = traverse_util.unflatten_dict(flat, sep="/")
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(metrics,
                       grad_norm=optax.global_norm(grads))
        return dataclasses.replace(state, step=state.step + 1,
                                   trainable=trainable,
                                   opt_state=opt_state), metrics

    return step
