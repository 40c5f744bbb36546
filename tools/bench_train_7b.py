"""Single-chip 7B SFT throughput (VERDICT r2 #3): Otter-MPT7B with int8
FROZEN towers on one 16 GB v5e.

Recipe (docs/scaling.md "7B on one chip"):
  - frozen decoder layers (6.44B) int8 weight-only (quantize_params with
    FROZEN_DECODER_PATTERNS); vision tower (0.3B) stays bf16
  - trainable subset (xattn + perceiver + wte, 1.39B) bf16
  - blockwise int8 Adam states (train/opt8.py): 8 -> ~2.06 bytes/param
  - per-layer remat + fused chunked CE + donated TrainState

The reference trains this model on 8xA100 ZeRO-3
(`pipeline/train/instruction_following.py:308-536`,
`accelerate_config_zero3.yaml`); training big models on small devices is
an advertised capability (`docs/huggingface_compatible.md:17-21`).

Usage: bench_train_7b.py [batch] [noremat|no_fused_ce|adam32]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import otter_mpt7b
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.ops.quant import FROZEN_DECODER_PATTERNS, quantize_params
    from otter_tpu.runtime.timing import enable_compile_cache
    from otter_tpu.train.step import (TrainState, make_optimizer,
                                      make_train_step, split_params)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    remat = "noremat" not in sys.argv[2:]
    fused_ce = "no_fused_ce" not in sys.argv[2:]
    state_bits = None if "adam32" in sys.argv[2:] else 8
    enable_compile_cache()
    cfg = otter_mpt7b()
    cfg = cfg.replace(text=cfg.text.replace(quant="int8", quant_xattn=None))
    model = OtterVLM(cfg, dtype=jnp.bfloat16, remat=remat)
    s = 1024
    rng = np.random.default_rng(0)
    vision_x = jnp.zeros((b, 1, 1, 3, 224, 224), jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 50000, (b, s)), np.int32)
    ids[:, 0] = cfg.media_token_id
    ids[:, 4] = (cfg.answer_token_id
                 if cfg.answer_token_id is not None
                 else cfg.eoc_token_id)
    batch = {"vision_x": vision_x,
             "input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((b, s), jnp.int32),
             "labels": jnp.asarray(np.where(
                 rng.random((b, s)) < 0.5, ids, -100).astype(np.int32))}

    # abstract init at the UNQUANTIZED tree, split, then quantize the
    # frozen half — zeros params (throughput bench); int8 leaves stay int8
    bf16_cfg = cfg.replace(text=cfg.text.replace(quant=None))
    shapes = jax.eval_shape(OtterVLM(bf16_cfg, dtype=jnp.bfloat16).init,
                            jax.random.PRNGKey(0), vision_x,
                            batch["input_ids"])
    # HOST-side zeros: the full bf16 tree (16.2 GB) must never touch the
    # 16G chip — quantize on host, push int8 frozen + bf16 trainable only
    params = jax.tree_util.tree_map(
        lambda sh: np.zeros(sh.shape, np.float32 if jnp.issubdtype(
            sh.dtype, jnp.floating) else sh.dtype), shapes)["params"]
    trainable, frozen = split_params(params, cfg)
    frozen = quantize_params(frozen, patterns=FROZEN_DECODER_PATTERNS)
    tobf16 = lambda x: (jnp.asarray(x, jnp.bfloat16)
                        if np.issubdtype(np.asarray(x).dtype, np.floating)
                        else jnp.asarray(x))
    frozen = jax.tree_util.tree_map(tobf16, frozen)
    trainable = jax.tree_util.tree_map(tobf16, trainable)

    tx = make_optimizer(trainable, lr=1e-4, total_steps=100,
                        state_bits=state_bits)
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       frozen=frozen, opt_state=tx.init(trainable))
    step = make_train_step(model, cfg, tx, mask_embedding=True,
                           fused_ce_chunk=256 if fused_ce else 0)

    def count(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t)) / 1e9
    print(f"# frozen {count(frozen):.2f} GB, trainable "
          f"{count(trainable):.2f} GB, opt {count(state.opt_state):.2f} GB",
          file=sys.stderr)

    holder = {"s": state}

    def build(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, batch):
            def body(i, st):
                st, m = step(st, batch)
                return st
            return lax.fori_loop(0, n, body, state)

        def f():
            st = run(holder["s"], batch)
            holder["s"] = st
            np.asarray(st.step)
        return f

    def timed(f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tn = timed(build(1)), timed(build(6))
    dt = (tn - t1) / 5
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"7B frozen-int8 train step: {dt*1e3:.1f} ms -> "
          f"{b/dt:.2f} samples/sec/chip ({b*s/dt/1e3:.1f}k tok/s, "
          f"{n_params/1e9:.2f}B total, b{b} s{s} remat={remat} "
          f"fused_ce={fused_ce} adam_bits={state_bits or 32})")


if __name__ == "__main__":
    main()
