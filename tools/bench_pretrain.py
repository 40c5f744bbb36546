"""Flamingo pretraining throughput on one real chip: joint LAION+MMC4
step (loss 0.2/1.0) on the Flamingo-MPT-1B preset, samples/sec/chip.
LAION pairs b8 s32 (1 image each) + MMC4 interleaved b2 s256 (up to 5
images) per step — the reference recipe's shape ratio
(pretraining.py batch_size_laion=b*4, max 5 images per MMC4 doc).
Marginal-step methodology, donated state, fused-CE off (the pretrain
step uses the standard loss path).

Usage: bench_pretrain.py [laion_b] [mmc4_b]
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

    from otter_tpu.config import otter_mpt1b
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache
    from otter_tpu.train.pretrain import make_pretrain_step
    from otter_tpu.train.step import (TrainState, make_optimizer,
                                      split_params)

    lb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    enable_compile_cache()
    cfg = otter_mpt1b().replace(use_media_placement_augmentation=True)
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def batch(b, t, s):
        ids = np.asarray(rng.integers(5, 50000, (b, s)), np.int32)
        ids[:, 0] = cfg.media_token_id
        labels = np.where(rng.random((b, s)) < 0.5, ids, -100)
        return {
            "vision_x": jnp.zeros((b, t, 1, 3, 224, 224), jnp.bfloat16),
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((b, s), jnp.int32),
            "labels": jnp.asarray(labels.astype(np.int32)),
        }

    laion = batch(lb, 1, 32)
    mmc4 = batch(mb, 5, 256)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            laion["vision_x"], laion["input_ids"])
    params = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, jnp.bfloat16 if jnp.issubdtype(
            sh.dtype, jnp.floating) else sh.dtype), shapes)["params"]
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-4, total_steps=100)
    state = TrainState.create(params, cfg, tx)
    step = make_pretrain_step(model, cfg, tx)

    holder = {"s": state}

    def build(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, laion, mmc4):
            def body(i, st):
                st, m = step(st, laion, mmc4, attend_prev=True)
                return st
            return lax.fori_loop(0, n, body, state)

        def f():
            st = run(holder["s"], laion, mmc4)
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

    t1, tn = timed(build(1)), timed(build(11))
    dt = (tn - t1) / 10
    samples = lb + mb
    print(f"pretrain step: {dt*1e3:.1f} ms -> "
          f"{samples/dt:.2f} samples/sec/chip "
          f"(laion b{lb} s32 + mmc4 b{mb} s256x5img)")


if __name__ == "__main__":
    main()
