"""SFT training throughput on one real chip: samples/sec/chip for the
Flamingo-MPT-1B preset (the BASELINE.json training north-star metric).
s=1024, 1 image/sample, bf16 params, full train step (fwd+bwd+AdamW
with the reference freezing policy). Marginal-step methodology.

Usage: bench_train.py [batch] [remat]   (e.g. `bench_train.py 8 remat`)
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
    from otter_tpu.train.step import (TrainState, make_optimizer,
                                      make_train_step, split_params)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = "remat" in sys.argv[2:]
    mu_bf16 = "mu_bf16" in sys.argv[2:]
    fused_ce = "fused_ce" in sys.argv[2:]
    enable_compile_cache()
    cfg = otter_mpt1b()
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

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            vision_x, batch["input_ids"])
    params = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, jnp.bfloat16 if jnp.issubdtype(
            sh.dtype, jnp.floating) else sh.dtype), shapes)["params"]
    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-4, total_steps=100,
                        mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    state = TrainState.create(params, cfg, tx)
    step = make_train_step(model, cfg, tx, mask_embedding=True,
                           fused_ce_chunk=256 if fused_ce else 0)

    # donate the state: without it XLA keeps BOTH the argument buffers and
    # the loop-carried updated trainable+opt (~6.3 GB extra HLO temps on
    # this 2.6B model — the difference between fitting a 16G v5e or not).
    # The returned state is threaded into the next call.
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
            np.asarray(st.step)          # force the readback
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
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"train step: {dt*1e3:.1f} ms  ->  {b/dt:.2f} samples/sec/chip "
          f"({b*s/dt/1e3:.0f}k tok/s, {n_params/1e9:.2f}B params, "
          f"b{b} s{s} remat={remat} mu_bf16={mu_bf16} "
          f"fused_ce={fused_ce})")


if __name__ == "__main__":
    main()
