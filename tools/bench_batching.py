"""Continuous-batching throughput on the real chip: aggregate tok/s for N
concurrent streams vs a single stream (MPT-1B bf16, ~100-token prompt +
64 new tokens), the BENCH_NOTES serving-scalability metric."""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import GenerationConfig, otter_mpt1b
    from otter_tpu.generation.batching import ContinuousBatcher
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    cfg = otter_mpt1b()
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vx = jnp.zeros((1, 1, 1, 3, 224, 224), jnp.bfloat16)
    ids0 = np.asarray(rng.integers(5, 50000, (1, 100)), np.int32)
    ids0[:, 0] = cfg.media_token_id
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vx,
                            jnp.asarray(ids0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if jnp.issubdtype(
            s.dtype, jnp.floating) else s.dtype), shapes)

    new_toks = 64
    gen = GenerationConfig(max_new_tokens=new_toks, do_sample=False,
                           eos_token_id=-1)

    def run(n_streams):
        batcher = ContinuousBatcher(model, params, cfg, num_slots=n_streams,
                                    cache_len=256, buckets=(128,),
                                    cache_dtype=jnp.bfloat16)
        try:
            # warm all jit variants
            list(batcher.submit(vx, ids0, gen))
            reqs = []
            t0 = time.perf_counter()
            for i in range(n_streams):
                ids = np.array(ids0)
                ids[:, 1] = 10 + i
                reqs.append(batcher.submit(vx, ids, gen))
            counts = [sum(1 for _ in r) for r in reqs]
            dt = time.perf_counter() - t0
            stats = batcher.stats()
        finally:
            batcher.shutdown()
        total = sum(counts)
        return total / dt, stats

    tps1, _ = run(1)
    tps4, stats4 = run(4)
    print(f"single stream : {tps1:.1f} tok/s")
    print(f"4 streams     : {tps4:.1f} tok/s aggregate "
          f"({tps4 / tps1:.2f}x single)")
    print(f"stats: ttft_p50={stats4.get('ttft_p50_s', 0)*1e3:.0f} ms "
          f"decode_p50={stats4.get('decode_tok_s_p50', 0):.1f} tok/s/slot")


if __name__ == "__main__":
    main()
