"""Flagship benchmark: Otter-MPT7B with int8 weight-only decoder on ONE
v5e chip (bf16 needs 16.6GB and does not fit; int8 is 9.8GB).

Prints one JSON line like bench.py (kept separate so the driver's stable
round-over-round metric remains the MPT-1B preset in bench.py).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otter_tpu.config import GenerationConfig, otter_mpt7b
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    cfg = otter_mpt7b()
    cfg = cfg.replace(text=cfg.text.replace(quant="int8"))
    model = OtterVLM(cfg, dtype=jnp.bfloat16)

    b, p, new = 8, 128, 128
    rng = np.random.default_rng(0)
    vision_x = jnp.zeros((b, 1, 1, 3, 224, 224), jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 50000, (b, p)), np.int32)
    ids[:, 0] = cfg.media_token_id

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vision_x,
                            jnp.asarray(ids))

    def mk(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, jnp.int8)
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.zeros(s.shape, s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)
    eng = OtterGenerator(model, params, cfg)
    gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                           eos_token_id=-1)
    out = eng.generate(vision_x, jnp.asarray(ids), gen=gen)  # compile/warm
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eng.generate(vision_x, jnp.asarray(ids), gen=gen)
    dt = (time.perf_counter() - t0) / iters
    tps = b * new / dt

    # speed-of-light: int8 decoder kernels + bf16 rest + KV cache per token
    n_int8 = sum(x.size for x in jax.tree_util.tree_leaves(params)
                 if x.dtype == jnp.int8)
    n_bf16 = sum(x.size for x in jax.tree_util.tree_leaves(params)
                 if x.dtype == jnp.bfloat16)
    vis = sum(x.size for kk in ("vision_encoder", "perceiver")
              for x in jax.tree_util.tree_leaves(params["params"][kk]))
    decode_bytes = n_int8 + (n_bf16 - vis) * 2
    cache_len = p + new
    cache_bytes = (cfg.text.num_hidden_layers * 2 * cache_len
                   * cfg.text.hidden_size * 2)
    sol_tps = b / ((decode_bytes + b * cache_bytes) / 819e9)
    print(json.dumps({
        "metric": "otter_mpt7b_int8_decode_tokens_per_sec_b8",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / sol_tps, 4),
    }))


if __name__ == "__main__":
    main()
