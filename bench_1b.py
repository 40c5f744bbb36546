"""Benchmark: Otter decode throughput on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: greedy decode tokens/sec on the Flamingo-MPT-1B-RedPajama Otter
preset (batch 8, 128-token prompt + 1 image, 128 new tokens) with the jitted
while-loop engine. The reference publishes no numeric baselines
(BASELINE.md), so vs_baseline is reported against the HBM-bandwidth
speed-of-light for this model (bytes moved per decoded token / 819 GB/s on
v5e) — a fixed, hardware-grounded yardstick that later rounds can improve
against.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otter_tpu.config import GenerationConfig, otter_mpt1b
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache, force_sync

    enable_compile_cache()

    cfg = otter_mpt1b()
    model = OtterVLM(cfg, dtype=jnp.bfloat16)

    b, t, f, p, new = 8, 1, 1, 128, 128
    rng = np.random.default_rng(0)
    vision_x = jnp.asarray(rng.standard_normal((b, t, f, 3, 224, 224)),
                           jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 50000, (b, p)), np.int32)
    ids[:, 0] = cfg.media_token_id
    lang_x = jnp.asarray(ids)

    # Weight values are irrelevant for throughput: materialize zeros in bf16
    # directly on device (on-device random init via the tunnel is minutes).
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vision_x,
                            lang_x)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)

    gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                           eos_token_id=-1)
    eng = OtterGenerator(model, params, cfg)
    eng_generate = lambda: eng.generate(vision_x, lang_x, gen=gen)

    out = eng_generate()  # compile + warmup (generate returns np => synced)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eng_generate()
    dt = (time.perf_counter() - t0) / iters
    tokens = b * new
    tps = tokens / dt

    # speed-of-light: every decoded token reads all decode-path params once
    # (vision/perceiver excluded: latents cached) + the KV cache
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    vis_params = sum(
        x.size for k in ("vision_encoder", "perceiver")
        for x in jax.tree_util.tree_leaves(params["params"][k]))
    decode_bytes = (n_params - vis_params) * 2
    cache_len = p + new
    cache_bytes = (cfg.text.num_hidden_layers * 2 * cache_len
                   * cfg.text.hidden_size * 2)
    hbm_bw = 819e9  # v5e
    sol_step = (decode_bytes + b * cache_bytes) / hbm_bw
    sol_tps = b / sol_step

    print(json.dumps({
        "metric": "otter_mpt1b_decode_tokens_per_sec_b8",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / sol_tps, 4),
    }))


if __name__ == "__main__":
    main()
