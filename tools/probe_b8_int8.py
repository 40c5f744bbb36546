"""Stage-wise probe for the b8 long-cache int8-KV engine fault.

The full engine (bench.py OTTER_BENCH_L=1024 OTTER_BENCH_B=8, int8
cache) kills the TPU worker on first execution, while the bare decoder
at the same shapes runs clean and the SAME engine with a bf16 cache
runs clean. Each stage runs in its own process (the crash takes the
worker down):

  python tools/probe_b8_int8.py prefill   — vision+lang prefill into the
                                            int8 cache (quantize+scatter)
  python tools/probe_b8_int8.py step      — prefill + 8 decode steps
                                            (kernel reads real lengths)
  python tools/probe_b8_int8.py loop      — prefill + 200-step while_loop
                                            (the engine's exact regime)

Usage: python tools/probe_b8_int8.py <stage> [b] [L]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import GenerationConfig, otter_mpt7b
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    stage = sys.argv[1]
    nums = [a for a in sys.argv[3:] if a.isdigit()]
    b = int(nums[0]) if nums else 8
    L = int(nums[1]) if len(nums) > 1 else 1024

    cfg = otter_mpt7b()
    cfg = cfg.replace(text=cfg.text.replace(
        quant="int8", decode_kernel="auto"))
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    p = 128
    vision_x = jnp.zeros((b, 1, 1, 3, 224, 224), jnp.bfloat16)
    ids = np.zeros((b, p), np.int32)
    ids[:, 0] = cfg.media_token_id
    lang_x = jnp.asarray(ids)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vision_x,
                            lang_x)

    def mk(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, jnp.int8)
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.zeros(s.shape, s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)
    eng = OtterGenerator(model, params, cfg, cache_dtype="int8")

    if stage == "prefill":
        from otter_tpu.models.decoder import init_cache
        am = jnp.ones((b, p), jnp.int32)

        @jax.jit
        def run(params, vx, lx):
            cache = init_cache(cfg.text, b, L, "int8")
            return eng._prefill(params, vx, lx, am, cache)

        t0 = time.time()
        out = jax.block_until_ready(run(params, vision_x, lang_x))
        print(f"prefill ok, last_logits {np.asarray(out[0]).shape} "
              f"({time.time()-t0:.0f}s)", flush=True)
        return

    n_steps = 8 if stage == "step" else int(sys.argv[2]) if len(sys.argv) > 2 else 200
    gen = GenerationConfig(max_new_tokens=n_steps, do_sample=False,
                           eos_token_id=-1)
    # force the L-slot cache regardless of the window length (generate()
    # would round the cache down to p+max_new)
    fn = eng._build_generate(b, p, L, gen)
    am = jnp.ones((b, p), jnp.int32)
    t0 = time.time()
    out, t = fn(params, vision_x, lang_x, am, jax.random.PRNGKey(0))
    print(f"{stage} ok, out {np.asarray(out).shape} t={int(t)} "
          f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
