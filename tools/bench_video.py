"""16-frame video QA on OTTER-Video-LLaMA7B (BASELINE.json config #2):
TTFT (CLIP over 16 frames + perceiver + prefill to first token) and
steady-state decode tok/s, int8 weights (llama 7B bf16 exceeds one 16G
v5e), b1, 64-token prompt. Marginal methodology for decode; TTFT as
median wall time minus the ~28.7 ms relay roundtrip."""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

RELAY_MS = 28.7


def main():
    import jax
    import jax.numpy as jnp

    from otter_tpu.config import GenerationConfig, otter_llama7b_video
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    cfg = otter_llama7b_video(max_num_frames=16)
    cfg = cfg.replace(text=cfg.text.replace(quant="int8"))
    model = OtterVLM(cfg, dtype=jnp.bfloat16)

    b, p, frames = 1, 64, 16
    rng = np.random.default_rng(0)
    vision_x = jnp.zeros((b, 1, frames, 3, 224, 224), jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 30000, (b, p)), np.int32)
    ids[:, 0] = cfg.media_token_id
    lang_x = jnp.asarray(ids)

    def mk(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, jnp.int8)
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.zeros(s.shape, s.dtype)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vision_x,
                            lang_x)
    params = jax.tree_util.tree_map(mk, shapes)
    n_gb = sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)) / 1e9
    eng = OtterGenerator(model, params, cfg)

    # TTFT: full vision (16-frame CLIP + perceiver) + prefill + 1 token
    gen1 = GenerationConfig(max_new_tokens=1, do_sample=False,
                            eos_token_id=-1)
    eng.generate(vision_x, lang_x, gen=gen1)   # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.generate(vision_x, lang_x, gen=gen1)
        ts.append(time.perf_counter() - t0)
    ttft = float(np.median(ts)) * 1e3 - RELAY_MS

    # decode: marginal between windows
    def window(new):
        g = GenerationConfig(max_new_tokens=new, do_sample=False,
                             eos_token_id=-1)
        eng.generate(vision_x, lang_x, gen=g)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            eng.generate(vision_x, lang_x, gen=g)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # p=64: 64+72=136 and 64+184=248 both round up to the same 256 cache
    t_s, t_l = window(72), window(184)
    step = (t_l - t_s) / 112
    print(f"otter-video-llama7b int8 ({n_gb:.1f} GB params), 16-frame "
          f"video QA b1 p{p}: TTFT {ttft:.1f} ms, decode "
          f"{1 / step:.1f} tok/s")


if __name__ == "__main__":
    main()
