"""Speculative decoding bench: Otter-MPT7B target + Flamingo-MPT-1B
draft (shared gpt-neox vocab), both int8, b=1, on one chip.

What is measured vs what is derived — and why this is honest with
zero-valued weights: a speculative ROUND (gamma draft steps + one
(gamma+1)-token verify + accept bookkeeping) has STATIC shapes, so its
wall time does not depend on how many proposals are accepted.
Zero weights make every argmax agree (full acceptance), which is the
configuration we can build without real checkpoints — we measure
  (a) the vanilla 7B b1 decode step (the baseline),
  (b) the spec round time per gamma (end-to-end, marginal window
      method), and
  (c) the implied tokens/round at full acceptance (cross-checked
      against the end-to-end tok/s),
then report tok/s as a function of the per-token acceptance rate
alpha — E[tokens/round] = (1 - alpha^(gamma+1)) / (1 - alpha) — which
is determined by model quality, not by this bench. The break-even
alpha is printed per gamma.

Usage: bench_speculative.py [p] [gammas...]   (default 128, 2 4 8)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def zero_params(model, *args):
    import jax
    import jax.numpy as jnp
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)

    def mk(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, jnp.int8)
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map(mk, shapes)


def main():
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import (GenerationConfig, otter_mpt1b,
                                  otter_mpt7b)
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.generation.speculative import SpeculativeGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    gammas = [int(x) for x in sys.argv[2:]] or [2, 4, 8]

    cfg_t = otter_mpt7b()
    cfg_t = cfg_t.replace(text=cfg_t.text.replace(quant="int8"))
    cfg_d = otter_mpt1b()
    cfg_d = cfg_d.replace(text=cfg_d.text.replace(quant="int8"))
    model_t = OtterVLM(cfg_t, dtype=jnp.bfloat16)
    model_d = OtterVLM(cfg_d, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    vx = jnp.zeros((1, 1, 1, 3, 224, 224), jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 50000, (1, p)), np.int32)
    ids[:, 0] = cfg_t.media_token_id
    lang_x = jnp.asarray(ids)
    params_t = zero_params(model_t, vx, lang_x)
    params_d = zero_params(model_d, vx, lang_x)

    new_short, new_long = 16, 112   # same rounded cache length

    def window_rate(gen_fn):
        """Marginal tokens/sec between two window sizes."""
        ts = {}
        for new in (new_short, new_long):
            gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                                   eos_token_id=-1)
            gen_fn(gen)       # compile + warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                gen_fn(gen)
                runs.append(time.perf_counter() - t0)
            ts[new] = float(np.median(runs))
        return (new_long - new_short) / (ts[new_long] - ts[new_short])

    eng = OtterGenerator(model_t, params_t, cfg_t)
    base = window_rate(lambda gen: eng.generate(vx, lang_x, gen=gen))
    print(f"vanilla 7B int8 b1: {base:.1f} tok/s "
          f"({1e3 / base:.2f} ms/tok)")

    for g in gammas:
        sg = SpeculativeGenerator(model_t, params_t, cfg_t,
                                  model_d, params_d, cfg_d, gamma=g)
        rate = window_rate(lambda gen: sg.generate(vx, lang_x, gen=gen))
        # zero weights => full acceptance => g+1 tokens per round
        round_ms = (g + 1) / rate * 1e3
        print(f"gamma={g}: full-accept {rate:.1f} tok/s "
              f"({rate / base:.2f}x), round {round_ms:.2f} ms")
        alphas = [0.5, 0.7, 0.8, 0.9, 1.0]
        parts = []
        for a in alphas:
            exp_tok = (g + 1) if a == 1.0 else \
                (1 - a ** (g + 1)) / (1 - a)
            tps = exp_tok / (round_ms / 1e3)
            parts.append(f"a={a}: {tps:.0f}")
        print(f"  tok/s vs acceptance: {', '.join(parts)}")
        # acceptance needed to beat vanilla: exp_tok(alpha*) = round/base
        need = round_ms / (1e3 / base)
        print(f"  break-even E[tokens/round] = {need:.2f}")


if __name__ == "__main__":
    main()
