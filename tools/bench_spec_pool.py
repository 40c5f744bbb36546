"""Slot-pool speculative decoding bench: Otter-MPT7B target +
Flamingo-MPT-1B draft (shared gpt-neox vocab), both int8, through the
ContinuousBatcher with a FULL slot pool on one chip.

Honesty model matches tools/bench_speculative.py: a batched speculative
round has STATIC shapes, so its wall time does not depend on acceptance.
Zero weights make every argmax agree (full acceptance); we measure
  (a) the plain batcher's aggregate marginal tok/s at the same
      concurrency (the baseline every slot-pool request gets today),
  (b) the spec pool's aggregate marginal tok/s at full acceptance per
      gamma (= B * (gamma+1) / round),
then derive aggregate tok/s as a function of per-token acceptance alpha
(E[tokens/round/row] = (1-alpha^(gamma+1))/(1-alpha)) and print the
break-even alpha per gamma. Unlike b=1 speculation (a latency tool),
the pool amortizes the target's weight read over B*(gamma+1) tokens per
verify — the verify window is nearly free while decode is memory-bound,
so break-even acceptance is LOW.

Usage: bench_spec_pool.py [slots] [gammas...]   (default 8, 2 4)
"""

import sys
import threading
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from bench_speculative import zero_params  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import (GenerationConfig, otter_mpt1b,
                                  otter_mpt7b)
    from otter_tpu.generation.batching import ContinuousBatcher
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    gammas = [int(x) for x in sys.argv[2:]] or [2, 4]

    cfg_t = otter_mpt7b()
    cfg_t = cfg_t.replace(text=cfg_t.text.replace(quant="int8"))
    cfg_d = otter_mpt1b()
    cfg_d = cfg_d.replace(text=cfg_d.text.replace(quant="int8"))
    model_t = OtterVLM(cfg_t, dtype=jnp.bfloat16)
    model_d = OtterVLM(cfg_d, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    p = 100
    vx = np.zeros((1, 1, 1, 3, 224, 224), np.float32)
    prompts = []
    for _ in range(slots):
        ids = np.asarray(rng.integers(5, 50000, (1, p)), np.int32)
        ids[:, 0] = cfg_t.media_token_id
        prompts.append(ids)
    probe = jnp.asarray(prompts[0])
    params_t = zero_params(model_t, jnp.asarray(vx, jnp.bfloat16), probe)
    params_d = zero_params(model_d, jnp.asarray(vx, jnp.bfloat16), probe)

    new_short, new_long = 16, 48

    def aggregate_rate(batcher):
        """Marginal aggregate tok/s between two max_new windows, all
        slots busy the whole time (same prompts, simultaneous submit)."""
        ts = {}
        for new in (new_short, new_long):
            gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                                   eos_token_id=-1)

            def run_all():
                outs = [batcher.submit(vx, ids, gen) for ids in prompts]
                done = [None] * slots

                def drain(i, s):
                    done[i] = sum(1 for _ in s)

                th = [threading.Thread(target=drain, args=(i, s))
                      for i, s in enumerate(outs)]
                for t in th:
                    t.start()
                for t in th:
                    t.join(timeout=3000)
                assert all(d == new for d in done), done

            run_all()             # compile + warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_all()
                runs.append(time.perf_counter() - t0)
            ts[new] = float(np.median(runs))
        return slots * (new_long - new_short) / (ts[new_long]
                                                 - ts[new_short])

    plain = ContinuousBatcher(model_t, params_t, cfg_t, num_slots=slots,
                              cache_len=256, buckets=(128,))
    try:
        base = aggregate_rate(plain)
    finally:
        plain.shutdown()
    print(f"plain pool 7B int8 b{slots}: {base:.1f} tok/s aggregate "
          f"({slots * 1e3 / base:.2f} ms/iter)")

    for g in gammas:
        pool = ContinuousBatcher(
            model_t, params_t, cfg_t, num_slots=slots, cache_len=256,
            buckets=(128,), draft=(model_d, params_d, cfg_d),
            spec_gamma=g)
        try:
            rate = aggregate_rate(pool)
        finally:
            pool.shutdown()
        round_ms = slots * (g + 1) / rate * 1e3
        print(f"gamma={g}: full-accept {rate:.1f} tok/s aggregate "
              f"({rate / base:.2f}x), round {round_ms:.2f} ms")
        parts = []
        for a in (0.5, 0.7, 0.8, 0.9, 1.0):
            exp_tok = (g + 1) if a == 1.0 else \
                (1 - a ** (g + 1)) / (1 - a)
            parts.append(f"a={a}: {slots * exp_tok / (round_ms / 1e3):.0f}")
        print(f"  aggregate tok/s vs acceptance: {', '.join(parts)}")
        need = (round_ms / 1e3) * base / slots
        print(f"  break-even E[tokens/round/row] = {need:.2f}")


if __name__ == "__main__":
    main()
