"""Speculative decoding with a REAL trained draft/target pair: measured
acceptance alpha and end-to-end tok/s (VERDICT r3 #3 — replaces the
analytic acceptance curves, whose chip weights were zeros).

Loads the pair trained by tools/train_spec_pair.py (byte-level OtterVLM
LMs over this repo's own sources; target 6L/d256, draft 2L/d128),
prompts with HELD-OUT corpus bytes the models never saw, and measures:

  1. b=1 target-only greedy decode tok/s (baseline),
  2. b=1 speculative greedy tok/s for each gamma, plus the measured
     E[tokens/round] from the device round counter and the implied
     per-token acceptance alpha (E = (1-a^(g+1))/(1-a), bisected),
  3. b=1 sampled (T=1) speculative: measured E[tokens/round]/alpha,
  4. slot-pool: plain ContinuousBatcher vs draft-attached spec pool,
     aggregate marginal tok/s — with real weights the pool's written
     counters advance by the REAL accepted counts, so this is the
     true end-to-end number.

Usage: python tools/bench_spec_real.py [--pair DIR] [--slots N]
       [--gammas 2 4] [--cpu]
"""

import argparse
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from train_spec_pair import MEDIA, SEQ, corpus  # noqa: E402


def implied_alpha(exp_tok: float, g: int) -> float:
    """Invert E[tokens/round] = (1-a^(g+1))/(1-a) by bisection."""
    if exp_tok >= g + 1 - 1e-9:
        return 1.0
    lo, hi = 1e-9, 1.0 - 1e-9
    for _ in range(60):
        mid = (lo + hi) / 2
        e = (1 - mid ** (g + 1)) / (1 - mid)
        lo, hi = (mid, hi) if e < exp_tok else (lo, mid)
    return (lo + hi) / 2


def load_pair(pair_dir):
    import json
    import os

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM

    with open(os.path.join(pair_dir, "pair.json")) as f:
        meta = json.load(f)
    out = {}
    for name in ("target", "draft"):
        cfg = OtterConfig.from_dict(meta[name])
        model = OtterVLM(cfg, dtype=jnp.bfloat16)
        vx = jnp.zeros((1, 1, 1, 3, 28, 28), jnp.bfloat16)
        probe = jnp.zeros((1, SEQ), jnp.int32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vx,
                                probe)
        host = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        with open(os.path.join(pair_dir, f"{name}.msgpack"), "rb") as f:
            host = serialization.from_bytes(host, f.read())
        # params were trained in f32; serve in bf16 like production
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if np.issubdtype(x.dtype, np.floating) else jnp.asarray(x),
            host)
        out[name] = (model, params, cfg)
    return out, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="checkpoints/spec_pair")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--gammas", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from otter_tpu.config import GenerationConfig
    from otter_tpu.generation.batching import ContinuousBatcher
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.generation.speculative import SpeculativeGenerator
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    pair, meta = load_pair(args.pair)
    model_t, params_t, cfg_t = pair["target"]
    model_d, params_d, cfg_d = pair["draft"]

    data = corpus()
    held = data[meta["holdout_start"]:]
    p = 64
    rng = np.random.default_rng(7)
    starts = rng.integers(0, len(held) - p, max(args.slots, 8))
    prompts = []
    for s in starts:
        ids = np.empty((1, p), np.int32)
        ids[0, 0] = MEDIA
        ids[0, 1:] = held[s:s + p - 1]
        prompts.append(ids)
    vx = jnp.zeros((1, 1, 1, 3, 28, 28), jnp.bfloat16)

    # tiny models decode in ~1 ms/step, so the marginal window must be
    # wide enough that (t_long - t_short) >> relay jitter (~10 ms);
    # 896 keeps p + new + gamma + 2 within the pair's max_seq_len 1024
    new_short, new_long = 128, 896

    # ── 1. b=1 target-only greedy baseline ──────────────────────────
    eng = OtterGenerator(model_t, params_t, cfg_t)

    def window_time(fn, new, do_sample=False):
        gen = GenerationConfig(max_new_tokens=new, do_sample=do_sample,
                               temperature=1.0, eos_token_id=-1)
        fn(gen)                        # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(gen)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def eng_run(gen):
        np.asarray(eng.generate(vx, jnp.asarray(prompts[0]), gen=gen))

    t_s = window_time(eng_run, new_short)
    t_l = window_time(eng_run, new_long)
    base_tps = (new_long - new_short) / (t_l - t_s)
    print(f"b=1 target-only greedy: {base_tps:.1f} tok/s "
          f"({1e3 / base_tps:.2f} ms/tok marginal)")

    # ── 2/3. b=1 speculative, greedy + sampled ──────────────────────
    for do_sample in (False, True):
        mode = "sampled(T=1)" if do_sample else "greedy"
        for g in args.gammas:
            spec = SpeculativeGenerator(model_t, params_t, cfg_t,
                                        model_d, params_d, cfg_d,
                                        gamma=g)
            etoks, rounds = 0, 0

            def spec_run(gen, _spec=spec):
                nonlocal etoks, rounds
                for i, ids in enumerate(prompts[:4]):
                    np.asarray(_spec.generate(
                        vx, jnp.asarray(ids), gen=gen,
                        rng=jax.random.PRNGKey(100 + i)))
                    etoks += _spec.last_emitted - 1   # tok0 is prefill's
                    rounds += _spec.last_rounds

            t_s2 = window_time(spec_run, new_short, do_sample)
            etoks, rounds = 0, 0
            t_l2 = window_time(spec_run, new_long, do_sample)
            # telemetry accumulated over warm+3 timed long windows
            exp_tok = etoks / max(rounds, 1)
            alpha = implied_alpha(exp_tok, g)
            tps = 4 * (new_long - new_short) / (t_l2 - t_s2)
            print(f"b=1 spec {mode} gamma={g}: {tps:.1f} tok/s "
                  f"({tps / base_tps:.2f}x) | measured E[tok/round] "
                  f"{exp_tok:.2f} -> alpha {alpha:.3f}")

    # ── 4. slot pool: plain vs spec, real acceptance ────────────────
    slots = args.slots

    pool_short, pool_long = 32, 160

    def aggregate_rate(batcher):
        ts = {}
        for new in (pool_short, pool_long):
            gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                                   eos_token_id=-1)

            def run_all():
                outs = [batcher.submit(vx, ids, gen)
                        for ids in prompts[:slots]]
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

            run_all()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_all()
                runs.append(time.perf_counter() - t0)
            ts[new] = float(np.median(runs))
        return slots * (pool_long - pool_short) / (ts[pool_long]
                                                   - ts[pool_short])

    plain = ContinuousBatcher(model_t, params_t, cfg_t, num_slots=slots,
                              cache_len=256, buckets=(p,))
    try:
        pool_base = aggregate_rate(plain)
    finally:
        plain.shutdown()
    print(f"slot pool plain b{slots}: {pool_base:.1f} tok/s aggregate")

    for g in args.gammas:
        pool = ContinuousBatcher(
            model_t, params_t, cfg_t, num_slots=slots, cache_len=256,
            buckets=(p,), draft=(model_d, params_d, cfg_d), spec_gamma=g)
        try:
            rate = aggregate_rate(pool)
        finally:
            pool.shutdown()
        print(f"slot pool spec gamma={g}: {rate:.1f} tok/s aggregate "
              f"({rate / pool_base:.2f}x) — REAL acceptance")


if __name__ == "__main__":
    main()
