"""Speculative decoding with a REAL trained VLM pair: measured
acceptance on image-grounded generations (round 5, VERDICT r4 #4b).

tools/bench_spec_real.py measures a text-only byte pair; this drives the
pair trained by tools/train_tiny_vlm.py — full OtterVLMs whose xattn
gates are OPEN (the color-grid answers require the image) — so the
measured acceptance covers the vision path: CLIP encode, perceiver,
per-round gated cross-attention in both draft and verify windows.

Prompts are held-out "describe" questions (8-token image-dependent
answers) with eos disabled so the marginal window is wide enough to
measure. Reports b=1 greedy + sampled tok/s per gamma with measured
E[tokens/round] and implied alpha, then the slot pool plain vs spec
aggregate, and finally the ADAPTIVE pool (spec_adaptive=True, shrunken
cadence) to show the controller's chosen mode.

Usage: python tools/bench_spec_vlm.py [--ckpt DIR] [--slots N]
       [--gammas 2 4] [--cpu]
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import numpy as np

from bench_spec_real import implied_alpha  # noqa: E402
from train_tiny_vlm import SEQ, GridTokenizer  # noqa: E402


def load_pair(ckpt_dir):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from otter_tpu.config import OtterConfig
    from otter_tpu.models.otter import OtterVLM

    with open(os.path.join(ckpt_dir, "meta.json")) as f:
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
        with open(os.path.join(ckpt_dir, f"{name}.msgpack"), "rb") as f:
            host = serialization.from_bytes(host, f.read())
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if np.issubdtype(x.dtype, np.floating) else jnp.asarray(x),
            host)
        out[name] = (model, params, cfg)
    return out, meta


def held_out_prompts(ckpt_dir, meta, n):
    """(vx [1,1,1,3,28,28] f32, ids [1,P]) per held-out describe row."""
    from otter_tpu.data.mimicit import MimicitDataset, MimicitTask
    import jax.numpy as jnp

    tok = GridTokenizer()
    data_dir = os.path.join(ckpt_dir, "data")
    ds = MimicitDataset(
        [MimicitTask("GRID", os.path.join(data_dir,
                                          "GRID_instructions.json"),
                     os.path.join(data_dir, "GRID.json"))], tok,
        max_seq_len=SEQ, patch_image_size=28,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    idx = meta.get("eval_desc_idx") or meta["eval_idx"]
    prompts = []
    for i in idx[:n]:
        s = ds[int(i)]
        ids = s["input_ids"]
        # cut right after <answer>: the model generates the description
        from train_tiny_vlm import ANS
        cut = int(np.argmax(ids == ANS)) + 1
        prompts.append((jnp.asarray(s["patch_images"][None],
                                    jnp.bfloat16),
                        np.asarray(ids[None, :cut], np.int32)))
    return prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tiny_vlm")
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
    pair, meta = load_pair(args.ckpt)
    model_t, params_t, cfg_t = pair["target"]
    model_d, params_d, cfg_d = pair["draft"]
    prompts = held_out_prompts(args.ckpt, meta, max(args.slots, 8))
    # pad prompts to one bucket so every request shares compilations
    P = 16
    padded = []
    for vx, ids in prompts:
        row = np.full((1, P), cfg_t.pad_token_id, np.int32)
        row[0, P - ids.shape[1]:] = ids[0]
        m = np.zeros((1, P), np.int32)
        m[0, P - ids.shape[1]:] = 1
        padded.append((vx, row, m))

    # max_seq_len 256: windows 64/192 keep p + new <= 208
    new_short, new_long = 64, 192

    eng = OtterGenerator(model_t, params_t, cfg_t)

    def window_time(fn, new, do_sample=False):
        gen = GenerationConfig(max_new_tokens=new, do_sample=do_sample,
                               temperature=1.0, eos_token_id=-1)
        fn(gen)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(gen)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    vx0, ids0, m0 = padded[0]

    def eng_run(gen):
        np.asarray(eng.generate(vx0, jnp.asarray(ids0),
                                attention_mask=jnp.asarray(m0), gen=gen))

    t_s = window_time(eng_run, new_short)
    t_l = window_time(eng_run, new_long)
    base_tps = (new_long - new_short) / (t_l - t_s)
    print(f"b=1 target-only greedy: {base_tps:.1f} tok/s")

    for do_sample in (False, True):
        mode = "sampled(T=1)" if do_sample else "greedy"
        for g in args.gammas:
            spec = SpeculativeGenerator(model_t, params_t, cfg_t,
                                        model_d, params_d, cfg_d,
                                        gamma=g)
            etoks = rounds = 0

            def spec_run(gen, _spec=spec):
                nonlocal etoks, rounds
                for i, (vx, ids, m) in enumerate(padded[:4]):
                    np.asarray(_spec.generate(
                        vx, jnp.asarray(ids),
                        attention_mask=jnp.asarray(m), gen=gen,
                        rng=jax.random.PRNGKey(100 + i)))
                    etoks += _spec.last_emitted - 1
                    rounds += _spec.last_rounds

            t_s2 = window_time(spec_run, new_short, do_sample)
            etoks = rounds = 0
            t_l2 = window_time(spec_run, new_long, do_sample)
            exp_tok = etoks / max(rounds, 1)
            alpha = implied_alpha(exp_tok, g)
            tps = 4 * (new_long - new_short) / (t_l2 - t_s2)
            print(f"b=1 spec {mode} gamma={g}: {tps:.1f} tok/s "
                  f"({tps / base_tps:.2f}x) | E[tok/round] {exp_tok:.2f}"
                  f" -> alpha {alpha:.3f}")

    # slot pool: plain vs fixed-gamma spec vs ADAPTIVE
    slots = args.slots
    pool_short, pool_long = 32, 160

    def aggregate_rate(batcher):
        ts = {}
        for new in (pool_short, pool_long):
            gen = GenerationConfig(max_new_tokens=new, do_sample=False,
                                   eos_token_id=-1)

            def run_all():
                outs = [batcher.submit(vx, ids, gen)
                        for vx, ids, _ in padded[:slots]]
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
                              cache_len=256, buckets=(P,))
    try:
        pool_base = aggregate_rate(plain)
    finally:
        plain.shutdown()
    print(f"slot pool plain b{slots}: {pool_base:.1f} tok/s aggregate")

    for g in args.gammas:
        pool = ContinuousBatcher(
            model_t, params_t, cfg_t, num_slots=slots, cache_len=256,
            buckets=(P,), draft=(model_d, params_d, cfg_d), spec_gamma=g,
            spec_adaptive=False)
        try:
            rate = aggregate_rate(pool)
        finally:
            pool.shutdown()
        print(f"slot pool spec gamma={g} (pinned): {rate:.1f} tok/s "
              f"aggregate ({rate / pool_base:.2f}x) — REAL acceptance")

    pool = ContinuousBatcher(
        model_t, params_t, cfg_t, num_slots=slots, cache_len=256,
        buckets=(P,), draft=(model_d, params_d, cfg_d),
        spec_gamma=max(args.gammas), spec_adaptive=True)
    pool._replan_every = 8     # shrink cadence for a short bench
    try:
        rate = aggregate_rate(pool)
        st = pool.stats().get("spec", {})
    finally:
        pool.shutdown()
    print(f"slot pool ADAPTIVE: {rate:.1f} tok/s aggregate "
          f"({rate / pool_base:.2f}x) | settled mode "
          f"{st.get('mode')} | accept {st.get('accept_ema_tok_per_round')}"
          f" | iter times {st.get('iter_time_ema_s')}")


if __name__ == "__main__":
    main()
