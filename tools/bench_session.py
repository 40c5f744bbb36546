"""Cross-turn KV session cache bench: TTFT per chat turn, session reuse
vs stateless full re-prefill, on the 7B int8 flagship.

Simulates a growing conversation: turn k's prompt is turn k-1's prompt
+ the emitted reply + `new_tok` fresh user tokens. The stateless path
re-prefills the whole history every turn (the reference worker's
behavior, `pipeline/serve/model_worker.py:181`); the session path
prefills only the unseen suffix (one bucketed decode window).

TTFT here = time from request to the first decoded token (prefill or
window + one sampling step), measured wall-clock around the generator's
first `next()` with everything jitted and warmed: the compile cost is
excluded by running each distinct shape once beforehand, matching how a
long-lived worker behaves.

Usage: bench_session.py [turns] [hist0] [new_tok] [reply_tok]
       (defaults 4 256 24 48)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import GenerationConfig, otter_mpt7b
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.generation.session import ChatSession
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hist0 = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    new_tok = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    reply_tok = int(sys.argv[4]) if len(sys.argv) > 4 else 48

    cfg = otter_mpt7b()
    cfg = cfg.replace(text=cfg.text.replace(quant="int8",
                                            decode_kernel="auto"))
    model = OtterVLM(cfg, dtype=jnp.bfloat16)

    # zero int8 weights at the real shapes (bandwidth physics only)
    load_cfg = cfg.replace(text=cfg.text.replace(quant=None))
    load_model = OtterVLM(load_cfg, dtype=jnp.bfloat16)
    vx = jnp.zeros((1, 1, 1, 3, 224, 224), jnp.bfloat16)
    probe = jnp.zeros((1, 8), jnp.int32)
    # zeros directly at the QUANT shapes (int8 kernels + scales) — never
    # device-materialize the full bf16/f32 tree first (33 GB f32 on a
    # 16 GB chip; BENCH_NOTES "7B SFT" OOM forensics, bench.py pattern)
    del load_model
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vx, probe)

    def mk(s):
        if s.dtype == jnp.int8:
            return jnp.zeros(s.shape, jnp.int8)
        if jnp.issubdtype(s.dtype, jnp.floating):
            # preserve the checkpoint dtype (norm/quant scale leaves are
            # f32 in real checkpoints; a blanket bf16 downcast changes
            # the compiled program's dtype layout vs production serving
            # -- advisor r4)
            return jnp.zeros(s.shape, s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)

    rng = np.random.default_rng(0)

    def make_prompt(n):
        ids = np.asarray(rng.integers(5, 50000, (1, n)), np.int32)
        ids[:, 0] = cfg.media_token_id
        return ids

    gen = GenerationConfig(max_new_tokens=reply_tok, do_sample=False,
                           eos_token_id=-1)
    cache_len = 2048
    engine = OtterGenerator(model, params, cfg)
    sess = ChatSession(model, params, cfg, cache_len=cache_len,
                       prompt_bucket=128, window_bucket=64)

    # warm pass builds the conversation from the session's OWN greedy
    # replies (deterministic, so the measured replay reuses them — the
    # realistic chat pattern where only the new user turn is unseen)
    prompts, prompt = [], make_prompt(hist0)
    for _ in range(turns):
        prompts.append(prompt)
        got = list(sess.stream(vx, prompt, gen=gen))   # compile + warm
        assert len(got) == reply_tok
        prompt = np.concatenate(
            [prompt, np.asarray([got], np.int32), make_prompt(new_tok)],
            axis=1)
    sess.reset()

    def ttft(stream_factory):
        """[(ttft_ms, total_ms)] per turn, warmed."""
        out = []
        for ids in prompts:
            for attempt in range(2):      # 0: compile/warm, 1: measure
                t0 = time.perf_counter()
                it = stream_factory(ids)
                next(it)
                t1 = time.perf_counter()
                n = 1 + sum(1 for _ in it)
                t2 = time.perf_counter()
                assert n == reply_tok
            out.append(((t1 - t0) * 1e3, (t2 - t0) * 1e3))
        return out
    res_sess = []
    for ids in prompts:
        t0 = time.perf_counter()
        it = sess.stream(vx, ids, gen=gen)
        next(it)
        t1 = time.perf_counter()
        n = 1 + sum(1 for _ in it)
        t2 = time.perf_counter()
        assert n == reply_tok
        res_sess.append(((t1 - t0) * 1e3, (t2 - t0) * 1e3,
                         dict(sess.last_stats)))

    res_free = ttft(lambda ids: engine.stream_generate(vx, ids, gen=gen))

    print(f"7B int8, {turns} turns, hist0={hist0}, +{reply_tok} reply "
          f"+{new_tok} user tokens/turn, cache_len={cache_len}")
    print("| turn | prompt | stateless TTFT | session TTFT | window | "
          "speedup |")
    print("|---|---|---|---|---|---|")
    for i, (ids, (ft_f, _), (ft_s, _, st)) in enumerate(
            zip(prompts, res_free, res_sess)):
        w = f"{st['window']}({st['window_pad']})" \
            if not st["restart"] else "full"
        print(f"| {i} | {ids.shape[1]} | {ft_f:.0f} ms | {ft_s:.0f} ms "
              f"| {w} | {ft_f / ft_s:.2f}x |")


if __name__ == "__main__":
    main()
