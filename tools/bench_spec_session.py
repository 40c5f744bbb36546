"""Composed speculative + session-cache bench: per-turn TTFT AND
per-token decode rate on the 7B int8 target + 1B int8 draft pair.

Three arms on an identical growing conversation:
  - stateless: full re-prefill + vanilla decode (the reference worker's
    behavior every turn);
  - session: ChatSession (suffix-window prefill) + vanilla decode;
  - spec+session: SpecChatSession — suffix window into BOTH caches,
    then speculative rounds.

Weights are zeros at real shapes (bandwidth physics; random init
through the tunnel takes minutes), so draft proposals always agree
with the target: the spec decode rate printed is the FULL-ACCEPTANCE
rate, and real-model rates follow the analytic acceptance curve
E[tokens/round] = (1-a^(g+1))/(1-a) exactly as in
tools/bench_speculative.py (round time is acceptance-independent —
static shapes).

Usage: bench_spec_session.py [turns] [hist0] [new_tok] [reply_tok] [gamma]
       (defaults 3 256 24 48 4)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def zero_int8_params(model, load_model, vx, probe):
    """Zeros directly at the QUANT model's shapes — never materialize
    the full f32 tree on device first (33 GB on a 16 GB chip; the exact
    OOM the first run of this bench hit)."""
    import jax
    import jax.numpy as jnp
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

    return jax.tree_util.tree_map(mk, shapes)


def main():
    import jax
    import jax.numpy as jnp
    from otter_tpu.config import (GenerationConfig, otter_mpt1b,
                                  otter_mpt7b)
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.generation.session import ChatSession, SpecChatSession
    from otter_tpu.generation.speculative import SpeculativeGenerator
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    hist0 = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    new_tok = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    reply_tok = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    gamma = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    cfg_t = otter_mpt7b()
    cfg_t = cfg_t.replace(text=cfg_t.text.replace(quant="int8",
                                                  decode_kernel="auto"))
    cfg_d = otter_mpt1b()
    cfg_d = cfg_d.replace(text=cfg_d.text.replace(quant="int8"))
    model_t = OtterVLM(cfg_t, dtype=jnp.bfloat16)
    model_d = OtterVLM(cfg_d, dtype=jnp.bfloat16)
    vx = jnp.zeros((1, 1, 1, 3, 224, 224), jnp.bfloat16)
    probe = jnp.zeros((1, 8), jnp.int32)
    load_t = OtterVLM(cfg_t.replace(
        text=cfg_t.text.replace(quant=None)), dtype=jnp.bfloat16)
    load_d = OtterVLM(cfg_d.replace(
        text=cfg_d.text.replace(quant=None)), dtype=jnp.bfloat16)
    params_t = zero_int8_params(model_t, load_t, vx, probe)
    params_d = zero_int8_params(model_d, load_d, vx, probe)

    spec = SpeculativeGenerator(model_t, params_t, cfg_t,
                                model_d, params_d, cfg_d, gamma=gamma)
    engine = OtterGenerator(model_t, params_t, cfg_t)
    cache_len = 2048

    rng = np.random.default_rng(0)

    def make_prompt(n):
        ids = np.asarray(rng.integers(5, 50000, (1, n)), np.int32)
        ids[:, 0] = cfg_t.media_token_id
        return ids

    gen = GenerationConfig(max_new_tokens=reply_tok, do_sample=False,
                           eos_token_id=-1)

    # build the conversation once from greedy replies (deterministic:
    # zero weights -> same argmax everywhere, so all arms replay it)
    sess_probe = ChatSession(model_t, params_t, cfg_t,
                             cache_len=cache_len)
    prompts, prompt = [], make_prompt(hist0)
    for _ in range(turns):
        prompts.append(prompt)
        got = list(sess_probe.stream(vx, prompt, gen=gen))
        prompt = np.concatenate(
            [prompt, np.asarray([got], np.int32), make_prompt(new_tok)],
            axis=1)
    del sess_probe

    def drive(stream_of, label, reset=None):
        """Two passes per arm (0: compile+warm, 1: measure); sessions
        are reset between passes so pass 2's turn 0 is a genuine first
        turn (jitted fns survive the reset). Returns
        [(ttft_ms, decode_tok_s)] per turn."""
        rows = []
        for attempt in range(2):
            if reset is not None:
                reset()
            rows = []
            for ids in prompts:
                t0 = time.perf_counter()
                it = stream_of(ids)
                next(it)
                t1 = time.perf_counter()
                n = 1 + sum(1 for _ in it)
                t2 = time.perf_counter()
                assert n == reply_tok, (label, n)
                rows.append(((t1 - t0) * 1e3,
                             (n - 1) / (t2 - t1)))
        return rows

    arm_free = drive(
        lambda ids: engine.stream_generate(vx, ids, gen=gen),
        "stateless")
    sess = ChatSession(model_t, params_t, cfg_t, cache_len=cache_len)
    arm_sess = drive(lambda ids: sess.stream(vx, ids, gen=gen),
                     "session", reset=sess.reset)
    ssess = SpecChatSession(spec, cache_len=cache_len)
    arm_spec = drive(lambda ids: ssess.stream(vx, ids, gen=gen),
                     "spec+session", reset=ssess.reset)

    print(f"7B int8 target + 1B int8 draft (gamma={gamma}), {turns} "
          f"turns, hist0={hist0}, +{reply_tok} reply +{new_tok} user "
          f"tokens/turn (spec decode = full-acceptance rate)")
    print("| turn | prompt | stateless TTFT/dec | session TTFT/dec | "
          "spec+session TTFT/dec |")
    print("|---|---|---|---|---|")
    for i, ids in enumerate(prompts):
        f, s, x = arm_free[i], arm_sess[i], arm_spec[i]
        print(f"| {i} | {ids.shape[1]} "
              f"| {f[0]:.0f} ms / {f[1]:.1f} tok/s "
              f"| {s[0]:.0f} ms / {s[1]:.1f} tok/s "
              f"| {x[0]:.0f} ms / {x[1]:.1f} tok/s |")


if __name__ == "__main__":
    main()
