"""Decompose the ENGINE decode step vs the bare decoder at long cache.

Round-4 finding that motivates this: at b4/L2048 int8-cache the bare
decoder measures 12.4 ms/step (89% of spec bandwidth,
profile_decode_gap.py) but the engine step is 19.4 ms — ~7 ms/step of
non-decoder overhead, far above the ~2.2 ms seen at b8/L256. This peels
the onion between the two, one layer per variant:

  decoder   — 32-layer decoder, static cache_pos, fori_loop (the
              profile_decode_gap baseline)
  +xattn    — full OtterVLM decode step (8 gated-xattn blocks against
              cached vision latents), still static indices
  +dynamic  — engine-style per-step indices: dynamic cache_pos,
              kv_valid updated in the carry, positions from real_len
  +sampler  — + greedy argmax / where(done) / buffer DUS (sample_from)
  while     — the same body under lax.while_loop with the engine's
              early-exit cond (the engine's exact regime)

Usage: python tools/profile_engine_gap.py [b] [L] (defaults 4 2048)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def timed(f):
    f()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def marginal(build, n=40):
    t1 = timed(build(1))
    tn = timed(build(n))
    return (tn - t1) / (n - 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import otter_mpt7b
    from otter_tpu.models.decoder import init_cache
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    b = int(nums[0]) if nums else 4
    L = int(nums[1]) if len(nums) > 1 else 2048

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

    # one real prefill for the cache/latents the step loops reuse
    cache0 = init_cache(cfg.text, b, L, "int8")
    positions = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (b, p))
    am = jnp.ones((b, p), jnp.int32)

    @jax.jit
    def prefill(params, vx, lx):
        logits, cache, lat = model.apply(
            params, vx, lx, attention_mask=am, positions=positions,
            cache=cache0)
        return logits[:, -1], cache, lat

    last_logits, cache, lat = jax.block_until_ready(
        prefill(params, vision_x, lang_x))
    media_counts = jnp.ones((b,), jnp.int32)
    real_len = jnp.full((b,), p, jnp.int32)
    idx = jnp.arange(L)

    tok0 = jnp.argmax(last_logits, -1).astype(jnp.int32)
    kv0 = jnp.asarray(np.arange(L)[None, :] < p).repeat(b, 0)
    buffer0 = jnp.concatenate(
        [lang_x, jnp.zeros((b, L - p), jnp.int32)], -1)

    ctx = L - 64
    kv_static = jnp.asarray(np.arange(L)[None, :] <= ctx).repeat(b, 0)
    pos_static = jnp.full((b, 1), ctx, jnp.int32)

    def step(params, tok, cache, cache_pos, kv_valid, positions,
             with_xattn=True):
        logits, cache, _ = model.apply(
            params, None, tok, vis_latents=lat,
            cache=cache, cache_pos=cache_pos, kv_valid=kv_valid,
            positions=positions, media_counts=media_counts)
        return logits[:, -1], cache

    # decoder-only variant: a BARE Decoder (no xattn blocks in the
    # module at all), zero params at the same dims — vis_latents=None
    # through OtterVLM would re-encode vision_x (crash on None).
    # The bare tree SHARES the VLM's lang_encoder leaves (a second
    # zero tree would double-resident ~8.5 GB and OOM the chip).
    from flax import traverse_util
    from otter_tpu.models.decoder import Decoder
    dec_only = Decoder(cfg.text, dtype=jnp.bfloat16)
    ids1 = jnp.zeros((b, 1), jnp.int32)
    dec_shapes = jax.eval_shape(
        dec_only.init, jax.random.PRNGKey(0), ids1, cache=cache0,
        cache_pos=ctx, kv_valid=kv_static, positions=pos_static)
    src = traverse_util.flatten_dict(
        params["params"]["lang_encoder"], sep="/")
    dec_flat = {}
    for k in traverse_util.flatten_dict(dec_shapes["params"],
                                        sep="/"):
        dec_flat[k] = src[k]
    dec_params = {"params": traverse_util.unflatten_dict(dec_flat,
                                                         sep="/")}

    def build_static(with_xattn):
        def build(n):
            @jax.jit
            def run(params, tok, cache):
                def body(i, st):
                    tok, c = st
                    if with_xattn:
                        logits, c = step(params, tok[:, None], c, ctx,
                                         kv_static, pos_static)
                    else:
                        logits, c = dec_only.apply(
                            dec_params, tok[:, None], cache=c,
                            cache_pos=ctx, kv_valid=kv_static,
                            positions=pos_static)
                        logits = logits[:, -1]
                    return (jnp.argmax(logits, -1).astype(jnp.int32), c)
                return lax.fori_loop(0, n, body, (tok, cache))[0]
            return lambda: np.asarray(run(params, tok0, cache))
        return build

    def build_dynamic(with_sampler, use_while):
        def build(n):
            def body_inner(t, rng, cache, done, buffer, kv_valid, tok):
                kv_valid = kv_valid | (idx[None] == p + t - 1)
                positions = (real_len + t - 1)[:, None]
                logits, cache = step(params, tok[:, None], cache,
                                     p + t - 1, kv_valid, positions, True)
                if with_sampler:
                    rng, sub = jax.random.split(rng)
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    nxt = jnp.where(done, 0, nxt)
                    done = done | (nxt == -1)
                    buffer = lax.dynamic_update_slice(
                        buffer, nxt[:, None], (0, p + t))
                else:
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (t + 1, rng, cache, done, buffer, kv_valid, nxt)

            @jax.jit
            def run(params, tok, cache):
                state = (jnp.int32(1), jax.random.PRNGKey(0), cache,
                         jnp.zeros((b,), bool), buffer0, kv0, tok)
                if use_while:
                    out = lax.while_loop(
                        lambda st: (st[0] < n) & ~jnp.all(st[3]),
                        lambda st: body_inner(*st), state)
                else:
                    out = lax.fori_loop(
                        0, n, lambda i, st: body_inner(*st), state)
                return out[6]
            return lambda: np.asarray(run(params, tok0, cache))
        return build

    variants = [
        ("decoder (static idx, no xattn)", build_static(False)),
        ("+xattn (static idx)", build_static(True)),
        ("+dynamic idx (fori)", build_dynamic(False, False)),
        ("+sampler (fori)", build_dynamic(True, False)),
        ("while_loop (engine regime)", build_dynamic(True, True)),
    ]
    for name, build in variants:
        ms = marginal(build) * 1e3
        print(f"{name:34s}: {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
