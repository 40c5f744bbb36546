"""Decompose the flagship decode step's gap to the HBM roofline.

VERDICT r3 #2: bench.py reports 0.857 of the 819 GB/s speed-of-light at
b8/L256 (~12.9 ms marginal step vs ~11.06 ms SOL); the missing ~1.9 ms
was undecomposed. This measures, all as marginal per-iteration times of
jitted `lax.fori_loop`s on the real chip (one launch, no relay noise):

  1. bare-dots floor — x@W through every decode-path matmul at the
     exact 7B int8 shapes (qkv, out, mlp up/down x32 layers + bf16
     tied head) with x carried: the achievable weight-stream rate for
     this operand mix. If this already sits near 0.86 of spec, the
     "gap" is HBM achievability, not framework overhead.
  2. + cache einsums — adds the per-layer attention q.K / p.V reads
     over a carried [layers, 2, b, L, d] stacked cache (no softmax),
     i.e. the full memory traffic of the decode step with zero
     "framework" ops.
  3. full decoder step (cache threaded through the carry, in-place
     DUS) — adds norms, bias math, softmax, cache update.
  4. full engine body cost from bench.py's own numbers for reference.

Run: python tools/profile_decode_gap.py [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def marginal(build_fn, n_iters=50):
    def timed(f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(build_fn(1))
    tn = timed(build_fn(n_iters))
    return (tn - t1) / (n_iters - 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import otter_mpt7b
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    # argv: [iters] [b] [L] [cache_bit]  (digits positional, flags free)
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    iters = int(nums[0]) if nums else 50
    argb = int(nums[1]) if len(nums) > 1 else 8
    argL = int(nums[2]) if len(nums) > 2 else 256
    cache_bit = "int8" if "--int8-cache" in sys.argv else "bf16"

    cfg = otter_mpt7b()
    t = cfg.text
    b, L, d, H = argb, argL, t.hidden_size, t.num_attention_heads
    dh = d // H
    nl = t.num_hidden_layers
    V = t.vocab_size

    # Allocate LAZILY per measurement: the synthetic weight set (6.9 GB)
    # plus the real decoder's params (another ~7 GB) together exceed the
    # chip; only --bare-dots materializes the synthetic set.
    def make_weights():
        Wqkv = [jnp.zeros((d, 3 * d), jnp.int8) for _ in range(nl)]
        Wo = [jnp.zeros((d, d), jnp.int8) for _ in range(nl)]
        W1 = [jnp.zeros((d, 4 * d), jnp.int8) for _ in range(nl)]
        W2 = [jnp.zeros((4 * d, d), jnp.int8) for _ in range(nl)]
        head = jnp.zeros((V, d), jnp.bfloat16)      # tied wte read
        return (Wqkv, Wo, W1, W2, head)

    def make_cache():
        return jnp.zeros((nl, 2, b, L, d), jnp.bfloat16)

    weights = make_weights() if "--bare-dots" in sys.argv else None
    # the synthetic bf16 cache backs only the cache-einsum measurements;
    # --int8-cache runs measure the real decoder alone (a second 4+ GB
    # synthetic cache would blow the chip at b4/L2048)
    cache = None if "--int8-cache" in sys.argv else make_cache()

    def dots_body(x, W):
        """One decode step's weight stream as bare dots."""
        Wqkv, Wo, W1, W2, head = W
        for i in range(nl):
            qkv = jnp.dot(x, Wqkv[i].astype(jnp.bfloat16))
            x = jnp.tanh(qkv[:, :d])
            x = jnp.tanh(jnp.dot(x, Wo[i].astype(jnp.bfloat16)))
            h = jnp.dot(x, W1[i].astype(jnp.bfloat16))
            x = jnp.tanh(jnp.dot(h, W2[i].astype(jnp.bfloat16)))
        lg = jnp.dot(x, head.T.astype(jnp.bfloat16))
        return jnp.tanh(x + lg[:, :1] * 1e-6)

    def build_dots(n):
        @jax.jit
        def run(x, W):
            return lax.fori_loop(0, n, lambda i, x: dots_body(x, W), x)
        x0 = jnp.zeros((b, d), jnp.bfloat16)
        return lambda: np.asarray(run(x0, weights))

    def cache_body(x, cache, pos):
        for i in range(nl):
            q = jnp.tanh(x).reshape(b, H, 1, dh)
            k = cache[i, 0].reshape(b, L, H, dh).transpose(0, 2, 1, 3)
            v = cache[i, 1].reshape(b, L, H, dh).transpose(0, 2, 1, 3)
            p_ = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(p_, -1), v)
            x = jnp.tanh(x + o.reshape(b, d))
        # one-token in-place cache write (the real step's DUS)
        upd = jnp.broadcast_to(x[None, None, :, None, :],
                               (nl, 2, b, 1, d)).astype(cache.dtype)
        cache = lax.dynamic_update_slice(cache, upd, (0, 0, 0, pos, 0))
        return x, cache

    def build_dots_cache(n):
        @jax.jit
        def run(x, cache, W):
            def body(i, st):
                x, cache = st
                x = dots_body(x, W)
                x, cache = cache_body(x, cache, 128)
                return (x, cache)
            return lax.fori_loop(0, n, body, (x, cache))
        x0 = jnp.zeros((b, d), jnp.bfloat16)
        return lambda: np.asarray(run(x0, cache, weights)[0])

    def build_cache_only(n):
        @jax.jit
        def run(x, cache):
            def body(i, st):
                x, cache = st
                return cache_body(x, cache, 128)
            return lax.fori_loop(0, n, body, (x, cache))
        x0 = jnp.zeros((b, d), jnp.bfloat16)
        return lambda: np.asarray(run(x0, cache)[0])

    # full real decoder step with the cache threaded through the carry
    from otter_tpu.models.decoder import Decoder, init_cache
    dk = "auto" if cache_bit == "int8" else t.decode_kernel
    dec = Decoder(t.replace(quant="int8", decode_kernel=dk),
                  otter_cfg=None, dtype=jnp.bfloat16)
    ids1 = jnp.zeros((b, 1), jnp.int32)
    c0 = init_cache(t, b, L, cache_bit if cache_bit == "int8"
                    else jnp.bfloat16)
    ctx = min(128, L - 8) if L <= 256 else L - 64
    kv_valid = jnp.asarray(np.arange(L)[None, :] <= ctx).repeat(b, 0)
    pos = jnp.full((b, 1), ctx, jnp.int32)
    shapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), ids1,
                            cache=c0, cache_pos=128, kv_valid=kv_valid,
                            positions=pos)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
            s.dtype, jnp.floating) else jnp.bfloat16), shapes)

    def build_decoder(n):
        @jax.jit
        def run(params, tok, c):
            def body(i, st):
                tok, c = st
                logits, c = dec.apply(params, tok, cache=c,
                                      cache_pos=ctx, kv_valid=kv_valid,
                                      positions=pos)
                return (jnp.argmax(logits[:, -1:], -1).astype(jnp.int32),
                        c)
            return lax.fori_loop(0, n, body, (tok, c))
        return lambda: np.asarray(run(params, ids1, c0)[0])

    wbytes = nl * (d * 3 * d + d * d + d * 4 * d + 4 * d * d) \
        + V * d * 2
    cbytes = nl * 2 * b * L * d * (1 if cache_bit == "int8" else 2)
    if cache_bit == "int8":
        cbytes += 2 * b * nl * H * L * 4           # f32 scales
    spec = 819e9
    print(f"weight stream {wbytes/1e9:.2f} GB, cache {cbytes/1e9:.2f} GB"
          f" -> SOL {1e3*(wbytes+cbytes)/spec:.2f} ms/step @819 GB/s")
    # NOTE: a "bare jnp.dot" weight-stream floor was tried and REMOVED:
    # standalone convert-then-dot loops measure 100+ ms/step because XLA
    # materializes the int8->bf16 weight converts it fuses in the real
    # model's graph (and the 13.7 GB of bf16 temps OOM the follow-up
    # builders). The meaningful floors are the real decoder (whose int8
    # paths use the tuned Pallas/XLA routes) and the cache einsums.
    measure = [
        ("real decoder step (carried cache)", build_decoder,
         wbytes + cbytes),
    ]
    if cache is not None:
        measure = [("cache-einsums only", build_cache_only, cbytes)
                   ] + measure
    if "--bare-dots" in sys.argv:
        measure = [("bare-dots (weights only)", build_dots, wbytes),
                   ("dots+cache", build_dots_cache, wbytes + cbytes)
                   ] + measure
    for name, builder, byts in measure:
        ms = marginal(builder, iters) * 1e3
        bw = byts / (ms / 1e3) / 1e9
        print(f"{name}: {ms:.3f} ms  ({bw:.0f} GB/s = "
              f"{bw/8.19:.1f}% of spec)", flush=True)


if __name__ == "__main__":
    main()
