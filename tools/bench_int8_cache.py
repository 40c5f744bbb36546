"""int8 KV cache on one v5e chip: bare 32-layer Otter-MPT7B decoder decode
step at a LONG cache (bf16 cache vs int8 cache + in-kernel dequant).

At L=2048 the bf16 cache read is 2*32*2048*4096*2 = 2.1 GB/step/row-batch
(b8: the cache is per-row so 8x that at batch level = 8*0.27 GB... per
step the decoder reads b*2*NL*L*d bytes); int8 halves it. Marginal-step
methodology (tunnel relay amortized by an in-jit fori_loop).

Usage: bench_int8_cache.py [cache_len] [batch]   (default 2048, 1 — at
L=2048 the 7B's bf16 cache is 4.3 GB/row-batch; one v5e fits b1)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def _marginal(build_fn, n_iters=50):
    def timed(f):
        f()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = timed(build_fn(1))
    tn = timed(build_fn(n_iters))
    return (tn - t1) / (n_iters - 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from otter_tpu.config import otter_mpt7b
    from otter_tpu.models.decoder import Decoder, init_cache
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = otter_mpt7b().replace(
        text=otter_mpt7b().text.replace(quant="int8",
                                        decode_kernel=True))
    t = cfg.text
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    ctx = L - 64         # valid context near capacity

    dec = Decoder(t, otter_cfg=None, dtype=jnp.bfloat16)
    ids1 = jnp.zeros((b, 1), jnp.int32)
    kv_valid = jnp.asarray(np.arange(L)[None, :] <= ctx).repeat(b, 0)
    pos = jnp.full((b, 1), ctx, jnp.int32)

    # ABSTRACT cache for shape inference: a real bf16 cache here is
    # b*NL*2*L*d*2 bytes held for the whole run (8.9 GB at b4 L=4096 —
    # it OOMed the chip before the int8/int4 variants even started)
    cache_abs = jax.eval_shape(lambda: init_cache(t, b, L, jnp.bfloat16))
    shapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), ids1,
                            cache=cache_abs, cache_pos=ctx,
                            kv_valid=kv_valid, positions=pos)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
            s.dtype, jnp.floating) else jnp.bfloat16), shapes)

    def build(dtype, n):
        # the cache is loop-CARRIED so the in-place dus updates it in HBM
        # (a closed-over cache would force a full copy-on-write per step).
        # It is donated AND returned: without a matching output the
        # donation is unusable and the loop carry double-buffers the
        # cache as a temp (measured: b4 L=4096 int8 = args 11.3 GB +
        # temp 4.4 GB -> OOMs one 16G chip; with the alias it fits)
        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, tok, cache):
            def body(i, carry):
                tok, cache = carry
                logits, cache = dec.apply(params, tok, cache=cache,
                                          cache_pos=ctx, kv_valid=kv_valid,
                                          positions=pos)
                return (jnp.argmax(logits[:, -1:], -1).astype(jnp.int32),
                        cache)
            tok, cache = lax.fori_loop(0, n, body, (tok, cache))
            return tok, cache

        def call():
            tok, cache = run(params, ids1, init_cache(t, b, L, dtype))
            del cache          # free before the next call allocates
            return np.asarray(tok)
        return call

    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    variants = [("bf16", jnp.bfloat16), ("int8", jnp.int8),
                ("int4", "int4")]
    variants = [v for v in variants
                if which in (v[0], "both", "all")
                and (which == "all" or v[0] != "int4" or which == "int4")]
    for name, dtype in variants:
        ms = _marginal(lambda n: build(dtype, n)) * 1e3
        cache = jax.eval_shape(lambda: init_cache(t, b, L, dtype))
        cache_gb = sum(x.size * x.dtype.itemsize
                       for x in cache.values()) / 1e9
        print(f"{name} cache, L={L} ctx={ctx} b{b}: {ms:.2f} ms/step "
              f"(cache {cache_gb:.2f} GB)")


if __name__ == "__main__":
    main()
