"""Block-size A/B for the Pallas stacked-cache decode kernel at the
serving-realistic shape (7B dims: b8, H32, d128, L2048, 32 layers).

Round-4 finding that motivates this: at b8/L2048 the int8 cache showed
NO win over bf16 (20.89 vs 20.69 ms/step, tools/bench_int8_cache.py)
despite halving the cache bytes — the kernel's default block_h targets
only 0.5 MB of k-block per grid step, so at b8 the grid is
8 x (32/4) x (2048/512) = 256 steps/layer x 32 layers = 8k steps and
the per-grid-step floor, not HBM, binds. This sweeps (block_k, block_h)
for int8 and bf16 caches, emulating one full decode step (fori over 32
stacked layers inside one jit).

Usage: python tools/bench_decode_blocks.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def marginal(build_fn, n_iters=30):
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

    from otter_tpu.ops.decode_attention import decode_attention
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    b, nl, H, L, d = 8, 32, 32, 2048, 128
    ctx = L - 64

    lengths = jnp.full((b,), ctx, jnp.int32)
    starts = jnp.zeros((b,), jnp.int32)

    def make_cache(dtype):
        if dtype == "int8":
            k = jnp.zeros((b, nl, H, L, d), jnp.int8)
            v = jnp.zeros((b, nl, H, L, d), jnp.int8)
            ks = jnp.zeros((b, nl, H, L), jnp.float32)
            vs = jnp.zeros((b, nl, H, L), jnp.float32)
            return k, v, {"k_scale": ks, "v_scale": vs, "kv_bits": 8}
        k = jnp.zeros((b, nl, H, L, d), jnp.bfloat16)
        v = jnp.zeros((b, nl, H, L, d), jnp.bfloat16)
        return k, v, {}

    def build(n, k, v, scales, block_k, block_h):
        sc = dict(scales)
        ks, vs = sc.pop("k_scale", None), sc.pop("v_scale", None)

        @jax.jit
        def run(q, k, v):
            def step(_, q):
                # Python layer loop: `layer` must be a static int (the
                # BlockSpec index map closes over it, like the decoder)
                for i in range(nl):
                    kw = {}
                    if ks is not None:
                        kw = {"k_scale": ks, "v_scale": vs,
                              "kv_bits": 8}
                    q = jnp.tanh(decode_attention(
                        q, k, v, lengths, None, starts=starts, layer=i,
                        block_k=block_k, block_h=block_h,
                        **kw)).astype(q.dtype)
                return q
            return lax.fori_loop(0, n, step, q)

        q0 = jnp.zeros((b, H, d), jnp.bfloat16)
        return lambda: np.asarray(run(q0, k, v))

    for dtype in ("int8", "bf16"):
        k, v, scales = make_cache(dtype)
        nbytes = (k.size + v.size) * k.dtype.itemsize * ctx // L
        if "k_scale" in scales:
            nbytes += 2 * b * nl * H * ctx * 4
        sol = nbytes / 819e9 * 1e3
        print(f"[{dtype}] cache read {nbytes/1e9:.2f} GB valid -> "
              f"SOL {sol:.2f} ms/step")
        for block_k, block_h in ((512, 4), (512, 8), (512, 16),
                                 (1024, 4), (1024, 8), (1024, 16),
                                 (2048, 8), (2048, 16), (2048, 32)):
            try:
                ms = marginal(functools.partial(
                    build, k=k, v=v, scales=scales,
                    block_k=block_k, block_h=block_h)) * 1e3
                grid = b * (H // block_h) * (L // block_k) * nl
                print(f"  block_k={block_k:4d} block_h={block_h:2d} "
                      f"(grid {grid:5d}): {ms:7.3f} ms  "
                      f"({100*sol/ms:.0f}% of SOL)", flush=True)
            except Exception as e:
                print(f"  block_k={block_k} block_h={block_h}: "
                      f"FAILED {type(e).__name__}: {e}", flush=True)
        del k, v, scales


if __name__ == "__main__":
    main()
