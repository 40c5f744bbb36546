"""Flash-attention forward benchmark at the BENCH_NOTES shape
(b4 h32 s2048 d128, bf16, causal + ALiBi bias), with block-size override
via env FA_BQ/FA_BK. Marginal timing over a device-side loop."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from otter_tpu.ops import flash_attention as fa
    from otter_tpu.ops.masks import alibi_slopes
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    b, h, s, d = 4, 32, 2048, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    slopes = alibi_slopes(h, 8.0)
    rel = jnp.arange(1 - s, 1, dtype=jnp.float32)
    bias = (rel[None, None, None, :] * slopes[None, :, None, None])

    causal = os.environ.get("FA_CAUSAL", "1") == "1"
    use_bias = os.environ.get("FA_BIAS", "1") == "1"
    if not use_bias:
        bias = None
    bq = int(os.environ.get("FA_BQ", 1024))
    bk = int(os.environ.get("FA_BK", 1024))
    bs = fa.BlockSizes(block_q=bq, block_k=bk)

    def build(n):
        @jax.jit
        def run(q, k, v, bias):
            def body(i, carry):
                q2, acc = carry
                o = fa.flash_attention(q2, k, v, bias, None, None,
                                       causal=causal, sm_scale=d ** -0.5,
                                       block_sizes=bs)
                # data dependence so the loop can't be hoisted
                q2 = q2 + (o[:1, :1, :1, :1] * 0).astype(q2.dtype)
                return q2, acc + o[0, 0, 0, :8].astype(jnp.float32)
            _, acc = lax.fori_loop(0, n, body,
                                   (q, jnp.zeros((8,), jnp.float32)))
            return acc
        return lambda: np.asarray(run(q, k, v, bias))

    def timed(f):
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tn = timed(build(1)), timed(build(21))
    dt = (tn - t1) / 20
    flops = 4 * b * h * s * s * d / (2 if causal else 1)
    print(f"bq={bq} bk={bk} causal={causal} bias={use_bias}: {dt*1e3:.3f} ms  "
          f"{flops/dt/1e12:.1f} TFLOP/s (causal accounting)")


if __name__ == "__main__":
    main()
