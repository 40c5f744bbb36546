"""Decompose the decode-time gated cross-attention cost (round 5).

profile_engine_gap.py shows the full OtterVLM decode step paying far
more than the bare decoder at long cache — beyond the xattn weight
traffic (8 int8 FF pairs = 1.07 GB/step ≈ 1.3 ms SOL on the 7B). This
probes ONE GatedCrossAttentionBlock at decode shapes (s=1) in a
device-side fori loop, then ablates structurally (time attribution,
not numerics):

  full        — the real block (norm + to_q/to_kv + Pallas cross-attn
                + out_keep + to_out + gates + ff_norm + fused int8 FF)
  ff-only     — ff_norm + fused int8 FF + gate (the weight-traffic floor)
  attn-only   — norm + projections + Pallas cross-attn + to_out
  attn-nopallas — attn-only with the flash-kernel call replaced by a
                mean over latents (isolates the q_len=1 Pallas launch)

All numbers are printed x8 (the 7B has n_layers/4 = 8 xattn blocks).

Usage: python tools/profile_xattn_decode.py [b] [n_lat] (default 4 64)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import flax.linen as nn
import numpy as np

from tools.profile_decode import _marginal


def main():
    if "--tiny" in sys.argv:   # CPU-only: never touch the chip for smoke
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.models.xattn import (GatedCrossAttentionBlock,
                                        MaskedCrossAttention)
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    b = int(nums[0]) if nums else 4
    n_lat = int(nums[1]) if len(nums) > 1 else 64
    if "--tiny" in sys.argv:   # CPU smoke of the harness logic only
        d, d_vis, heads, dim_head = 256, 64, 2, 32
    else:
        d, d_vis, heads, dim_head = 4096, 1024, 8, 64

    x = jnp.zeros((b, 1, d), jnp.bfloat16)
    media = jnp.zeros((b, 1, n_lat, d_vis), jnp.bfloat16)
    q_ids = jnp.ones((b, 1), jnp.int32)
    kv_ids = jnp.ones((b, n_lat), jnp.int32)
    out_keep = jnp.ones((b, 1), jnp.int32)

    class FFOnly(nn.Module):
        """The block's FF half with the same quant/fusion path."""

        @nn.compact
        def __call__(self, xx):
            from otter_tpu.ops.quant import Int8Kernel, int8_mlp
            ff_gate = self.param("ff_gate", nn.initializers.zeros, (1,),
                                 jnp.float32)
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                             name="ff_norm")(xx)
            kq1, s1 = Int8Kernel(4 * d, name="ff_up")(d)
            kq2, s2 = Int8Kernel(d, name="ff_down")(4 * d)
            y = int8_mlp(y.reshape(b, d).astype(jnp.bfloat16),
                         kq1, s1, kq2, s2, act="gelu")
            return xx + y.reshape(b, 1, d) * jnp.tanh(ff_gate).astype(
                xx.dtype)

    class AttnNoPallas(nn.Module):
        """MaskedCrossAttention with the kernel call swapped for a
        latent mean (same projections/norm/reshapes)."""

        @nn.compact
        def __call__(self, xx):
            from otter_tpu.ops.quant import make_dense
            inner = heads * dim_head
            dense = lambda feat, name: make_dense(
                "int8", feat, use_bias=False, dtype=jnp.bfloat16,
                name=name)
            xn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                              name="norm")(xx)
            q = dense(inner, "to_q")(xn)
            kv = dense(inner * 2, "to_kv")(media.reshape(b, n_lat, -1))
            k, v = jnp.split(kv, 2, axis=-1)
            qh = q.reshape(b, 1, heads, dim_head).transpose(0, 2, 1, 3)
            vh = v.reshape(b, n_lat, heads, dim_head).transpose(0, 2, 1, 3)
            o = jnp.mean(vh, 2, keepdims=True) + qh * 1e-6
            o = o.transpose(0, 2, 1, 3).reshape(b, 1, inner)
            return xx + dense(d, "to_out")(o)

    class AttnOnly(nn.Module):
        @nn.compact
        def __call__(self, xx):
            return xx + MaskedCrossAttention(
                dim=d, dim_visual=d_vis, dim_head=dim_head, heads=heads,
                quant="int8", dtype=jnp.bfloat16, name="attn")(
                    xx, media, q_ids, kv_ids, out_keep)

    full_block = GatedCrossAttentionBlock(
        dim=d, dim_visual=d_vis, dim_head=dim_head, heads=heads,
        quant="int8", dtype=jnp.bfloat16)

    def loop(mod, *args):
        shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x, *args)
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
                s.dtype, jnp.floating) else (
                    jnp.float32 if s.dtype == jnp.float32
                    else jnp.bfloat16)), shapes)

        def build(n):
            @jax.jit
            def run(params, x0):
                def body(i, xx):
                    y = mod.apply(params, xx, *args)
                    return y.astype(xx.dtype)
                return lax.fori_loop(0, n, body, x0)
            return lambda: np.asarray(run(params, x))
        return build

    variants = [
        ("full block", loop(full_block, media, q_ids, kv_ids, out_keep)),
        ("ff-only (weights floor)", loop(FFOnly())),
        ("attn-only (pallas)", loop(AttnOnly())),
        ("attn-only (no pallas)", loop(AttnNoPallas())),
    ]
    for name, build in variants:
        ms = _marginal(build, 41) * 1e3
        print(f"{name:26s}: {ms * 8:7.3f} ms/step x8blocks "
              f"({ms:6.3f} per block)", flush=True)


if __name__ == "__main__":
    main()
