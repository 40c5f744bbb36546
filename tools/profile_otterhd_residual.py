"""Decompose the OtterHD decode step's "norms/rotary/overheads" residual.

Round-4 VERDICT #2: the Fuyu-8B int8 full-HD decode step (23.3 ms)
decomposes as attn 3.7 + lm_head 1.2 + qkv/out 3.7 + MLP 7.4, leaving
~7.3 ms of per-layer glue (norms, per-head QK-LN, partial rotary, cache
writes, bias adds, residuals) unattributed — proportionally the largest
undecomposed residual in BENCH_NOTES. This peels it by CONFIG ABLATION:
the same 36-layer marginal decode loop is re-timed with one structural
feature removed per variant (numerics change, time attribution doesn't):

  full        — the real persimmon config (qk_ln, partial rotary, biases)
  -qk_ln      — per-head LayerNorm on q and k removed
  -rope       — pos="learned" (rotary tables + apply removed from layers)
  -biases     — no_bias=True (qkv/out/mlp/norm bias adds removed)
  -cache_wr   — decode step with the cache write ablated is not
                expressible through config; cache write cost is probed
                directly instead (DUS pair per layer)

Usage: python tools/profile_otterhd_residual.py [b] [L]  (default 1 2560)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from tools.profile_decode import _marginal


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import FuyuConfig
    from otter_tpu.models.decoder import Decoder, init_cache
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    b = int(nums[0]) if nums else 1
    L = int(nums[1]) if len(nums) > 1 else 2560
    s = L - 204

    base = FuyuConfig().text.replace(quant="int8", decode_kernel=True)
    variants = [
        ("full (persimmon)", base),
        ("-qk_ln", base.replace(qk_ln=False)),
        ("-rope (learned pos)", base.replace(pos="learned")),
        ("-biases", base.replace(no_bias=True)),
        ("-qk_ln -rope -biases", base.replace(
            qk_ln=False, pos="learned", no_bias=True)),
    ]

    ids1 = jnp.zeros((b, 1), jnp.int32)
    kv_valid = jnp.asarray(np.arange(L)[None, :] < s).repeat(b, 0)
    pos = jnp.full((b, 1), s, jnp.int32)

    # each variant runs in its own function scope so its ~10 GB of
    # params (and the jit executables whose closures hold them) are
    # actually freed before the next variant allocates — a loop that
    # rebinds `params` frees the OLD tree only after the NEW one exists,
    # which is fatal at today's usable-HBM edge
    def run_variant(name, t):
        dec = Decoder(t, dtype=jnp.bfloat16)
        cache_shapes = jax.eval_shape(
            lambda: init_cache(t, b, L, jnp.bfloat16))
        shapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), ids1,
                                cache=cache_shapes, cache_pos=s,
                                kv_valid=kv_valid, positions=pos)
        params = jax.tree_util.tree_map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype if not jnp.issubdtype(
                sh.dtype, jnp.floating) else jnp.bfloat16), shapes)
        gb = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params)) / 1e9

        def build(n, t=t, dec=dec, params=params):
            # the cache is DONATED and re-created per timed call: an
            # un-donated loop carry doubles the 1.5 GB footprint (OOM at
            # today's usable-HBM edge, BENCH_NOTES round-5 HBM-drift
            # note), and building it inside the jit from zeros is worse —
            # XLA rewrites the known-zeros cache DUSes into full-cache
            # pad+copy temps (measured 517 ms/step of pure cache copies)
            import functools

            @functools.partial(jax.jit, donate_argnums=(2,))
            def run(params, tok, cache):
                def body(i, carry):
                    tok, cache = carry
                    out, cache = dec.apply(params, tok, cache=cache,
                                           cache_pos=s, kv_valid=kv_valid,
                                           positions=pos, skip_head=True)
                    nxt = (jnp.sum(out[:, -1:], -1).astype(jnp.int32) % 7)
                    return nxt, cache
                # the cache is RETURNED so donation can alias it
                # input->output (donation only reuses buffers for
                # outputs; a dropped carry gets its own copy)
                return lax.fori_loop(0, n, body, (tok, cache))

            def f():
                cache = init_cache(t, b, L, jnp.bfloat16)
                tok, _ = run(params, ids1, cache)
                return np.asarray(tok)
            return f

        ms = _marginal(build, 21) * 1e3
        print(f"{name:24s}: {ms:7.2f} ms/step  (params {gb:.1f} GB)",
              flush=True)

    for name, t in variants:
        run_variant(name, t)
        jax.clear_caches()   # drop executables holding param refs

    # cache-write probe: the per-layer k/v DUS pair in isolation
    t = base
    hk, d = t.kv_heads, t.head_dim
    cache = init_cache(t, b, L, jnp.bfloat16)
    k1 = jnp.zeros((b, hk, 1, d), jnp.bfloat16)

    def build_wr(n):
        @jax.jit
        def run(cache, k1):
            def body(i, carry):
                cache, k1 = carry
                for layer in range(t.num_hidden_layers):
                    for key in ("k", "v"):
                        cache[key] = lax.dynamic_update_slice(
                            cache[key], k1[:, None], (0, layer, 0, s, 0))
                k1 = k1 + cache["k"][0, 0, 0, s, 0]
                return cache, k1
            cache, k1 = lax.fori_loop(0, n, body, (dict(cache), k1))
            return k1
        return lambda: np.asarray(run(cache, k1))

    ms = _marginal(build_wr, 21) * 1e3
    print(f"{'cache DUS x72':24s}: {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
