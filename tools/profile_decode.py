"""Decompose the Otter-MPT7B int8 decode step on one v5e chip.

Tunnel methodology: each dispatch pays a ~30 ms relay roundtrip, so every
component runs N times inside one jitted lax.fori_loop and the marginal
per-iteration time is (t_N - t_1) / (N - 1).
"""

import time
import numpy as np


def _marginal(build_fn, n_iters=50):
    """build_fn(n) -> jitted zero-arg callable running the op n times."""
    import jax

    def timed(f):
        f()                       # compile + warm
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
    from otter_tpu.models.xattn import GatedCrossAttentionBlock
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    cfg = otter_mpt7b().replace(
        text=otter_mpt7b().text.replace(quant="int8"))
    t = cfg.text
    b, L = 8, 256

    # ── 32-layer decoder decode step ─────────────────────────────────
    dec = Decoder(t, otter_cfg=None, dtype=jnp.bfloat16)
    ids1 = jnp.zeros((b, 1), jnp.int32)
    cache = init_cache(t, b, L, jnp.bfloat16)
    kv_valid = jnp.asarray(np.arange(L)[None, :] <= 128).repeat(b, 0)
    pos = jnp.full((b, 1), 128, jnp.int32)
    shapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), ids1,
                            cache=cache, cache_pos=128, kv_valid=kv_valid,
                            positions=pos)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
            s.dtype, jnp.floating) else jnp.bfloat16), shapes)

    def build_dec(n):
        @jax.jit
        def run(params, tok):
            def body(i, tok):
                logits, _ = dec.apply(params, tok, cache=cache,
                                      cache_pos=128, kv_valid=kv_valid,
                                      positions=pos)
                return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return lax.fori_loop(0, n, body, tok)
        return lambda: np.asarray(run(params, ids1))

    ms = _marginal(build_dec) * 1e3
    print(f"decoder_32layers_step+head+argmax: {ms:.3f} ms")

    # ── one gated xattn block ────────────────────────────────────────
    blk = GatedCrossAttentionBlock(
        dim=t.hidden_size, dim_visual=cfg.perceiver.dim,
        dim_head=cfg.xattn_dim_head, heads=cfg.xattn_heads,
        ff_mult=cfg.xattn_ff_mult,
        only_attend_immediate_media=True, dtype=jnp.bfloat16)
    x1 = jnp.zeros((b, 1, t.hidden_size), jnp.bfloat16)
    lat = jnp.zeros((b, 1, cfg.perceiver.num_latents, cfg.perceiver.dim),
                    jnp.bfloat16)
    q_ids = jnp.ones((b, 1), jnp.int32)
    kv_ids = jnp.ones((b, cfg.perceiver.num_latents), jnp.int32)
    keep = jnp.ones((b, 1), jnp.int32)
    bshapes = jax.eval_shape(blk.init, jax.random.PRNGKey(0), x1, lat,
                             q_ids, kv_ids, keep)
    bparams = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
            s.dtype, jnp.floating) else jnp.bfloat16), bshapes)

    def build_xattn(n):
        @jax.jit
        def run(bparams, x1):
            def body(i, x1):
                return blk.apply(bparams, x1, lat, q_ids, kv_ids, keep)
            return lax.fori_loop(0, n, body, x1)
        return lambda: np.asarray(run(bparams, x1)[:, :, :4])

    ms_x = _marginal(build_xattn) * 1e3
    print(f"xattn_block_step: {ms_x:.3f} ms  (x8 = {ms_x*8:.3f} ms)")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
