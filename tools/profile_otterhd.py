"""Decompose the OtterHD (Fuyu-8B persimmon) int8 decode step at full-HD
context on one v5e chip. Marginal-cost methodology per profile_decode.py.

Components (all at b1, cache L=2560, ctx=2356):
  full      — whole model step (embed + 36 layers + final norm + lm_head)
  nohead    — skip_head=True (36 layers + norm)
  attnonly  — the 36 decode_attention kernel calls alone (qkv from zeros)
  head      — final-norm hidden -> 262k lm_head (+argmax)
Optional argv: block_h values to sweep for the decode kernel (e.g. 4 8 16).
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
    cfg = FuyuConfig()
    t = cfg.text.replace(quant="int8", decode_kernel=True)
    s = 2356
    L = 2560
    dec = Decoder(t, dtype=jnp.bfloat16)
    ids1 = jnp.zeros((1, 1), jnp.int32)
    cache = init_cache(t, 1, L, jnp.bfloat16)
    kv_valid = jnp.asarray(np.arange(L)[None, :] < s)
    pos = jnp.full((1, 1), s, jnp.int32)
    shapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), ids1,
                            cache=cache, cache_pos=s, kv_valid=kv_valid,
                            positions=pos)
    params = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype if not jnp.issubdtype(
            sh.dtype, jnp.floating) else jnp.bfloat16), shapes)

    def step_builder(skip_head):
        def build(n):
            @jax.jit
            def run(params, tok, cache):
                def body(i, carry):
                    tok, cache = carry
                    out, cache = dec.apply(params, tok, cache=cache,
                                           cache_pos=s, kv_valid=kv_valid,
                                           positions=pos,
                                           skip_head=skip_head)
                    nxt = (jnp.sum(out[:, -1:], -1).astype(jnp.int32) % 7
                           if skip_head else
                           jnp.argmax(out[:, -1:], -1).astype(jnp.int32))
                    return nxt, cache
                tok, _ = lax.fori_loop(0, n, body,
                                       (jnp.zeros((1, 1), jnp.int32), cache))
                return tok
            return lambda: np.asarray(run(params, ids1, cache))
        return build

    t_full = _marginal(step_builder(False), 21)
    t_nohead = _marginal(step_builder(True), 21)
    print(f"full step      : {t_full * 1e3:7.2f} ms ({1 / t_full:.1f} tok/s)")
    print(f"no lm_head     : {t_nohead * 1e3:7.2f} ms  "
          f"(head = {(t_full - t_nohead) * 1e3:.2f} ms)")

    # decode-attention kernels alone, sweeping block_h
    from otter_tpu.ops.decode_attention import decode_attention
    h, d = t.num_attention_heads, t.head_dim
    k = cache["k"][:, 0]
    v = cache["v"][:, 0]
    q = jnp.zeros((1, h, d), jnp.bfloat16)
    lengths = jnp.full((1,), s, jnp.int32)
    sweep = [int(a) for a in sys.argv[1:]] or [None]
    for bh in sweep:
        def build_attn(n, bh=bh):
            @jax.jit
            def run(q, k, v):
                def body(i, acc):
                    o = decode_attention(q + acc, k, v, lengths,
                                         block_h=bh)
                    return jnp.mean(o) * 0
                acc = lax.fori_loop(0, n * t.num_hidden_layers, body,
                                    jnp.bfloat16(0))
                return acc
            return lambda: np.asarray(run(q, k, v))
        ta = _marginal(build_attn, 11)
        print(f"attn x36 (block_h={bh}): {ta * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
