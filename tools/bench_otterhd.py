"""OtterHD/Fuyu-8B variable-resolution prefill + decode (BASELINE.json
config #4): a full-HD 1080x1920 image is 36x64 = 2304 patches (+36
newline tokens) straight into the token stream — the encoder-free path
whose training-throughput claim is the reference's headline benchmark.
int8 weights (8B persimmon; embeddings/lm_head stay bf16), b1.

Usage: bench_otterhd.py [HxW] (default 1080x1920)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

RELAY_MS = 28.7


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otter_tpu.config import FuyuConfig
    from otter_tpu.models.decoder import init_cache
    from otter_tpu.models.fuyu import FuyuVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    args = sys.argv[1:]
    res = args[0] if args and "x" in args[0] and args[0][0].isdigit() \
        else "1080x1920"
    H, W = (int(v) for v in res.lower().split("x"))
    dk = "auto" if "einsum" not in args else False
    # --cache-bit int8|int4 quantizes the KV cache; --quant-embed stores
    # the 262k-vocab wte as int8 rows. Both are RESIDENCY levers: at
    # today's usable-HBM edge the bf16 cache + bf16 wte put the 8B decode
    # into the thrash zone (BENCH_NOTES round-5 HBM-drift note).
    cache_bit = args[args.index("--cache-bit") + 1] \
        if "--cache-bit" in args else "bf16"
    cache_dtype = {"bf16": jnp.bfloat16, "int8": "int8",
                   "int4": "int4"}[cache_bit]
    qe = "--quant-embed" in args
    cfg = FuyuConfig()
    cfg = cfg.replace(text=cfg.text.replace(quant="int8", decode_kernel=dk,
                                            quant_embed=qe))
    ps = cfg.patch_size
    rows, cols = -(-H // ps), -(-W // ps)
    n_patches = rows * cols
    prompt = 16
    s = n_patches + rows + prompt          # patches + newlines + text
    patch_dim = ps * ps * 3

    rng = np.random.default_rng(0)
    patches = jnp.zeros((1, n_patches, patch_dim), jnp.bfloat16)
    ids = np.asarray(rng.integers(5, 250000, (1, s)), np.int32)
    indices = np.full((1, s), -1, np.int64)
    pos = 0
    for r in range(rows):
        indices[0, pos:pos + cols] = np.arange(r * cols, (r + 1) * cols)
        ids[0, pos + cols] = cfg.image_newline_id
        pos += cols + 1
    indices = jnp.asarray(indices.astype(np.int32))
    lang_x = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    model = FuyuVLM(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), lang_x,
        image_patches=patches, image_patches_indices=indices)
    params = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype if not jnp.issubdtype(
            sh.dtype, jnp.floating) else jnp.bfloat16), shapes)
    n_gb = sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)) / 1e9

    # round the cache to a 512 multiple so the decode kernel keeps
    # block_k=512 (L=2432 would force block_k down to 128 — 19 prime
    # blocks); blocks past the valid length are skipped, so the padding
    # costs no HBM traffic
    L = -(-(s + 64) // 512) * 512
    positions = jnp.cumsum(mask, -1) - 1

    @jax.jit
    def prefill(params, ids, patches, indices, mask):
        cache = init_cache(cfg.text, 1, L, cache_dtype)
        # head_last_only: the full [1, S, 262k] f32 prefill logits are
        # 2.5 GB — over the measured usable-HBM edge next to the 8B's
        # params (BENCH_NOTES round-5 HBM-drift note), and serving only
        # needs the next-token row anyway
        logits, cache = model.apply(
            params, ids, image_patches=patches,
            image_patches_indices=indices, attention_mask=mask,
            positions=positions, cache=cache, head_last_only=True)
        return jnp.argmax(logits[:, -1], -1), cache

    def timed(f, n=3):
        f()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_pre = timed(lambda: np.asarray(
        prefill(params, lang_x, patches, indices, mask)[0])) * 1e3

    # decode: fori_loop of cached steps, marginal. The cache is DONATED
    # and re-created per timed call: an un-donated loop carry doubles
    # the 1.5 GB cache footprint (OOM at today's usable-HBM edge —
    # BENCH_NOTES round-5 HBM-drift note), and a known-zeros in-jit
    # cache triggers XLA's DUS->pad+copy rewrite (full cache copies per
    # step). Zeros are throughput-identical: decode reads the same
    # cache_len-static bytes regardless of values.
    import functools
    kv_valid = jnp.arange(L)[None, :] < s

    def build(n):
        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, tok, cache):
            def body(i, carry):
                tok, cache = carry
                logits, cache = model.apply(
                    params, tok, cache=cache, cache_pos=s,
                    kv_valid=kv_valid,
                    positions=jnp.full((1, 1), s, jnp.int32))
                return (jnp.argmax(logits[:, -1:], -1).astype(jnp.int32),
                        cache)
            # the cache is RETURNED so donation can alias it
            # input->output (donation only reuses buffers for outputs;
            # a dropped carry gets its own copy)
            return lax.fori_loop(0, n, body, (tok, cache))

        def f():
            cache = init_cache(cfg.text, 1, L, cache_dtype)
            tok, _ = run(params, jnp.zeros((1, 1), jnp.int32), cache)
            return np.asarray(tok)
        return f

    t1, tn = timed(build(1)), timed(build(21))
    step = (tn - t1) / 20
    print(f"otterhd-8b int8 ({n_gb:.1f} GB params, {cache_bit} cache"
          f"{', int8 wte' if qe else ''}) {H}x{W} "
          f"({n_patches} patches, seq {s}): prefill "
          f"{t_pre - RELAY_MS:.0f} ms, decode {1 / step:.1f} tok/s")


if __name__ == "__main__":
    main()
