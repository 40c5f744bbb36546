"""Chunked prefill A/B on the real chip: the user-visible decode stall an
active stream suffers while long-prompt requests are admitted, one-shot
vs --prefill-chunk (BENCH_NOTES "chunked prefill").

Method: stream A (short prompt) decodes continuously; mid-stream, two
long-prompt (bucket 1024) requests are submitted. A's inter-token arrival
gaps are recorded at the consumer; the headline is A's max/p99 gap during
the admission window — one-shot prefill inserts the whole 1024-token
program between two of A's decode steps, chunking bounds it at one
chunk's compute.

Usage: python tools/bench_chunked_prefill.py [--tiny]
  --tiny: CPU smoke of the harness logic on OtterConfig.tiny (no numbers
  worth recording; the real run needs the chip).

Round-5 composition variant (VERDICT r4 #6 — chunked prefill x
long-cache): the C=256 default was tuned at bucket-1024 admissions on
MPT-1B bf16; with L=2048 slots and a quantized cache the per-chunk
compute and the steady-state decode step both change, so re-measure:

  python tools/bench_chunked_prefill.py --model 7b --long-bucket 2048 \
      --cache-len 2048 --cache-bit int4 --chunks 0 256 512
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", choices=["1b", "7b"], default="1b")
    ap.add_argument("--long-bucket", type=int, default=1024)
    ap.add_argument("--cache-len", type=int, default=0,
                    help="slot cache length (default 2x long bucket)")
    ap.add_argument("--cache-bit", choices=["bf16", "int8", "int4"],
                    default="bf16")
    ap.add_argument("--chunks", type=int, nargs="*", default=None)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()
    tiny = args.tiny
    import jax
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from otter_tpu.config import (GenerationConfig, OtterConfig,
                                  otter_mpt1b, otter_mpt7b)
    from otter_tpu.generation.batching import ContinuousBatcher
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    if tiny:
        cfg = OtterConfig.tiny("mpt")
        img, long_bucket, short_bucket, chunks = 28, 32, 16, (0, 8)
        a_new, long_new = 40, 4
        cache_len = long_bucket * 2
    else:
        if args.model == "7b":
            cfg = otter_mpt7b()
            cfg = cfg.replace(text=cfg.text.replace(
                quant="int8", decode_kernel="auto"))
        else:
            cfg = otter_mpt1b()
        img, short_bucket = 224, 128
        long_bucket = args.long_bucket
        chunks = tuple(args.chunks) if args.chunks is not None \
            else (0, 256, 128)
        a_new, long_new = 192, 8
        cache_len = args.cache_len or long_bucket * 2
    cache_dtype = {"bf16": jnp.bfloat16, "int8": "int8",
                   "int4": "int4"}[args.cache_bit]
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vx = jnp.zeros((1, 1, 1, 3, img, img), jnp.bfloat16)
    vocab_hi = min(cfg.text.vocab_size - 1, 50000)
    ids_a = np.asarray(rng.integers(5, vocab_hi, (1, short_bucket - 4)),
                       np.int32)
    ids_a[:, 0] = cfg.media_token_id
    ids_long = np.asarray(rng.integers(5, vocab_hi,
                                       (1, long_bucket - 8)), np.int32)
    ids_long[:, 0] = cfg.media_token_id
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), vx,
                            jnp.asarray(ids_a))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if jnp.issubdtype(
            s.dtype, jnp.floating) else s.dtype), shapes)

    gen_a = GenerationConfig(max_new_tokens=a_new, eos_token_id=-1)
    gen_long = GenerationConfig(max_new_tokens=long_new, eos_token_id=-1)

    def run(chunk):
        b = ContinuousBatcher(
            model, params, cfg, num_slots=args.slots if not tiny else 4,
            cache_len=cache_len,
            buckets=(short_bucket, long_bucket),
            cache_dtype=cache_dtype, prefill_chunk=chunk)
        try:
            # warm every jit variant of both arms
            list(b.submit(vx, ids_a, gen_a.replace(max_new_tokens=4)))
            list(b.submit(vx, ids_long, gen_long))

            stream = b.submit(vx, ids_a, gen_a)
            gaps, last = [], None
            n_seen = 0
            for _tok in stream:
                now = time.perf_counter()
                if last is not None:
                    gaps.append(now - last)
                last = now
                n_seen += 1
                if n_seen == a_new // 4:     # admissions mid-stream
                    b.submit(vx, ids_long, gen_long)
                    b.submit(vx, ids_long, gen_long)
            steady = sorted(gaps)[: max(1, len(gaps) // 2)]
            return dict(chunk=chunk, n=len(gaps),
                        steady_ms=1e3 * float(np.mean(steady)),
                        p50_ms=1e3 * pct(gaps, 50),
                        p99_ms=1e3 * pct(gaps, 99),
                        max_ms=1e3 * max(gaps))
        finally:
            b.shutdown()

    for chunk in chunks:
        r = run(chunk)
        label = "one-shot" if chunk == 0 else f"chunk={chunk}"
        print(f"{label:>10}: steady {r['steady_ms']:.1f} ms | p50 "
              f"{r['p50_ms']:.1f} | p99 {r['p99_ms']:.1f} | max "
              f"{r['max_ms']:.1f} ms over {r['n']} gaps")


if __name__ == "__main__":
    main()
