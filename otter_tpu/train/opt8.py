"""Blockwise 8-bit Adam states (the bitsandbytes 8-bit-optimizer idea,
Dettmers et al. 2022 — the same library whose int8/int4 inference loading
the reference uses, `pipeline/serve/model_worker.py:91-100`), as an optax
transformation.

Adam's m/v are pure per-parameter accumulators: quantizing their STORAGE
to int8 (dequantize -> f32 update math -> requantize, all fused in-jit)
cuts optimizer memory from 8 to ~2.06 bytes/param. This is what makes the
single-chip 7B SFT fit a 16 GB v5e: trainable 1.39B params' Adam states
drop 8.3 GB -> 2.9 GB (see docs/scaling.md "7B on one chip").

Quantization schemes per accumulator:
  - mu (signed, zero-centered): linear absmax int8 per `block` values.
  - nu (non-negative, ~6 orders of dynamic range): absmax int8 in SQRT
    space — sqrt halves the log-range, and nu only enters the update as
    sqrt(nu), so the stored domain is exactly the consumed domain.

Per-block absmax with block=512 keeps the worst-case relative step-size
error for a parameter whose nu is 100x below its block max at ~8%;
`tests/test_train.py::test_int8_adam_*` validate update parity and a
tiny-training loss trajectory against f32 Adam.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByAdam8State(NamedTuple):
    count: chex.Array
    mu_q: Any      # int8 trees [nblocks, block]
    mu_s: Any      # f32 trees [nblocks, 1]
    nu_q: Any
    nu_s: Any


def _blocked(x: jnp.ndarray, block: int) -> jnp.ndarray:
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, block)


def _quantize(x: jnp.ndarray, block: int):
    """f32 [..] -> (int8 [nb, block], f32 scale [nb, 1])."""
    b = _blocked(x.astype(jnp.float32), block)
    amax = jnp.max(jnp.abs(b), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dequantize(q: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    n = 1
    for s in shape:
        n *= s
    return (q.astype(jnp.float32) * scale).reshape(-1)[:n].reshape(shape)


def scale_by_adam8(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   block: int = 512) -> optax.GradientTransformation:
    """Adam with int8 blockwise-quantized m/v storage; update math in f32."""

    def init_fn(params):
        def mk(p):
            z = jnp.zeros(p.shape, jnp.float32)
            return _quantize(z, block)
        qs = jax.tree_util.tree_map(mk, params)
        mu_q = jax.tree_util.tree_map(lambda t: t[0], qs,
                                      is_leaf=lambda t: isinstance(t, tuple))
        mu_s = jax.tree_util.tree_map(lambda t: t[1], qs,
                                      is_leaf=lambda t: isinstance(t, tuple))
        return ScaleByAdam8State(
            count=jnp.zeros((), jnp.int32),
            mu_q=mu_q, mu_s=jax.tree_util.tree_map(jnp.asarray, mu_s),
            nu_q=jax.tree_util.tree_map(jnp.copy, mu_q),
            nu_s=jax.tree_util.tree_map(jnp.copy, mu_s))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def chunk_update(gc, mqc, msc, nqc, nsc, out_dtype):
            """One chunk's f32 update math: [CH, block] in, quantized
            states + a low-precision step out."""
            gf = gc.astype(jnp.float32)
            mu = mqc.astype(jnp.float32) * msc
            nu_sqrt = nqc.astype(jnp.float32) * nsc
            nu = nu_sqrt * nu_sqrt
            mu = b1 * mu + (1.0 - b1) * gf
            nu = b2 * nu + (1.0 - b2) * gf * gf
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)

            def q(x):
                amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
                s = jnp.where(amax > 0, amax / 127.0, 1.0)
                return (jnp.clip(jnp.round(x / s), -127,
                                 127).astype(jnp.int8), s)

            mq2, ms2 = q(mu)
            nq2, ns2 = q(jnp.sqrt(nu))
            return step.astype(out_dtype), mq2, ms2, nq2, ns2

        # Chunked-sequential update (lax.map = scan): the naive per-leaf
        # form dequantizes m/v to full-size f32 transients and XLA's
        # scheduler runs every leaf concurrently — at 7B xattn-FF shapes
        # that is N x 256 MB of simultaneously-live HLO temps (measured
        # 10-11 G, an OOM on a 16 G chip; an optimization_barrier chain
        # did NOT bound it). Mapping over ~16 MB chunks of blocks bounds
        # the transient to one chunk's working set per leaf, and the step
        # leaves the map in the params dtype (bf16 in training), never
        # materializing a full f32 tensor.
        chunk_blocks = max(1, (16 << 20) // (4 * block))

        def upd(g, mq, ms, nq, ns):
            out_dtype = g.dtype
            gb = _blocked(g, block)            # reshape view, params dtype
            nb = gb.shape[0]
            if nb <= chunk_blocks:
                step, mq2, ms2, nq2, ns2 = chunk_update(
                    gb, mq, ms, nq, ns, out_dtype)
            else:
                nch = -(-nb // chunk_blocks)
                pad = nch * chunk_blocks - nb

                def p(x, fill=0):
                    return jnp.pad(x, ((0, pad), (0, 0)),
                                   constant_values=fill) if pad else x

                shaped = lambda x: x.reshape(nch, chunk_blocks, -1)
                step, mq2, ms2, nq2, ns2 = jax.lax.map(
                    lambda a: chunk_update(*a, out_dtype),
                    (shaped(p(gb)), shaped(p(mq)), shaped(p(ms, 1)),
                     shaped(p(nq)), shaped(p(ns, 1))))
                unshape = lambda x: x.reshape(nch * chunk_blocks, -1)[:nb]
                step, mq2, ms2, nq2, ns2 = map(
                    unshape, (step, mq2, ms2, nq2, ns2))
            n = g.size
            step = step.reshape(-1)[:n].reshape(g.shape)
            return step, mq2, ms2, nq2, ns2

        out = jax.tree_util.tree_map(
            upd, updates, state.mu_q, state.mu_s, state.nu_q, state.nu_s)
        is_tup = lambda t: isinstance(t, tuple) and len(t) == 5
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], out, is_leaf=is_tup)
        return pick(0), ScaleByAdam8State(
            count=count, mu_q=pick(1), mu_s=pick(2),
            nu_q=pick(3), nu_s=pick(4))

    return optax.GradientTransformation(init_fn, update_fn)
