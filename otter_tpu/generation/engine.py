"""Jitted generation engine: batched left-padded prefill + KV-cached decode.

Replaces HF `GenerationMixin.generate` as driven by the reference
(`modeling_otter.py:999-1041`: encode vision once, generate with
eos=<|endofchunk|>, clear conditioning) with two TPU-native paths:

  - `generate()`   — the whole decode loop inside one jitted
                     `lax.while_loop` (eval/bench; no host round-trips)
  - `stream_generate()` — jitted prefill + jitted single-step decode driven
                     from a Python loop, yielding tokens for the serving
                     stack's streaming protocol (`model_worker.py:251-263`)

Vision latents are encoded once per call and reused every step (the
`use_cached_vision_x` behavior).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation import sampling
from otter_tpu.models.decoder import init_cache
from otter_tpu.models.otter import OtterVLM


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
               for x in jax.tree_util.tree_leaves(tree))


def cache_bytes(text_cfg, batch: int, cache_len: int, dtype) -> int:
    """HBM footprint of one KV cache (entries + quantization scales)."""
    shapes = jax.eval_shape(
        lambda: init_cache(text_cfg, batch, cache_len, dtype))
    return _tree_bytes(shapes)


_LADDER = ["bf16", "int8", "int4"]


def _cache_name(dtype) -> str:
    if isinstance(dtype, str):
        return dtype
    return "int8" if jnp.dtype(dtype) == jnp.int8 else "bf16"


def select_cache_dtype(params, text_cfg, batch: int, cache_len: int,
                       requested, *, hbm_bytes: Optional[float] = None,
                       headroom_bytes: Optional[float] = None) -> Any:
    """Degrade-not-die KV-cache precision (round 5, VERDICT r4 #1b).

    A serving engine asked for a (batch, cache_len, cache_dtype) whose
    static footprint (resident params + cache + workspace headroom)
    exceeds the chip's HBM should degrade the cache one precision step
    (bf16 -> int8 -> int4) and keep serving, not kill the worker — the
    reference instead hardcodes its context window to dodge this
    (`pipeline/serve/model_worker.py:115`). The int4 cache is the fused
    nibble-plane layout (ops.quant.quantize_kv_int4), measured running
    the bare 7B decoder at b8/L4096 with 4.3 GB free where int8 sits at
    the 16 GB wall (BENCH_NOTES int4-cache table). Quality ladder is
    documented in BENCH_NOTES "Quantized-serving quality"; every degrade
    is surfaced as a warning so operators see the precision drop.

    Only engages on TPU backends (CPU test meshes have no HBM wall).
    Returns the requested dtype unchanged when it fits.

    headroom_bytes covers execution temps (prefill logits, loop
    buffers, Mosaic scratch) AND whatever slice of HBM the runtime
    itself holds back. Empirically this edge MOVES between sessions on
    the tunneled worker: in round 4 the 7B engine ran clean at
    11.1 GB static (b8/L1024 int8 cache, 554 tok/s) and died at
    13.1 GB; in round 5 the SAME round-4 code dies at 11.1 GB static
    while 10.0 GB (b8/L1024 int4 cache, 385 tok/s measured) runs —
    about 2 GB of usable HBM vanished with zero code change (verified
    by rerunning the r4 commit in a worktree). The default headroom is
    therefore calibrated to the WORST observed edge (5.0 GB flips
    11.1 GB-static configs down one rung), because a degrade that
    triggers a step early costs quality margin while one that triggers
    a step late kills the worker. Operators with a dedicated chip can
    reclaim the difference via OTTER_HBM_BYTES / OTTER_HBM_HEADROOM
    (bytes; both read at call time) or the engine's hbm_bytes arg."""
    if jax.default_backend() != "tpu":
        return requested
    env_hbm = os.environ.get("OTTER_HBM_BYTES")
    env_head = os.environ.get("OTTER_HBM_HEADROOM")
    if hbm_bytes is None:
        hbm_bytes = float(env_hbm) if env_hbm else 16e9
    if headroom_bytes is None:
        headroom_bytes = float(env_head) if env_head else 5.0e9
    name = _cache_name(requested)
    budget = hbm_bytes - headroom_bytes - _tree_bytes(params)
    ladder = _LADDER[_LADDER.index(name):]
    for step in ladder:
        dt = {"bf16": jnp.bfloat16, "int8": "int8", "int4": "int4"}[step]
        if cache_bytes(text_cfg, batch, cache_len, dt) <= budget:
            if step != name:
                import warnings
                warnings.warn(
                    f"KV cache degraded {name} -> {step}: a b={batch} "
                    f"L={cache_len} {name} cache does not fit next to "
                    f"{_tree_bytes(params)/1e9:.1f} GB of params in "
                    f"{hbm_bytes/1e9:.1f} GB HBM "
                    f"(headroom {headroom_bytes/1e9:.1f} GB). "
                    f"Shard the model or lower batch/cache_len to keep "
                    f"{name}.", stacklevel=2)
            return dt
    import warnings
    warnings.warn(
        f"KV cache b={batch} L={cache_len} exceeds HBM even at int4; "
        f"proceeding with int4 (expect OOM — shard or reduce load)",
        stacklevel=2)
    return "int4"


def left_pad(lang_x: np.ndarray, attention_mask: Optional[np.ndarray],
             target_len: Optional[int] = None, pad_id: int = 0):
    """Right-padded (or ragged-masked) batch -> left-padded [B, P]."""
    lang_x = np.asarray(lang_x)
    b, s = lang_x.shape
    if attention_mask is None:
        attention_mask = np.ones_like(lang_x)
    attention_mask = np.asarray(attention_mask)
    p = target_len or s
    out = np.full((b, p), pad_id, lang_x.dtype)
    mask = np.zeros((b, p), np.int32)
    for i in range(b):
        real = lang_x[i][attention_mask[i].astype(bool)]
        out[i, p - len(real):] = real
        mask[i, p - len(real):] = 1
    return out, mask


class OtterGenerator:
    def __init__(self, model: OtterVLM, params, cfg: OtterConfig,
                 cache_dtype=jnp.bfloat16,
                 hbm_bytes: Optional[float] = None,
                 cache_degrade: bool = True):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.cache_dtype = cache_dtype
        self.hbm_bytes = hbm_bytes
        self.cache_degrade = cache_degrade
        self._cache_dtypes: Dict[Any, Any] = {}
        self._prefill_fns: Dict[Any, Any] = {}
        self._step_fns: Dict[Any, Any] = {}
        self._loop_fns: Dict[Any, Any] = {}

    def _cache_dtype_for(self, b: int, cache_len: int):
        """Effective cache dtype for this (batch, cache_len): the
        requested precision, degraded down the bf16->int8->int4 ladder
        when the static footprint would not fit HBM (degrade-not-die —
        see select_cache_dtype)."""
        if not self.cache_degrade:
            return self.cache_dtype
        key = (b, cache_len)
        if key not in self._cache_dtypes:
            self._cache_dtypes[key] = select_cache_dtype(
                self.params, self.cfg.text, b, cache_len,
                self.cache_dtype, hbm_bytes=self.hbm_bytes)
        return self._cache_dtypes[key]

    # ── building blocks ──────────────────────────────────────────────

    def _prefill(self, params, vision_x, lang_x, attention_mask, cache,
                 vision_mask=None):
        """Returns (last_logits [B, V], cache, vis_latents, positions info)."""
        positions = jnp.clip(
            jnp.cumsum(attention_mask, axis=-1) - 1, 0, None).astype(jnp.int32)
        kw = {} if vision_mask is None else {"vision_mask": vision_mask}
        # head_last_only: prefill needs only the next-token logits; the
        # full [B, P, V] array is wasted lm_head FLOPs on the TTFT path
        # and real HBM at large vocabs (see Decoder docstring)
        logits, cache, vis_latents = self.model.apply(
            params, vision_x, lang_x, attention_mask=attention_mask,
            positions=positions, cache=cache, head_last_only=True, **kw)
        return logits[:, -1], cache, vis_latents

    def _step(self, params, tok, cache, cache_pos, kv_valid, positions,
              vis_latents, media_counts):
        logits, cache, _ = self.model.apply(
            params, None, tok, vis_latents=vis_latents, cache=cache,
            cache_pos=cache_pos, kv_valid=kv_valid, positions=positions,
            media_counts=media_counts)
        return logits[:, -1], cache

    # ── fully-jitted generate ────────────────────────────────────────

    def _build_generate(self, b: int, p: int, cache_len: int,
                        gen: GenerationConfig):
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        max_new = gen.max_new_tokens
        cache_dtype = self._cache_dtype_for(b, cache_len)

        def run(params, vision_x, lang_x, attention_mask, rng):
            cache = init_cache(self.cfg.text, b, cache_len, cache_dtype)
            last_logits, cache, vis_latents = self._prefill(
                params, vision_x, lang_x, attention_mask, cache)
            media_counts = jnp.sum(
                (lang_x == self.cfg.media_token_id).astype(jnp.int32), axis=-1)
            real_len = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            valid_from = p - real_len

            buffer = jnp.concatenate(
                [lang_x, jnp.full((b, cache_len - p), gen.pad_token_id,
                                  lang_x.dtype)], axis=-1)
            kv_valid0 = jnp.concatenate(
                [attention_mask.astype(bool),
                 jnp.zeros((b, cache_len - p), bool)], axis=-1)

            def sample_from(rng, logits, buffer, t, done):
                logits = sampling.process_logits(
                    logits, buffer, p + t, gen, valid_from)
                tok = sampling.sample_token(
                    rng, logits, do_sample=gen.do_sample,
                    temperature=gen.temperature, top_k=gen.top_k,
                    top_p=gen.top_p)
                tok = jnp.where(done, gen.pad_token_id, tok)
                return tok

            rng, sub = jax.random.split(rng)
            done0 = jnp.zeros((b,), bool)
            tok0 = sample_from(sub, last_logits, buffer, 0, done0)
            done0 = tok0 == eos
            buffer = buffer.at[:, p].set(tok0)

            def cond(state):
                t, done = state[0], state[3]
                return (t < max_new) & ~jnp.all(done)

            def body(state):
                t, rng, cache, done, buffer, kv_valid, tok = state
                kv_valid = kv_valid | (
                    jnp.arange(cache_len)[None] == p + t - 1)
                positions = (real_len + t - 1)[:, None].astype(jnp.int32)
                logits, cache = self._step(
                    params, tok[:, None], cache, p + t - 1, kv_valid,
                    positions, None if vis_latents is None else vis_latents,
                    media_counts)
                rng, sub = jax.random.split(rng)
                nxt = sample_from(sub, logits, buffer, t, done)
                done = done | (nxt == eos)
                buffer = jax.lax.dynamic_update_slice(
                    buffer, nxt[:, None], (0, p + t))
                return (t + 1, rng, cache, done, buffer, kv_valid, nxt)

            state = (jnp.int32(1), rng, cache, done0, buffer, kv_valid0, tok0)
            t, _, _, done, buffer, _, _ = jax.lax.while_loop(cond, body, state)
            return buffer[:, : p + max_new], t

        return jax.jit(run, donate_argnums=())

    def generate(self, vision_x, lang_x, attention_mask=None,
                 gen: Optional[GenerationConfig] = None,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """vision_x [B,T,F,C,H,W]; lang_x [B,P] LEFT-padded (use `left_pad`).
        Returns [B, P + max_new_tokens] (prompt + generation, eos-terminated,
        pad-filled). num_beams > 1 dispatches to jitted beam search."""
        gen = gen or GenerationConfig()
        lang_x = jnp.asarray(lang_x)
        b, p = lang_x.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, p), jnp.int32)
        attention_mask = jnp.asarray(attention_mask)
        cache_len = _round_up(p + gen.max_new_tokens, 128)
        if gen.num_beams > 1:
            key = ("beam", b, p, cache_len, gen)
            if key not in self._loop_fns:
                self._loop_fns[key] = self._build_beam_generate(
                    b, p, cache_len, gen)
            out = self._loop_fns[key](self.params, vision_x, lang_x,
                                      attention_mask)
            return np.concatenate([np.asarray(lang_x), np.asarray(out)], 1)
        key = (b, p, cache_len, gen)
        if key not in self._loop_fns:
            self._loop_fns[key] = self._build_generate(b, p, cache_len, gen)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out, _ = self._loop_fns[key](self.params, vision_x, lang_x,
                                     attention_mask, rng)
        return np.asarray(out)

    def _build_beam_generate(self, b: int, p: int, cache_len: int,
                             gen: GenerationConfig):
        """Beam search: inputs tiled to B*K before prefill (the reference's
        repeat_interleave for beams, modeling_otter.py:1030-1032), then the
        jitted candidate-expansion loop in generation/beam.py."""
        from otter_tpu.generation.beam import beam_search
        k = gen.num_beams
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        cache_dtype = self._cache_dtype_for(b * k, cache_len)

        def run(params, vision_x, lang_x, attention_mask):
            vx = jnp.repeat(vision_x, k, axis=0)
            lx = jnp.repeat(lang_x, k, axis=0)
            am = jnp.repeat(attention_mask, k, axis=0)
            cache = init_cache(self.cfg.text, b * k, cache_len, cache_dtype)
            last_logits, cache, vis_latents = self._prefill(
                params, vx, lx, am, cache)
            media_counts = jnp.sum(
                (lx == self.cfg.media_token_id).astype(jnp.int32), axis=-1)
            real_len = jnp.sum(am.astype(jnp.int32), axis=-1)
            kv_valid0 = jnp.concatenate(
                [am.astype(bool),
                 jnp.zeros((b * k, cache_len - p), bool)], axis=-1)
            valid_from = p - real_len
            init_logits = sampling.process_logits(
                last_logits[::k], lang_x, p, gen, valid_from[::k])  # [B, V]

            def logits_processor(logits, gen_tokens, t):
                # prepend the (left-padded) prompt so ngram/bad-word bans
                # see the full context, as HF processors do
                buf = jnp.concatenate([lx, gen_tokens], axis=1)
                return sampling.process_logits(logits, buf, p + t, gen,
                                               valid_from)

            def step_fn(tok, cache, t):
                kv_valid = kv_valid0 | (
                    jnp.arange(cache_len)[None] < p + t)
                positions = (real_len + t - 1)[:, None].astype(jnp.int32)
                logits, cache = self._step(
                    params, tok, cache, p + t - 1, kv_valid, positions,
                    vis_latents, media_counts)
                return logits, cache

            out, _ = beam_search(
                step_fn, init_logits, cache, num_beams=k,
                max_new_tokens=gen.max_new_tokens, eos_token_id=eos,
                pad_token_id=gen.pad_token_id,
                length_penalty=gen.length_penalty,
                logits_processor=(
                    logits_processor if gen.no_repeat_ngram_size
                    or gen.bad_words_ids else None))
            return out

        return jax.jit(run)

    # ── streaming beam search (serving) ──────────────────────────────

    def stream_beam_generate(self, vision_x, lang_x, attention_mask=None,
                             gen: Optional[GenerationConfig] = None,
                             chunk: int = 4) -> Iterator[list]:
        """Beam search with live streaming: yields the CURRENT best beam's
        token list every `chunk` steps (the final yield is exactly
        `generate(num_beams=k)`'s continuation). Later yields may revise
        earlier tokens — cumulative-text protocols re-render per chunk, so
        this unifies beams with the worker's streaming path."""
        from otter_tpu.generation.beam import beam_search_chunks
        gen = gen or GenerationConfig()
        k = gen.num_beams
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        lang_x = jnp.asarray(lang_x)
        b, p = lang_x.shape
        assert b == 1, "streaming serves one request; batch via " \
                       "generation.batching.ContinuousBatcher"
        if attention_mask is None:
            attention_mask = jnp.ones((b, p), jnp.int32)
        attention_mask = jnp.asarray(attention_mask)
        cache_len = _round_up(p + gen.max_new_tokens, 128)

        key = ("beam_stream", b, p, cache_len, k)
        if key not in self._prefill_fns:
            cache_dtype = self._cache_dtype_for(b * k, cache_len)

            def prefill(params, vision_x, lang_x, attention_mask):
                vx = jnp.repeat(vision_x, k, axis=0)
                lx = jnp.repeat(lang_x, k, axis=0)
                am = jnp.repeat(attention_mask, k, axis=0)
                cache = init_cache(self.cfg.text, b * k, cache_len,
                                   cache_dtype)
                last_logits, cache, vis_latents = self._prefill(
                    params, vx, lx, am, cache)
                media_counts = jnp.sum(
                    (lx == self.cfg.media_token_id).astype(jnp.int32),
                    axis=-1)
                real_len = jnp.sum(am.astype(jnp.int32), axis=-1)
                kv_valid0 = jnp.concatenate(
                    [am.astype(bool),
                     jnp.zeros((b * k, cache_len - p), bool)], axis=-1)
                return (last_logits, cache, vis_latents, media_counts,
                        real_len, kv_valid0, lx)
            self._prefill_fns[key] = jax.jit(prefill)

        (last_logits, cache, vis_latents, media_counts, real_len,
         kv_valid0, lx) = self._prefill_fns[key](
            self.params, jnp.asarray(vision_x), lang_x, attention_mask)
        valid_from = p - real_len
        init_logits = sampling.process_logits(
            last_logits[::k], lang_x, p, gen, valid_from[::k])

        def step_fn(tok, cache_, t):
            kv_valid = kv_valid0 | (jnp.arange(cache_len)[None] < p + t)
            positions = (real_len + t - 1)[:, None].astype(jnp.int32)
            logits, cache_ = self._step(
                self.params, tok, cache_, p + t - 1, kv_valid, positions,
                vis_latents, media_counts)
            return logits, cache_

        def logits_processor(logits, gen_tokens, t):
            buf = jnp.concatenate([lx, gen_tokens], axis=1)
            return sampling.process_logits(logits, buf, p + t, gen,
                                           valid_from)

        lp = (logits_processor if gen.no_repeat_ngram_size
              or gen.bad_words_ids else None)
        for out, t in beam_search_chunks(
                step_fn, init_logits, cache, num_beams=k,
                max_new_tokens=gen.max_new_tokens, eos_token_id=eos,
                pad_token_id=gen.pad_token_id,
                length_penalty=gen.length_penalty, logits_processor=lp,
                chunk=chunk):
            toks = []
            for x in np.asarray(out[0, :t]):
                if int(x) == eos:
                    break
                toks.append(int(x))
            yield toks

    # ── streaming generate (serving) ─────────────────────────────────

    def stream_generate(self, vision_x, lang_x, attention_mask=None,
                        gen: Optional[GenerationConfig] = None,
                        rng: Optional[jax.Array] = None,
                        vision_mask=None) -> Iterator[int]:
        """Yields one token id at a time (greedy/sampled), stopping at eos.
        Python-driven loop over a jitted single step — used by the serving
        worker for `\\0`-delimited JSON streaming. Multi-request streaming
        goes through generation.batching.ContinuousBatcher instead.
        vision_mask [B,T,F]: real-frame mask for mixed still+video media."""
        gen = gen or GenerationConfig()
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        lang_x = jnp.asarray(lang_x)
        b, p = lang_x.shape
        assert b == 1, "one request per stream; batch via ContinuousBatcher"
        if attention_mask is None:
            attention_mask = jnp.ones((b, p), jnp.int32)
        attention_mask = jnp.asarray(attention_mask)
        cache_len = _round_up(p + gen.max_new_tokens, 128)

        pk = (b, p, cache_len, vision_mask is None)
        if pk not in self._prefill_fns:
            cache_dtype = self._cache_dtype_for(b, cache_len)

            def prefill(params, vision_x, lang_x, attention_mask,
                        vision_mask):
                cache = init_cache(self.cfg.text, b, cache_len, cache_dtype)
                return self._prefill(params, vision_x, lang_x,
                                     attention_mask, cache, vision_mask)
            self._prefill_fns[pk] = jax.jit(prefill)
        sk = (b, cache_len)
        if sk not in self._step_fns:
            # donate the cache: the streaming loop threads it through the
            # jit boundary every token, and an undonated 1 GB-class cache
            # costs a full entry copy per step
            self._step_fns[sk] = jax.jit(self._step, donate_argnums=(2,))

        last_logits, cache, vis_latents = self._prefill_fns[pk](
            self.params, vision_x, lang_x, attention_mask, vision_mask)
        media_counts = jnp.sum(
            (lang_x == self.cfg.media_token_id).astype(jnp.int32), axis=-1)
        real_len = int(jnp.sum(attention_mask))
        kv_valid = jnp.concatenate(
            [attention_mask.astype(bool),
             jnp.zeros((b, cache_len - p), bool)], axis=-1)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        logits = last_logits
        buffer = np.concatenate(
            [np.asarray(lang_x),
             np.full((b, gen.max_new_tokens), gen.pad_token_id, np.int32)],
            axis=1)
        valid_from = p - real_len
        for t in range(gen.max_new_tokens):
            rng, sub = jax.random.split(rng)
            if gen.no_repeat_ngram_size or gen.bad_words_ids:
                logits = sampling.process_logits(
                    logits, jnp.asarray(buffer), p + t, gen, valid_from)
            tok = sampling.sample_token(
                sub, logits, do_sample=gen.do_sample,
                temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p)
            tok_i = int(tok[0])
            if tok_i == eos:
                return
            buffer[:, p + t] = tok_i
            yield tok_i
            kv_valid = kv_valid | (jnp.arange(cache_len)[None] == p + t)
            positions = jnp.full((b, 1), real_len + t, jnp.int32)
            logits, cache = self._step_fns[sk](
                self.params, tok[:, None], cache, p + t, kv_valid, positions,
                vis_latents, media_counts)
