"""Cross-turn KV session cache: chat turn N prefills ONLY the new tokens.

The reference serving stack (and our stateless worker path) re-prefills
the ENTIRE conversation every turn (`pipeline/serve/model_worker.py:181`
rebuilds the prompt from scratch; HF generate re-encodes it), so turn-N
TTFT grows with the whole history. A `ChatSession` keeps the KV cache,
vision latents, and the ingested-token record between turns; the next
request's prompt is prefix-matched against what the cache already holds
and only the unseen suffix runs a (bucketed) multi-token decode window.
Beyond-reference capability; TPU-native by construction:

  - one fixed-`cache_len` cache per session — every turn reuses the same
    static shapes, so the whole conversation is served by three compiled
    graphs (first-turn prefill, suffix window per bucket, decode step);
  - the suffix runs as an s>1 decode window (the same machinery as
    speculative verification): intra-window causality + `kv_valid`
    column masking mean right-padding a suffix up to its bucket is
    harmless — padded rows write columns that stay outside `kv_valid`
    until genuinely overwritten, and nothing ever rolls back;
  - divergence is free: if the client edits history (or the reply
    re-tokenizes differently across the turn boundary), the longest
    common prefix is kept and the window simply starts writing at the
    divergence column — stale columns beyond it are unattendable until
    overwritten.

Reuse is declined (full re-prefill) when the vision input changes, when
a media token appears in the suffix, or when the common prefix is
shorter than `min_reuse` — correctness never depends on the heuristics,
only TTFT does. Output is bit-identical to `OtterGenerator
.stream_generate` on the full prompt (tests/test_session.py).
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.generation import sampling
from otter_tpu.models.decoder import init_cache


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vision_hash(vision_x) -> str:
    a = np.asarray(vision_x)
    return hashlib.sha1(
        str(a.shape).encode() + np.ascontiguousarray(a).tobytes()
    ).hexdigest()


class ChatSession:
    """One conversation's persistent decode state over an OtterVLM.

    `stream()` has the same full-prompt interface as
    `OtterGenerator.stream_generate` — the caller still sends the whole
    conversation every turn (the serving protocol is unchanged); the
    session just avoids recomputing the part it already holds."""

    def __init__(self, model, params, cfg: OtterConfig, *,
                 cache_len: int = 2048, prompt_bucket: int = 128,
                 window_bucket: int = 64, min_reuse: int = 16,
                 cache_dtype=jnp.bfloat16):
        self.model, self.params, self.cfg = model, params, cfg
        self.cache_len = cache_len
        self.prompt_bucket = prompt_bucket
        self.window_bucket = window_bucket
        self.min_reuse = min_reuse
        self.cache_dtype = cache_dtype
        self._fns: Dict[Any, Any] = {}
        self.last_stats: Dict[str, Any] = {}
        self.reset()

    def reset(self):
        self.cache = None
        self.vis_latents = None
        self.media_count = None
        self.vis_hash = None
        self.base_valid = None      # [1, cache_len] bool (pad mask)
        self.valid_from = 0         # first real cache column
        self.n = 0                  # next free cache column
        self.real_tokens: list = []  # ids at columns valid_from..n-1
        self._last_logits = None

    # ── jitted graphs (cached per shape) ─────────────────────────────

    def _get_prefill(self, p_pad: int):
        key = ("prefill", p_pad)
        if key not in self._fns:
            L = self.cache_len

            def prefill(params, vision_x, lang_x, mask):
                cache = init_cache(self.cfg.text, 1, L, self.cache_dtype)
                positions = jnp.clip(
                    jnp.cumsum(mask, axis=-1) - 1, 0, None
                ).astype(jnp.int32)
                logits, cache, lat = self.model.apply(
                    params, vision_x, lang_x, attention_mask=mask,
                    positions=positions, cache=cache, head_last_only=True)
                return logits[:, -1], cache, lat

            self._fns[key] = jax.jit(prefill)
        return self._fns[key]

    def _get_window(self, sb: int):
        key = ("window", sb)
        if key not in self._fns:
            L = self.cache_len

            def window(params, toks, cache, n, s_real, lat, media,
                       base_valid, pos_base):
                # rows i >= s_real are right-pad: their cache columns stay
                # outside kv_valid and their outputs are discarded
                kv_valid = base_valid & (
                    jnp.arange(L)[None, :] < n + s_real)
                positions = (pos_base + jnp.arange(sb))[None, :].astype(
                    jnp.int32)
                logits, cache, _ = self.model.apply(
                    params, None, toks, vis_latents=lat, cache=cache,
                    cache_pos=n, kv_valid=kv_valid, positions=positions,
                    media_counts=media)
                last = jax.lax.dynamic_slice(
                    logits, (0, s_real - 1, 0), (1, 1, logits.shape[-1]))
                return last[:, 0], cache

            self._fns[key] = jax.jit(window, donate_argnums=(2,))
        return self._fns[key]

    def _get_step(self):
        key = ("step",)
        if key not in self._fns:
            L = self.cache_len

            def step(params, tok, cache, n, lat, media, base_valid,
                     pos):
                kv_valid = base_valid & (jnp.arange(L)[None, :] <= n)
                logits, cache, _ = self.model.apply(
                    params, None, tok, vis_latents=lat, cache=cache,
                    cache_pos=n, kv_valid=kv_valid,
                    positions=pos[:, None], media_counts=media)
                return logits[:, -1], cache

            self._fns[key] = jax.jit(step, donate_argnums=(2,))
        return self._fns[key]

    # ── public API ───────────────────────────────────────────────────

    def stream(self, vision_x, lang_x, attention_mask=None,
               gen: Optional[GenerationConfig] = None,
               rng: Optional[jax.Array] = None) -> Iterator[int]:
        """Yields token ids exactly like `OtterGenerator.stream_generate`
        on the same full prompt; raises ValueError if prompt + max_new
        cannot fit this session's cache_len."""
        gen = gen or GenerationConfig()
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        lang_np = np.asarray(lang_x)
        assert lang_np.shape[0] == 1, "a ChatSession serves one stream"
        if attention_mask is not None:
            keep = np.asarray(attention_mask)[0].astype(bool)
            lang_np = lang_np[:, keep]
        ids = [int(t) for t in lang_np[0]]
        p = len(ids)
        media_count = sum(1 for t in ids if t == self.cfg.media_token_id)
        vh = _vision_hash(vision_x)

        # longest common prefix with what the cache already holds
        m = 0
        if self.cache is not None and vh == self.vis_hash \
                and media_count == self.media_count:
            for a, b in zip(self.real_tokens, ids):
                if a != b:
                    break
                m += 1
        m = min(m, p - 1)   # the window must cover >= 1 token
        suffix_has_media = any(
            t == self.cfg.media_token_id for t in ids[m:])
        reuse = (m >= self.min_reuse and not suffix_has_media
                 and self.valid_from + p + gen.max_new_tokens
                 <= self.cache_len)

        if reuse:
            sb = _round_up(p - m, self.window_bucket)
            toks = np.zeros((1, sb), np.int32)
            toks[0, : p - m] = ids[m:]
            n0 = self.valid_from + m
            last_logits, self.cache = self._get_window(sb)(
                self.params, jnp.asarray(toks), self.cache,
                jnp.int32(n0), jnp.int32(p - m), self.vis_latents,
                self.media_count_arr, self.base_valid,
                jnp.int32(m))
            self.n = n0 + (p - m)
            self.real_tokens = ids[:]
            self.last_stats = {"reused": m, "window": p - m,
                               "window_pad": sb, "restart": False}
        else:
            p_pad = _round_up(p, self.prompt_bucket)
            if p_pad + gen.max_new_tokens > self.cache_len:
                raise ValueError(
                    f"prompt {p} + max_new {gen.max_new_tokens} exceeds "
                    f"session cache_len {self.cache_len}")
            lx = np.zeros((1, p_pad), np.int32)
            mask = np.zeros((1, p_pad), np.int32)
            lx[0, p_pad - p:] = ids
            mask[0, p_pad - p:] = 1
            last_logits, self.cache, self.vis_latents = \
                self._get_prefill(p_pad)(
                    self.params, jnp.asarray(vision_x), jnp.asarray(lx),
                    jnp.asarray(mask))
            self.valid_from = p_pad - p
            self.n = p_pad
            self.base_valid = jnp.asarray(np.concatenate(
                [mask.astype(bool),
                 np.ones((1, self.cache_len - p_pad), bool)], axis=1))
            self.real_tokens = ids[:]
            self.vis_hash = vh
            self.media_count = media_count
            self.media_count_arr = jnp.asarray([media_count], jnp.int32)
            self.last_stats = {"reused": 0, "window": p,
                               "window_pad": p_pad, "restart": True}

        # ── decode loop (mirrors OtterGenerator.stream_generate) ─────
        if rng is None:
            rng = jax.random.PRNGKey(0)
        step = self._get_step()
        buffer = np.zeros((1, self.cache_len), np.int32)
        buffer[0, self.valid_from: self.n] = self.real_tokens
        logits = last_logits
        for t in range(gen.max_new_tokens):
            rng, sub = jax.random.split(rng)
            if gen.no_repeat_ngram_size or gen.bad_words_ids:
                logits = sampling.process_logits(
                    logits, jnp.asarray(buffer), self.n, gen,
                    self.valid_from)
            tok = sampling.sample_token(
                sub, logits, do_sample=gen.do_sample,
                temperature=gen.temperature, top_k=gen.top_k,
                top_p=gen.top_p)
            tok_i = int(tok[0])
            if tok_i == eos:
                return
            buffer[0, self.n] = tok_i
            yield tok_i
            pos = jnp.asarray([self.n - self.valid_from], jnp.int32)
            logits, self.cache = step(
                self.params, tok[:, None], self.cache, jnp.int32(self.n),
                self.vis_latents, self.media_count_arr, self.base_valid,
                pos)
            self.n += 1
            self.real_tokens.append(tok_i)


class SpecChatSession:
    """Cross-turn KV session cache COMPOSED with speculative decoding:
    turn N prefills only the new tokens (into BOTH the target's and the
    draft's caches), then decodes speculatively — session-cache TTFT
    plus per-token speculative throughput in one path.

    Same correctness contract as each half alone: greedy output is
    bit-identical to the target engine's full-prompt greedy decode;
    sampled output is distributed exactly as target-only ancestral
    sampling (tests/test_session.py::test_spec_session_*).

    The reuse bookkeeping extends ChatSession's with one speculative
    subtlety: after a round, the NEWEST emitted token's k/v is not yet
    ingested by either model (the round invariant — it is ingested by
    the next round's opener window). `self.held` therefore counts only
    the leading tokens guaranteed present in both caches, and next
    turn's prefix match is clamped to it; the window simply re-ingests
    the ≤1-token remainder, which its bucket absorbs for free."""

    def __init__(self, spec, *, cache_len: int = 2048,
                 prompt_bucket: int = 128, window_bucket: int = 64,
                 min_reuse: int = 16):
        self.spec = spec
        self.cfg = spec.cfg_t
        self.cache_len = cache_len
        self.prompt_bucket = prompt_bucket
        self.window_bucket = window_bucket
        self.min_reuse = min_reuse
        self._fns: Dict[Any, Any] = {}
        self.last_stats: Dict[str, Any] = {}
        self.reset()

    def reset(self):
        self.cache_t = self.cache_d = None
        self.lat_t = self.lat_d = None
        self.media_count = None
        self.vis_hash = None
        self.base_valid = None
        self.valid_from = 0
        self.n = 0                  # next free cache column
        self.held = 0               # leading real_tokens cached in BOTH models
        self.real_tokens: list = []

    # ── jitted graphs ────────────────────────────────────────────────

    def _get_prefill(self, p_pad: int):
        key = ("prefill", p_pad)
        if key not in self._fns:
            L, sp = self.cache_len, self.spec

            def prefill(params_t, params_d, vision_x, lang_x, mask):
                cache_t = init_cache(sp.cfg_t.text, 1, L, sp.cache_dtype)
                cache_d = init_cache(sp.cfg_d.text, 1, L, sp.cache_dtype)
                last_t, cache_t, lat_t = sp._prefill(
                    sp.model_t, sp.cfg_t, params_t, vision_x, lang_x,
                    mask, cache_t)
                _, cache_d, lat_d = sp._prefill(
                    sp.model_d, sp.cfg_d, params_d, vision_x, lang_x,
                    mask, cache_d)
                return last_t, cache_t, cache_d, lat_t, lat_d

            self._fns[key] = jax.jit(prefill)
        return self._fns[key]

    def _get_window(self, sb: int):
        key = ("window", sb)
        if key not in self._fns:
            L, sp = self.cache_len, self.spec

            def window(params_t, params_d, toks, cache_t, cache_d, n,
                       s_real, lat_t, lat_d, media, base_valid, off):
                # rows i >= s_real are right-pad: their cache columns
                # stay outside kv_valid until genuinely overwritten
                kv_valid = base_valid & (
                    jnp.arange(L)[None, :] < n + s_real)
                positions = (n - off + jnp.arange(sb))[None, :].astype(
                    jnp.int32)
                logits_t, cache_t, _ = sp.model_t.apply(
                    params_t, None, toks, vis_latents=lat_t,
                    cache=cache_t, cache_pos=n, kv_valid=kv_valid,
                    positions=positions, media_counts=media)
                _, cache_d, _ = sp.model_d.apply(
                    params_d, None, toks, vis_latents=lat_d,
                    cache=cache_d, cache_pos=n, kv_valid=kv_valid,
                    positions=positions, media_counts=media)
                last = jax.lax.dynamic_slice(
                    logits_t, (0, s_real - 1, 0),
                    (1, 1, logits_t.shape[-1]))
                return last[:, 0], cache_t, cache_d

            self._fns[key] = jax.jit(window, donate_argnums=(3, 4))
        return self._fns[key]

    # ── public API ───────────────────────────────────────────────────

    def stream(self, vision_x, lang_x, attention_mask=None,
               gen: Optional[GenerationConfig] = None,
               rng: Optional[jax.Array] = None) -> Iterator[int]:
        """Full-prompt interface, like ChatSession.stream; raises
        ValueError when prompt + max_new cannot fit cache_len."""
        from otter_tpu.generation.speculative import processed_probs
        gen = gen or GenerationConfig()
        assert gen.num_beams <= 1, "speculative decoding has no beams"
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        g = self.spec.gamma
        lang_np = np.asarray(lang_x)
        assert lang_np.shape[0] == 1, "a session serves one stream"
        if attention_mask is not None:
            keep = np.asarray(attention_mask)[0].astype(bool)
            lang_np = lang_np[:, keep]
        ids = [int(t) for t in lang_np[0]]
        p = len(ids)
        media_count = sum(1 for t in ids if t == self.cfg.media_token_id)
        vh = _vision_hash(vision_x)

        m = 0
        if self.cache_t is not None and vh == self.vis_hash \
                and media_count == self.media_count:
            for a, b in zip(self.real_tokens, ids):
                if a != b:
                    break
                m += 1
        m = min(m, self.held, p - 1)
        suffix_has_media = any(
            t == self.cfg.media_token_id for t in ids[m:])
        # +g+2: a round's verify window may write up to gamma+1 columns
        # past the last decided token
        reuse = (m >= self.min_reuse and not suffix_has_media
                 and self.valid_from + p + gen.max_new_tokens + g + 2
                 <= self.cache_len)

        if reuse:
            sb = _round_up(p - m, self.window_bucket)
            toks = np.zeros((1, sb), np.int32)
            toks[0, : p - m] = ids[m:]
            n0 = self.valid_from + m
            last_t, self.cache_t, self.cache_d = self._get_window(sb)(
                self.spec.params_t, self.spec.params_d,
                jnp.asarray(toks), self.cache_t, self.cache_d,
                jnp.int32(n0), jnp.int32(p - m), self.lat_t, self.lat_d,
                self.media_count_arr, self.base_valid,
                jnp.int32(self.valid_from))
            self.n = n0 + (p - m)
            self.real_tokens = ids[:]
            self.held = p
            self.last_stats = {"reused": m, "window": p - m,
                               "window_pad": sb, "restart": False}
        else:
            p_pad = _round_up(p, self.prompt_bucket)
            if p_pad + gen.max_new_tokens + g + 2 > self.cache_len:
                raise ValueError(
                    f"prompt {p} + max_new {gen.max_new_tokens} exceeds "
                    f"session cache_len {self.cache_len}")
            lx = np.zeros((1, p_pad), np.int32)
            mask = np.zeros((1, p_pad), np.int32)
            lx[0, p_pad - p:] = ids
            mask[0, p_pad - p:] = 1
            (last_t, self.cache_t, self.cache_d, self.lat_t,
             self.lat_d) = self._get_prefill(p_pad)(
                self.spec.params_t, self.spec.params_d,
                jnp.asarray(vision_x), jnp.asarray(lx),
                jnp.asarray(mask))
            self.valid_from = p_pad - p
            self.n = p_pad
            self.held = p
            self.base_valid = jnp.asarray(np.concatenate(
                [mask.astype(bool),
                 np.ones((1, self.cache_len - p_pad), bool)], axis=1))
            self.real_tokens = ids[:]
            self.vis_hash = vh
            self.media_count = media_count
            self.media_count_arr = jnp.asarray([media_count], jnp.int32)
            self.last_stats = {"reused": 0, "window": p,
                               "window_pad": p_pad, "restart": True}

        # ── speculative decode rounds ────────────────────────────────
        if rng is None:
            rng = jax.random.PRNGKey(0)
        round_fn = self.spec._get_round_fn(self.cache_len, eos, gen)
        if gen.do_sample:
            p0 = processed_probs(last_t[0], gen)
            tok0_i = int(jax.random.categorical(
                jax.random.fold_in(rng, self.n),
                jnp.log(jnp.maximum(p0, 1e-38))))
        else:
            tok0_i = int(jnp.argmax(last_t[0]))
        if tok0_i == eos:
            return
        buf = np.full((1, self.cache_len), gen.pad_token_id, np.int32)
        buf[0, self.valid_from: self.n] = self.real_tokens
        buf[0, self.n] = tok0_i
        # record-ahead: the token is appended before it is yielded — if
        # the caller abandons the stream, next turn's prefix match just
        # sees a divergence, which is already free
        self.real_tokens.append(tok0_i)
        self.n += 1
        self.held = len(self.real_tokens) - 1  # tok0 not yet ingested
        yield tok0_i
        buffer = jnp.asarray(buf)
        emitted = 1
        while emitted < gen.max_new_tokens:
            n_out, out, buffer, self.cache_t, self.cache_d = round_fn(
                self.spec.params_t, self.spec.params_d,
                jnp.int32(self.n), buffer, self.cache_t, self.cache_d,
                self.lat_t, self.lat_d, self.media_count_arr,
                self.base_valid, jnp.int32(self.valid_from), rng)
            take = min(int(n_out), gen.max_new_tokens - emitted)
            out_np = np.asarray(out)[:take]
            toks, hit_eos = [], False
            for t in out_np:
                if int(t) == eos:
                    hit_eos = True
                    break
                toks.append(int(t))
            self.real_tokens.extend(toks)
            self.n += len(toks)
            # conservative: the newest accepted token may not be in the
            # draft cache yet; re-ingesting it next turn costs nothing
            self.held = len(self.real_tokens) - 1
            for t in toks:
                yield t
            emitted += len(toks)
            if hit_eos:
                return


class SessionPool:
    """LRU pool of chat sessions keyed by a client-chosen session id.

    Each session pins a `cache_len`-column KV cache in HBM, so the pool
    is small by default; evicting a session only costs its next turn a
    full re-prefill. `factory` overrides the per-session constructor
    (e.g. SpecChatSession for the speculative+session composition)."""

    def __init__(self, model, params, cfg: OtterConfig, *,
                 max_sessions: int = 2, factory=None, **session_kw):
        self.model, self.params, self.cfg = model, params, cfg
        self.max_sessions = max_sessions
        self.session_kw = session_kw
        self._factory = factory or (lambda: ChatSession(
            self.model, self.params, self.cfg, **self.session_kw))
        self._pool: Dict[str, Any] = {}
        self._clock = 0
        self._last_used: Dict[str, int] = {}

    def get(self, session_id: str):
        self._clock += 1
        if session_id not in self._pool:
            if len(self._pool) >= self.max_sessions:
                victim = min(self._last_used, key=self._last_used.get)
                del self._pool[victim]
                del self._last_used[victim]
            self._pool[session_id] = self._factory()
        self._last_used[session_id] = self._clock
        return self._pool[session_id]

    def drop(self, session_id: str):
        self._pool.pop(session_id, None)
        self._last_used.pop(session_id, None)
