"""Token sampling / logits processing under jit.

Covers the `generate_kwargs` surface the reference serving stack exposes
(`pipeline/serve/model_worker.py:222-250`, `gradio_web_server.py:361-370`):
greedy, temperature, top-k, top-p, no-repeat-ngram banning — all with static
shapes (SURVEY.md hard part #2: HF-generate equivalence under jit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    if temperature not in (0.0, 1.0):
        logits = logits / temperature
    return logits


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    top = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < top, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (keeps the smallest set with cumulative prob >= p,
    always including the argmax)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep entries whose cumulative mass up to and including them is < p,
    # plus the first one
    keep_sorted = cum - probs < p
    threshold = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                        axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def ban_repeat_ngrams(logits: jnp.ndarray, tokens: jnp.ndarray,
                      cur_end: jnp.ndarray, ngram: int,
                      valid_from=0) -> jnp.ndarray:
    """no_repeat_ngram_size: ban tokens that would complete an n-gram already
    present in tokens[:, valid_from:cur_end].

    tokens: [B, L] full buffer (left-padded prompt + generated so far).
    cur_end: [B] or scalar — exclusive end of the valid region.
    valid_from: [B] or scalar — inclusive start (first real prompt token).
    """
    if ngram <= 0:
        return logits
    b, l = tokens.shape
    n1 = ngram - 1
    if l < ngram:
        return logits
    # windows[i] = tokens[:, i:i+n1]; candidate continuation = tokens[:, i+n1]
    idx = jnp.arange(l - n1)[:, None] + jnp.arange(n1)[None, :]  # [L-n1, n1]
    windows = tokens[:, idx]                       # [B, L-n1, n1]
    cur = jnp.broadcast_to(jnp.asarray(cur_end), (b,))
    vfrom = jnp.broadcast_to(jnp.asarray(valid_from), (b,))
    # suffix = last n1 valid tokens: positions cur-n1 .. cur-1
    suf_idx = cur[:, None] - n1 + jnp.arange(n1)[None, :]
    suffix = jnp.take_along_axis(tokens, jnp.clip(suf_idx, 0, l - 1), axis=1)
    match = jnp.all(windows == suffix[:, None, :], axis=-1)      # [B, L-n1]
    win_start = jnp.arange(l - n1)[None, :]
    win_end = win_start + n1
    match = (match & (win_start >= vfrom[:, None]) & (win_end < cur[:, None])
             & ((cur - vfrom)[:, None] >= ngram))
    cand = tokens[:, n1:]                          # [B, L-n1]

    def ban_row(lg, cand_row, match_row):
        return lg.at[cand_row].min(jnp.where(match_row, NEG_INF, jnp.inf))

    return jax.vmap(ban_row)(logits, cand, match)


def ban_bad_words(logits: jnp.ndarray, tokens: jnp.ndarray,
                  cur_end, bad_words_ids, valid_from=0) -> jnp.ndarray:
    """HF `bad_words_ids` semantics (the reference worker exposes this,
    model_worker.py:222): for each banned sequence, the final token is
    masked whenever the preceding tokens equal the tail of
    tokens[:, valid_from:cur_end]. Single-token sequences are banned
    unconditionally. `bad_words_ids` is static config (tuple of tuples), so
    the Python loop unrolls at trace time.
    """
    if not bad_words_ids:
        return logits
    b, l = tokens.shape
    cur = jnp.broadcast_to(jnp.asarray(cur_end), (b,))
    vfrom = jnp.broadcast_to(jnp.asarray(valid_from), (b,))
    for seq in bad_words_ids:
        if len(seq) == 0:
            continue
        last = int(seq[-1])
        n1 = len(seq) - 1
        if n1 == 0:
            logits = logits.at[:, last].set(NEG_INF)
            continue
        prefix = jnp.asarray(seq[:-1], tokens.dtype)
        suf_idx = cur[:, None] - n1 + jnp.arange(n1)[None, :]
        suffix = jnp.take_along_axis(tokens, jnp.clip(suf_idx, 0, l - 1),
                                     axis=1)
        match = (jnp.all(suffix == prefix[None, :], axis=-1)
                 & ((cur - vfrom) >= n1))
        logits = logits.at[:, last].min(
            jnp.where(match, NEG_INF, jnp.inf))
    return logits


def process_logits(logits: jnp.ndarray, tokens: jnp.ndarray, cur_end,
                   gen, valid_from=0) -> jnp.ndarray:
    """Apply the sequence-aware logit controls from a GenerationConfig
    (no_repeat_ngram_size + bad_words_ids) in one place, shared by the
    greedy, streaming and beam paths."""
    logits = ban_repeat_ngrams(logits, tokens, cur_end,
                               gen.no_repeat_ngram_size, valid_from)
    logits = ban_bad_words(logits, tokens, cur_end, gen.bad_words_ids,
                           valid_from)
    return logits


def sample_token(rng, logits: jnp.ndarray, *, do_sample: bool,
                 temperature: float, top_k: int, top_p: float) -> jnp.ndarray:
    """logits [B, V] -> token [B] int32."""
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = apply_temperature(logits, temperature)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
