"""Jitted beam search (static shapes, lax.fori_loop).

Completes the HF `generate_kwargs` surface the reference serving/demos
expose (`num_beams`, `length_penalty`, `early_stopping` —
gradio_web_server.py:361-370, modeling_otter.py:1030 repeats vision for
beams). Standard beam semantics: per-step top-2K candidate expansion,
finished pool with length-penalized scores (HF convention
score = logprob / len^length_penalty), cache reorder via gather.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def beam_search(
    step_fn: Callable,      # (tok [B*K,1], cache, t) -> (logits [B*K,V], cache)
    init_logits: jnp.ndarray,   # [B, V] logits after prefill
    cache,                      # pytree with leading dim B*K (pre-tiled)
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    logits_processor: Callable = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_new_tokens] of the best beam, scores [B]).

    logits_processor, if given, is called as (logits [B*K, V],
    gen_tokens [B*K, max_new], t) -> logits before each expansion — the
    hook for no_repeat_ngram / bad_words_ids banning (HF beam parity,
    SURVEY hard part #2). The caller is responsible for processing
    `init_logits` (t=0) itself.
    """
    state, body, penalize = _beam_setup(
        init_logits, cache, num_beams=num_beams,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, length_penalty=length_penalty,
        step_fn=step_fn, logits_processor=logits_processor)
    state = jax.lax.fori_loop(1, max_new_tokens, body, state)
    return _beam_best(state, max_new_tokens, penalize)


def beam_search_chunks(
    step_fn: Callable,
    init_logits: jnp.ndarray,
    cache,
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    logits_processor: Callable = None,
    chunk: int = 8,
):
    """Streaming beam search: yields (tokens [B, max_new], length_so_far)
    of the CURRENT best beam after every `chunk` steps (final yield is the
    beam_search() result). Earlier yields are live previews — a later
    chunk may revise them, which the `\\0`-JSON cumulative-text protocol
    expresses naturally (the UI re-renders the whole message per chunk,
    gradio_web_server.py:396-400)."""
    state, body, penalize = _beam_setup(
        init_logits, cache, num_beams=num_beams,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, length_penalty=length_penalty,
        step_fn=step_fn, logits_processor=logits_processor)

    @jax.jit
    def run_chunk(state, t0, t1):
        return jax.lax.fori_loop(t0, t1, body, state)

    t = 1
    while t < max_new_tokens:
        t1 = min(t + chunk, max_new_tokens)
        state = run_chunk(state, t, t1)
        out, _ = _beam_best(state, t1, penalize)
        yield out, t1
        t = t1
    if max_new_tokens == 1:
        out, _ = _beam_best(state, 1, penalize)
        yield out, 1


def _beam_setup(init_logits, cache, *, num_beams, max_new_tokens,
                eos_token_id, pad_token_id, length_penalty, step_fn,
                logits_processor):
    b, vocab = init_logits.shape
    k = num_beams

    logp0 = jax.nn.log_softmax(init_logits.astype(jnp.float32), axis=-1)
    first_scores, first_toks = jax.lax.top_k(logp0, k)       # [B, K]

    tokens = jnp.full((b, k, max_new_tokens), pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_toks)
    live_scores = jnp.where(first_toks == eos_token_id, NEG_INF,
                            first_scores)
    fin_scores = jnp.where(first_toks == eos_token_id,
                           first_scores, NEG_INF)             # 1-token fins
    fin_tokens = tokens
    fin_lens = jnp.ones((b, k), jnp.int32)

    def penalize(scores, lengths):
        return scores / (jnp.asarray(lengths, jnp.float32)
                         ** length_penalty)

    def body(t, state):
        tokens, live_scores, fin_tokens, fin_scores, fin_lens, cache = state
        cur = jax.lax.dynamic_slice_in_dim(tokens, t - 1, 1, axis=2)
        cur = cur.reshape(b * k, 1)
        logits, cache = step_fn(cur, cache, t)
        if logits_processor is not None:
            logits = logits_processor(
                logits, tokens.reshape(b * k, -1), t)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(b, k, vocab)
        total = live_scores[:, :, None] + logp                # [B, K, V]
        flat = total.reshape(b, k * vocab)
        cand_scores, cand_idx = jax.lax.top_k(flat, 2 * k)    # [B, 2K]
        cand_beam = cand_idx // vocab
        cand_tok = cand_idx % vocab

        # candidate token rows: gather parent beams' token history
        parent_tokens = jnp.take_along_axis(
            tokens, cand_beam[:, :, None], axis=1)            # [B, 2K, L]
        cand_tokens = jax.lax.dynamic_update_slice_in_dim(
            parent_tokens, cand_tok[:, :, None].astype(jnp.int32), t, axis=2)

        is_eos = cand_tok == eos_token_id
        # finished pool update: candidates ending in eos compete (penalized)
        cand_fin = jnp.where(is_eos,
                             penalize(cand_scores, t + 1), NEG_INF)
        all_fin_scores = jnp.concatenate(
            [penalize(fin_scores, fin_lens), cand_fin], axis=1)  # [B, 3K]
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((b, 2 * k), t + 1, jnp.int32)], axis=1)
        top_fin, fin_idx = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(all_fin_tokens,
                                         fin_idx[:, :, None], axis=1)
        fin_lens = jnp.take_along_axis(all_fin_lens, fin_idx, axis=1)
        # store raw (unpenalized-equivalent): keep penalized directly
        fin_scores_new = top_fin
        # to keep penalize() idempotent, store scores already penalized with
        # length 1 afterwards
        fin_scores = fin_scores_new
        fin_lens = jnp.ones_like(fin_lens)

        # live beams: best K non-eos candidates
        live_cand = jnp.where(is_eos, NEG_INF, cand_scores)
        top_live, live_idx = jax.lax.top_k(live_cand, k)      # [B, K]
        live_beam = jnp.take_along_axis(cand_beam, live_idx, axis=1)
        live_tokens = jnp.take_along_axis(
            cand_tokens, live_idx[:, :, None], axis=1)
        live_scores = top_live
        tokens = live_tokens

        # reorder cache rows to the selected parent beams
        gather = (jnp.arange(b)[:, None] * k + live_beam).reshape(-1)
        cache = jax.tree_util.tree_map(
            lambda x: jnp.take(x, gather, axis=0), cache)
        return tokens, live_scores, fin_tokens, fin_scores, fin_lens, cache

    state = (tokens, live_scores, fin_tokens, fin_scores, fin_lens, cache)
    return state, body, penalize


def _beam_best(state, cur_len: int, penalize) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Best sequence so far: best finished vs best live (penalized at the
    current length)."""
    tokens, live_scores, fin_tokens, fin_scores, fin_lens, _ = state
    best_live = penalize(live_scores, cur_len)
    use_fin = fin_scores[:, 0] >= best_live[:, 0]
    out = jnp.where(use_fin[:, None], fin_tokens[:, 0], tokens[:, 0])
    score = jnp.where(use_fin, fin_scores[:, 0], best_live[:, 0])
    return out, score
