"""Speculative decoding: a small DRAFT model proposes gamma tokens, the
TARGET verifies them in ONE multi-token forward, and every emitted token
is provably identical to target-only greedy decoding.

Beyond-reference capability (the reference serves one token per target
forward, `pipeline/serve/model_worker.py`); TPU-native by construction:

  - the whole accept/advance loop runs on device inside one
    `lax.while_loop` — the accept count never syncs to the host, so a
    round of up to gamma+1 tokens costs the SAME single dispatch as one
    vanilla decode step (and the host relay is the dominant per-step
    cost through a tunnel);
  - the verify step reuses the decoder's native multi-token decode
    window (s = gamma+1 with intra-block causality) — one matmul sweep
    over the target weights amortizes the weight HBM read across
    gamma+1 positions, which is exactly the bandwidth economics that
    make decode memory-bound in the first place;
  - nothing is ever rolled back: rejected positions simply stay outside
    `kv_valid` (the decoder masks unattendable cache columns) and are
    overwritten by the next round's window.

Greedy only (do_sample=False): acceptance is exact argmax equality, so
the output sequence equals the target's own greedy decode (up to and
including eos). Batch is fixed at 1 — rows would desync on per-row
accept counts; speculative decoding is a latency tool, and b=1 latency
is where it pays.

Invariant at the top of each round (pos = index of the next undecided
buffer column; buffer[:pos] decided):
  both caches hold correct k/v for positions < pos-1; the token AT
  pos-1 (the newest emitted one) is not yet ingested by either model.
The draft round therefore opens with an s=2 window over
buffer[pos-2 : pos] — re-ingesting pos-2 (idempotent where already
cached) closes the one-slot gap a fully-accepted previous round leaves
in the draft cache.

Pairing note: Otter-MPT7B (target) and Flamingo-MPT-1B (draft) share
the gpt-neox vocabulary, so the flagship pair drafts with ~9x cheaper
steps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import GenerationConfig, OtterConfig
from otter_tpu.models.decoder import init_cache


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class SpeculativeGenerator:
    """Greedy speculative decoding over an (target, draft) OtterVLM pair.

    Both models must share the tokenizer/vocab and consume the same
    vision input. `gamma` is the number of draft tokens per round."""

    def __init__(self, model_t, params_t, cfg_t: OtterConfig,
                 model_d, params_d, cfg_d: OtterConfig, *,
                 gamma: int = 4, cache_dtype=jnp.bfloat16):
        assert cfg_t.text.vocab_size == cfg_d.text.vocab_size, \
            "speculative decoding requires a shared vocabulary"
        self.model_t, self.params_t, self.cfg_t = model_t, params_t, cfg_t
        self.model_d, self.params_d, self.cfg_d = model_d, params_d, cfg_d
        self.gamma = gamma
        self.cache_dtype = cache_dtype
        self._fns = {}

    # ── jitted pieces ────────────────────────────────────────────────

    def _prefill(self, model, cfg, params, vision_x, lang_x, mask, cache):
        positions = jnp.clip(
            jnp.cumsum(mask, axis=-1) - 1, 0, None).astype(jnp.int32)
        logits, cache, lat = model.apply(
            params, vision_x, lang_x, attention_mask=mask,
            positions=positions, cache=cache)
        return logits[:, -1], cache, lat

    def _window(self, model, cfg, params, toks, cache, cache_pos,
                cache_len, lat, media, base_valid):
        """One cached decode window: toks [1, S] at positions
        cache_pos .. cache_pos+S-1. Returns (logits [1, S, V], cache).
        `base_valid` [1, L] masks left-pad prompt columns."""
        s = toks.shape[1]
        kv_valid = base_valid & (jnp.arange(cache_len)[None, :]
                                 <= cache_pos + s - 1)
        positions = (cache_pos + jnp.arange(s))[None, :].astype(jnp.int32)
        logits, cache, _ = model.apply(
            params, None, toks, vis_latents=lat, cache=cache,
            cache_pos=cache_pos, kv_valid=kv_valid, positions=positions,
            media_counts=media)
        return logits, cache

    def _build(self, p: int, cache_len: int, gen: GenerationConfig):
        g = self.gamma
        max_new = gen.max_new_tokens
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg_t.eoc_token_id
        pad = gen.pad_token_id

        def run(params_t, params_d, vision_x, lang_x, mask):
            cache_t = init_cache(self.cfg_t.text, 1, cache_len,
                                 self.cache_dtype)
            cache_d = init_cache(self.cfg_d.text, 1, cache_len,
                                 self.cache_dtype)
            last_t, cache_t, lat_t = self._prefill(
                self.model_t, self.cfg_t, params_t, vision_x, lang_x,
                mask, cache_t)
            _, cache_d, lat_d = self._prefill(
                self.model_d, self.cfg_d, params_d, vision_x, lang_x,
                mask, cache_d)
            media = jnp.sum((lang_x == self.cfg_t.media_token_id)
                            .astype(jnp.int32), axis=-1)
            base_valid = jnp.concatenate(
                [mask.astype(bool),
                 jnp.ones((1, cache_len - p), bool)], axis=-1)

            buffer = jnp.concatenate(
                [lang_x, jnp.full((1, cache_len - p), pad, lang_x.dtype)],
                axis=-1)
            tok0 = jnp.argmax(last_t[0]).astype(jnp.int32)
            buffer = buffer.at[0, p].set(tok0)
            pos0 = jnp.int32(p + 1)
            done0 = tok0 == eos

            def cond(st):
                emitted, done = st[0], st[1]
                return (emitted < max_new) & ~done

            def body(st):
                emitted, done, pos, buffer, cache_t, cache_d = st
                tw = jax.lax.dynamic_slice(buffer, (0, pos - 2), (1, 2))

                # draft: s=2 opener (closes the fully-accepted gap),
                # then g-1 single steps
                logits, cache_d = self._window(
                    self.model_d, self.cfg_d, params_d, tw, cache_d,
                    pos - 2, cache_len, lat_d, media, base_valid)
                d1 = jnp.argmax(logits[0, -1]).astype(jnp.int32)

                def draft_step(carry, i):
                    tok, cache_d = carry
                    lg, cache_d = self._window(
                        self.model_d, self.cfg_d, params_d, tok[None, None],
                        cache_d, pos + i, cache_len, lat_d, media,
                        base_valid)
                    nxt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
                    return (nxt, cache_d), tok

                (d_last, cache_d), d_prev = jax.lax.scan(
                    draft_step, (d1, cache_d), jnp.arange(g - 1))
                # draft proposals d[0..g-1] for positions pos..pos+g-1
                d = jnp.concatenate([d_prev, d_last[None]]) if g > 1 \
                    else d_last[None]

                # verify: [tok_last, d0..d_{g-1}] in one s=g+1 window
                window = jnp.concatenate([tw[0, 1:], d])[None, :]
                lg_t, cache_t = self._window(
                    self.model_t, self.cfg_t, params_t, window, cache_t,
                    pos - 1, cache_len, lat_t, media, base_valid)
                t = jnp.argmax(lg_t[0], axis=-1).astype(jnp.int32)  # [g+1]

                # m leading draft tokens confirmed by the target
                match = (t[:g] == d)
                m = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
                idx = jnp.arange(g + 1)
                out = jnp.where(idx < m, jnp.concatenate([d, d[-1:]]), t)
                # emit out[0..m]; truncate at eos and at max_new
                is_eos = (out == eos) & (idx <= m)
                eos_at = jnp.min(jnp.where(is_eos, idx, g + 1))
                n = jnp.minimum(jnp.minimum(m + 1, eos_at + 1),
                                max_new - emitted)
                done = done | jnp.any(is_eos & (idx < n))
                keep = idx < n
                cur = jax.lax.dynamic_slice(buffer, (0, pos), (1, g + 1))
                buffer = jax.lax.dynamic_update_slice(
                    buffer, jnp.where(keep, out, cur[0])[None, :], (0, pos))
                return (emitted + n, done, pos + n, buffer, cache_t,
                        cache_d)

            st = (jnp.int32(1), done0, pos0, buffer, cache_t, cache_d)
            emitted, _, _, buffer, _, _ = jax.lax.while_loop(cond, body, st)
            # pad everything past the emitted region (a partially-kept
            # round may leave confirmed-but-uncounted tokens in place)
            cols = jnp.arange(cache_len)[None, :]
            buffer = jnp.where(cols < p + emitted, buffer, pad)
            return buffer[:, : p + max_new], emitted

        return jax.jit(run, donate_argnums=())

    # ── public API ───────────────────────────────────────────────────

    def generate(self, vision_x, lang_x, attention_mask=None,
                 gen: Optional[GenerationConfig] = None) -> np.ndarray:
        """vision_x [1,T,F,C,H,W]; lang_x [1,P] left-padded. Returns
        [1, P + max_new_tokens] — identical to the TARGET's greedy
        `OtterGenerator.generate` output."""
        gen = gen or GenerationConfig()
        assert not gen.do_sample and gen.num_beams <= 1, \
            "speculative decoding is greedy-only"
        lang_x = jnp.asarray(lang_x)
        b, p = lang_x.shape
        assert b == 1, "speculative decoding is a b=1 latency tool"
        if attention_mask is None:
            attention_mask = jnp.ones((b, p), jnp.int32)
        cache_len = _round_up(p + gen.max_new_tokens + self.gamma + 2, 128)
        key = (p, cache_len, gen)
        if key not in self._fns:
            self._fns[key] = self._build(p, cache_len, gen)
        out, _ = self._fns[key](self.params_t, self.params_d,
                                jnp.asarray(vision_x), lang_x,
                                jnp.asarray(attention_mask))
        return np.asarray(out)
