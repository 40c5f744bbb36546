"""Otter/Flamingo composite VLM (flax.linen) and the user-facing wrapper.

Rebuild of `OtterForConditionalGeneration` / `FlamingoForConditionalGeneration`
(reference `modeling_otter.py:539-1042`, `modeling_flamingo.py`) as a
functional composition: instead of the reference's "condition then forward"
module surgery (`condition_vis_x`, `modeling_otter.py:411-418`), the decoder
forward takes the vision latents and media ids as explicit arguments.

Otter vs Flamingo differ only in `use_media_placement_augmentation`
(random `attend_previous` during Flamingo training, `modeling_flamingo.py:451`)
— both are instances of `OtterVLM`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from otter_tpu.config import OtterConfig
from otter_tpu.models.clip import CLIPVisionModel
from otter_tpu.models.decoder import Decoder, init_cache
from otter_tpu.models.perceiver import PerceiverResampler
from otter_tpu.ops.masks import media_attention_ids


class OtterVLM(nn.Module):
    """Vision tower + perceiver + xattn-augmented decoder.

    forward: (vision_x [B,T,F,C,H,W], lang_x [B,S]) -> logits [B,S,V]
    """

    cfg: OtterConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.vision_encoder = CLIPVisionModel(c.vision, self.dtype)
        self.perceiver = PerceiverResampler(c.perceiver, self.dtype)
        self.lang_encoder = Decoder(c.text, otter_cfg=c, dtype=self.dtype,
                                    remat=self.remat)

    def encode_vision(self, vision_x, vision_mask=None):
        """[B, T, F, C, H, W] -> latents [B, T, n, D]
        (reference `_encode_vision_x`, modeling_otter.py:975-997: CLIP,
        drop CLS, per-(media,frame) tokens through the perceiver).
        vision_mask: optional [B, T, F] bool marking real frames (padded
        frames in mixed still+video requests attend nothing).

        uint8 input ([B,T,F,H,W,3], host-decoded/resized only) is
        normalized on device (ops/image_prep.normalize_u8 — the fused
        host+device preprocessing split, BASELINE north star)."""
        if vision_x.dtype == jnp.uint8:
            from otter_tpu.ops.image_prep import normalize_u8
            vision_x = normalize_u8(vision_x, out_dtype=self.dtype)
        b, t, f = vision_x.shape[:3]
        flat = vision_x.reshape((b * t * f,) + vision_x.shape[3:])
        feats = self.vision_encoder(flat)[:, 1:, :]       # drop CLS
        v, d = feats.shape[1], feats.shape[2]
        feats = feats.reshape(b, t, f, v, d)
        return self.perceiver(feats, vision_mask)

    def __call__(self, vision_x, lang_x, attention_mask=None,
                 attend_previous: bool = True,
                 vis_latents=None,
                 cache=None, cache_pos=None, kv_valid=None,
                 positions=None,
                 media_counts=None, vision_mask=None, skip_head=False,
                 head_last_only=False,
                 xattn_ids=None, prefix_mask=None, sequence_id=None):
        """Full forward. If `vis_latents` is given, `vision_x` is ignored
        (the `use_cached_vision_x` behavior, modeling_otter.py:925-936).

        During cached decoding (cache_pos set) `media_counts` [B] gives the
        number of media in the prompt: generated tokens sit after all media,
        so their text_time == media_counts. `xattn_ids` (q_ids, kv_ids,
        out_keep) overrides both derivations — chunked prefill passes
        slices of the full-prompt media ids, since mid-prompt chunks can
        precede their media tokens and the media_counts formula only
        covers post-prompt decoding.
        """
        c = self.cfg
        if vis_latents is None:
            vis_latents = self.encode_vision(vision_x, vision_mask)
        t_img = vis_latents.shape[1]
        n_lat = vis_latents.shape[2]

        if xattn_ids is not None:
            q_ids, kv_ids, out_keep = xattn_ids
        elif cache_pos is None:
            media_locations = lang_x == c.media_token_id
            q_ids, kv_ids, out_keep = media_attention_ids(
                media_locations, t_img, n_lat,
                only_attend_immediate_media=c.only_attend_immediate_media,
                attend_previous=attend_previous)
        else:
            b, s = lang_x.shape
            q_ids = jnp.broadcast_to(media_counts[:, None], (b, s)).astype(
                jnp.int32)
            kv_ids = jnp.broadcast_to(
                jnp.repeat(jnp.arange(1, t_img + 1, dtype=jnp.int32), n_lat),
                (b, t_img * n_lat))
            out_keep = q_ids > 0 if c.only_attend_immediate_media else \
                jnp.ones_like(q_ids, dtype=bool)

        logits, new_cache = self.lang_encoder(
            lang_x, attention_mask=attention_mask, positions=positions,
            prefix_mask=prefix_mask, sequence_id=sequence_id,
            vis_latents=vis_latents, xattn_q_ids=q_ids, xattn_kv_ids=kv_ids,
            xattn_out_keep=out_keep,
            cache=cache, cache_pos=cache_pos, kv_valid=kv_valid,
            skip_head=skip_head, head_last_only=head_last_only)
        return logits, new_cache, vis_latents


def make_otter_cache(cfg: OtterConfig, batch: int, max_len: int,
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    return init_cache(cfg.text, batch, max_len, dtype)
