"""Model-layer tests on tiny configs: shapes, causality, cache consistency,
media masking, and decoder-variant coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otter_tpu.config import FuyuConfig, OtterConfig, TextConfig
from otter_tpu.models.clip import CLIPVisionModel
from otter_tpu.models.decoder import Decoder, init_cache
from otter_tpu.models.otter import OtterVLM
from otter_tpu.models.perceiver import PerceiverResampler


def test_clip_shapes(rng):
    cfg = OtterConfig.tiny().vision
    m = CLIPVisionModel(cfg)
    x = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 1 + cfg.num_patches, cfg.hidden_size)


def test_perceiver_shapes(rng):
    cfg = OtterConfig.tiny().perceiver
    m = PerceiverResampler(cfg)
    x = jnp.asarray(rng.standard_normal((2, 2, 3, 4, cfg.dim)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 2, cfg.num_latents, cfg.dim)


@pytest.mark.parametrize("arch", ["mpt", "llama", "falcon", "persimmon"])
def test_decoder_forward(rng, arch):
    cfg = OtterConfig.tiny(arch).text
    if arch == "falcon":
        cfg = cfg.replace(num_kv_heads=1, no_bias=True, pos="rope",
                          norm_type="low_precision_layernorm", act="gelu")
    if arch == "persimmon":
        cfg = cfg.replace(no_bias=False, qk_ln=True, pos="rope",
                          rope_partial_factor=0.5, norm_type="layernorm",
                          act="sq_relu", tie_embeddings=False)
    m = Decoder(cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    logits, _ = m.apply(params, ids)
    assert logits.shape == (2, 16, cfg.total_vocab)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_decoder_causality(rng):
    """Changing a future token must not change past logits."""
    cfg = OtterConfig.tiny("mpt").text
    m = Decoder(cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    logits1, _ = m.apply(params, ids)
    ids2 = ids.at[0, 10].set((ids[0, 10] + 1) % cfg.vocab_size)
    logits2, _ = m.apply(params, ids2)
    np.testing.assert_allclose(logits1[0, :10], logits2[0, :10], atol=1e-5)
    assert not np.allclose(logits1[0, 10:], logits2[0, 10:], atol=1e-5)


@pytest.mark.parametrize("arch", ["mpt", "llama"])
def test_decode_cache_matches_full_forward(rng, arch):
    """Greedy logits from cached decode must match the full forward pass."""
    cfg = OtterConfig.tiny(arch).text
    m = Decoder(cfg)
    b, s, max_len = 1, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)

    full_logits, _ = m.apply(params, ids)

    cache = init_cache(cfg, b, max_len, jnp.float32)
    # prefill
    _, cache = m.apply(params, ids, cache=cache)
    # decode positions s.. one at a time, feeding the same tokens
    ids_ext = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)), jnp.int32)
    full_logits2, _ = m.apply(params, jnp.concatenate([ids, ids_ext], 1))

    pos = s
    for t in range(4):
        tok = ids_ext[:, t:t + 1]
        kv_valid = (jnp.arange(max_len)[None] <= pos)
        logits, cache = m.apply(
            params, tok, cache=cache, cache_pos=pos, kv_valid=kv_valid,
            positions=jnp.full((b, 1), pos, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits2[:, pos]),
            atol=2e-4, rtol=2e-4)
        pos += 1


def test_otter_forward_and_media_masking(rng):
    cfg = OtterConfig.tiny("mpt")
    m = OtterVLM(cfg)
    b, t, f = 1, 2, 1
    vision_x = jnp.asarray(
        rng.standard_normal((b, t, f, 3, 28, 28)), jnp.float32)
    s = 24
    ids = np.asarray(rng.integers(0, 200, (b, s)), np.int32)
    ids[0, 2] = cfg.media_token_id
    ids[0, 12] = cfg.media_token_id
    ids = jnp.asarray(ids)
    params = m.init(jax.random.PRNGKey(0), vision_x, ids)
    logits, _, latents = m.apply(params, vision_x, ids)
    assert logits.shape == (b, s, cfg.text.total_vocab)
    assert latents.shape == (b, t, cfg.perceiver.num_latents,
                             cfg.perceiver.dim)
    # changing the second image must not change logits before its position
    vision_x2 = vision_x.at[:, 1].add(1.0)
    logits2, _, _ = m.apply(params, vision_x2, ids)
    np.testing.assert_allclose(logits[0, :12], logits2[0, :12], atol=1e-4)


def test_otter_cached_vision(rng):
    cfg = OtterConfig.tiny("mpt")
    m = OtterVLM(cfg)
    vision_x = jnp.asarray(
        rng.standard_normal((1, 1, 1, 3, 28, 28)), jnp.float32)
    ids = np.asarray(rng.integers(0, 200, (1, 8)), np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    params = m.init(jax.random.PRNGKey(0), vision_x, ids)
    logits, _, latents = m.apply(params, vision_x, ids)
    logits2, _, _ = m.apply(params, None, ids, vis_latents=latents)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-6)


def test_perceiver_frame_mask_matches_unpadded(rng):
    """Mixed still+video media: zero-padded frames excluded via frame_mask
    give the same latents as encoding each item at its natural length."""
    from otter_tpu.config import PerceiverConfig
    from otter_tpu.models.perceiver import PerceiverResampler

    cfg = PerceiverConfig(dim=32, depth=2, dim_head=8, heads=4,
                          num_latents=4, max_num_frames=8)
    model = PerceiverResampler(cfg)
    v, d = 5, 32
    still = rng.standard_normal((1, 1, 1, v, d)).astype(np.float32)
    video = rng.standard_normal((1, 1, 3, v, d)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video))

    lat_still = model.apply(params, jnp.asarray(still))
    lat_video = model.apply(params, jnp.asarray(video))

    # padded batch: T=2 items, F=3 with the still masked to 1 frame
    padded = np.zeros((1, 2, 3, v, d), np.float32)
    padded[0, 0, :1] = still[0, 0]
    padded[0, 1] = video[0, 0]
    mask = np.asarray([[[True, False, False], [True, True, True]]])
    lat = model.apply(params, jnp.asarray(padded), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(lat[0, 0]),
                               np.asarray(lat_still[0, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat[0, 1]),
                               np.asarray(lat_video[0, 0]), atol=1e-5)


def test_decode_media_mixed(rng):
    """Worker media decoding: stills + a video in ONE request (the
    reference drops everything but the last video)."""
    import base64
    import io as _io
    from PIL import Image
    from otter_tpu.serve.worker import decode_media_to_vision_x

    def b64(seed):
        img = Image.fromarray(
            (np.random.default_rng(seed).random((16, 16, 3)) * 255)
            .astype(np.uint8))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return base64.urlsafe_b64encode(buf.getvalue()).decode()

    media = [b64(0), [b64(1), b64(2), b64(3)], b64(4)]
    vx, mask = decode_media_to_vision_x(media, patch_size=16)
    assert vx.shape == (1, 3, 3, 3, 16, 16)
    np.testing.assert_array_equal(
        mask[0], [[True, False, False],
                  [True, True, True],
                  [True, False, False]])
    # padded frames are zeros
    assert float(np.abs(vx[0, 0, 1:]).max()) == 0.0
