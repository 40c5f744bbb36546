"""Sharded-inference tests: generation with fsdp/tp-sharded params on the
8-device CPU mesh must reproduce single-device outputs (the TP replacement
for the reference's device_map="auto" multi-GPU inference,
modeling_otter.py:1022-1029)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otter_tpu.config import GenerationConfig, OtterConfig, ParallelConfig
from otter_tpu.generation.engine import OtterGenerator
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import create_mesh
from otter_tpu.parallel.sharding import shard_params


def test_generate_with_tp_sharded_params(rng):
    cfg = OtterConfig.tiny("mpt")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((1, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = np.asarray(rng.integers(5, 200, (1, 10)), np.int32)
    ids[:, 0] = cfg.media_token_id
    params = model.init(jax.random.PRNGKey(0), vision_x, jnp.asarray(ids))

    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    eng = OtterGenerator(model, params, cfg, cache_dtype=jnp.float32)
    ref = eng.generate(vision_x, ids, gen=gen)

    mesh = create_mesh(ParallelConfig(dp=1, fsdp=2, tp=4),
                       jax.devices()[:8])
    with mesh:
        sharded = shard_params(mesh, params)
        eng2 = OtterGenerator(model, sharded, cfg, cache_dtype=jnp.float32)
        out = eng2.generate(vision_x, ids, gen=gen)
    np.testing.assert_array_equal(ref, out)


def test_forward_logits_match_across_shardings(rng):
    cfg = OtterConfig.tiny("llama")
    model = OtterVLM(cfg)
    vision_x = jnp.asarray(rng.standard_normal((2, 1, 1, 3, 28, 28)),
                           jnp.float32)
    ids = jnp.asarray(rng.integers(5, 200, (2, 12)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids)
    logits_ref, _, _ = model.apply(params, vision_x, ids)

    mesh = create_mesh(ParallelConfig(dp=2, fsdp=2, tp=2),
                       jax.devices()[:8])
    with mesh:
        sharded = shard_params(mesh, params)
        fwd = jax.jit(lambda p, v, l: model.apply(p, v, l)[0])
        logits = fwd(sharded, vision_x, ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=1e-4, rtol=1e-4)
