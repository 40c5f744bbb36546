"""Ring attention vs full attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.ops.attention_ref import mha_reference
from otter_tpu.ops.ring_attention import ring_attention
from otter_tpu.parallel.mesh import create_mesh
from otter_tpu.config import ParallelConfig


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(rng, causal):
    mesh = create_mesh(ParallelConfig(dp=1, fsdp=8, tp=1),
                       jax.devices()[:8])
    b, h, s, d = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    sharding = NamedSharding(mesh, P(None, None, "fsdp", None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    out = jax.jit(lambda a, b_, c: ring_attention(
        a, b_, c, mesh=mesh, causal=causal))(qs, ks, vs)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
