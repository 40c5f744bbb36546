"""One-off chip smoke for the rank-3 scale/bias decode-kernel layout."""
import numpy as np, jax, jax.numpy as jnp, time
import sys; sys.path.insert(0, "/root/repo")
from otter_tpu.ops.decode_attention import decode_attention
from otter_tpu.runtime.timing import enable_compile_cache
enable_compile_cache()
print("backend:", jax.default_backend(), flush=True)

def ref(q, k, v, lengths, bias=None, starts=None):
    logits = jnp.einsum("bhd,bhld->bhl", q.astype(jnp.float32), k.astype(jnp.float32)) / np.sqrt(q.shape[-1])
    if bias is not None: logits = logits + bias
    L = k.shape[2]
    idx = jnp.arange(L)[None, None, :]
    m = idx < lengths[:, None, None]
    if starts is not None: m &= idx >= starts[:, None, None]
    logits = jnp.where(m, logits, -1e30)
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhl,bhld->bhd", p, v.astype(jnp.float32))

rng = np.random.default_rng(0)
def case(b, h, d, L, quant, with_bias, stacked_nl=None, block_k=None):
    print(f"START b{b} h{h} d{d} L{L} quant={quant} bias={with_bias} stacked={stacked_nl} block_k={block_k}", flush=True)
    t0 = time.time()
    kshape = (b, h, L, d)
    k = rng.standard_normal(kshape, np.float32); v = rng.standard_normal(kshape, np.float32)
    q = jnp.asarray(rng.standard_normal((b, h, d), np.float32), jnp.bfloat16)
    lengths = jnp.asarray(rng.integers(L//2, L, (b,)), jnp.int32)
    bias = None
    if with_bias:
        bias = jnp.asarray(rng.standard_normal((b, h, L), np.float32) * 0.1)
    kw = {}
    if quant:
        ks = np.abs(k).max(-1) / 127.0; vs = np.abs(v).max(-1) / 127.0
        ki = np.clip(np.round(k / ks[..., None]), -127, 127).astype(np.int8)
        vi = np.clip(np.round(v / vs[..., None]), -127, 127).astype(np.int8)
        kd, vd = ki * ks[..., None], vi * vs[..., None]
        if stacked_nl:
            K = jnp.asarray(np.broadcast_to(ki[:, None], (b, stacked_nl, h, L, d)))
            V = jnp.asarray(np.broadcast_to(vi[:, None], (b, stacked_nl, h, L, d)))
            kw = dict(k_scale=jnp.asarray(np.broadcast_to(ks[:, None], (b, stacked_nl, h, L))),
                      v_scale=jnp.asarray(np.broadcast_to(vs[:, None], (b, stacked_nl, h, L))), layer=1)
        else:
            K, V = jnp.asarray(ki), jnp.asarray(vi)
            kw = dict(k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
        r = ref(q, jnp.asarray(kd), jnp.asarray(vd), lengths, bias)
    else:
        K = jnp.asarray(k, jnp.bfloat16); V = jnp.asarray(v, jnp.bfloat16)
        if stacked_nl:
            K = jnp.broadcast_to(K[:, None], (b, stacked_nl, h, L, d))
            V = jnp.broadcast_to(V[:, None], (b, stacked_nl, h, L, d))
            kw = dict(layer=1)
        r = ref(q, jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16), lengths, bias)
    out = decode_attention(q, K, V, lengths, bias, block_k=block_k, **kw)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - r)))
    print(f"  -> max_err {err:.4f}  ({time.time()-t0:.0f}s)", flush=True)
    assert err < 0.09, "FAIL"

case(4, 32, 128, 2048, True, True, stacked_nl=3)          # flagship int8+ALiBi
case(4, 32, 128, 2048, False, True, stacked_nl=3)         # bf16+bias, block_h=4
case(2, 32, 128, 2048, True, True)                        # non-stacked quant
case(2, 4, 128, 512, True, True)                          # tiny h -> block_h<8
case(2, 4, 128, 512, False, True)
case(4, 32, 128, 2048, True, True, stacked_nl=3, block_k=2048)  # full-cache block
print("ALL OK", flush=True)
