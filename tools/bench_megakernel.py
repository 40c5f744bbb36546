"""ROADMAP #1 experiment: whole-layer decode megakernel vs the shipping
composed path, bare 32-layer MPT-7B decoder at the flagship decode config
(b8, d4096, h32, L256 stacked bf16 cache, int8 weights).

Composed (shipping): LN1 -> XLA int8 convert-then-dot qkv -> dus append
-> einsum attention on the stacked cache layer slice -> XLA int8 out-proj
-> LN2 -> fused int8_mlp.

Mega: ops/megakernel.decode_attn_megakernel (LN1+qkv+attention+out-proj
in ONE pallas_call, cache read in-launch via layer-indexed BlockSpecs,
new token in-register) -> dus append -> LN2 -> int8_mlp.

Marginal-step methodology (tools/profile_decode.py): fori_loop over
decode steps inside one jit, carry donated, (t6 - t1)/5.

Usage: bench_megakernel.py [composed|mega|both|check]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

B, D, H, DH, L, NL, FFN = 8, 4096, 32, 128, 256, 32, 16384
POS0 = 128


def make_weights(rng, random=False):
    import jax.numpy as jnp
    if random:
        # scales sized so attention logits land in a sane softmax range
        # (huge logits saturate softmax and bf16 argmax tie-breaks make
        # the comparison meaningless)
        mk8 = lambda sh: jnp.asarray(
            rng.integers(-127, 127, sh, endpoint=True), jnp.int8)
        mks = lambda n: jnp.asarray(
            rng.random(n, np.float32) * 5e-4 + 2.5e-4)
    else:
        mk8 = lambda sh: jnp.zeros(sh, jnp.int8)
        mks = lambda n: jnp.full((n,), 0.01, jnp.float32)
    layers = []
    for _ in range(NL):
        layers.append(dict(
            ln1=mks(D) * 100, wqo=mk8((D, 4 * D)), sqo=mks(4 * D),
            ln2=mks(D) * 100, w1=mk8((D, FFN)), s1=mks(FFN),
            w2=mk8((FFN, D)), s2=mks(D)))
    return layers


def composed_layer(x, kc, vc, pos, layer, w, bias):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from otter_tpu.ops.layers import layer_norm
    from otter_tpu.ops.quant import int8_mlp

    n = layer_norm(x.astype(jnp.float32), w["ln1"], None,
                   eps=1e-5).astype(x.dtype)
    qkv = ((n @ w["wqo"][:, :3 * D].astype(x.dtype)).astype(jnp.float32)
           * w["sqo"][:3 * D])
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(B, H, DH).astype(x.dtype)
    knh = k_new.reshape(B, H, 1, DH).astype(kc.dtype)
    vnh = v_new.reshape(B, H, 1, DH).astype(vc.dtype)
    kc = lax.dynamic_update_slice(kc, knh[:, None], (0, layer, 0, pos, 0))
    vc = lax.dynamic_update_slice(vc, vnh[:, None], (0, layer, 0, pos, 0))
    kl, vl = kc[:, layer], vc[:, layer]
    s = jnp.einsum("bhd,bhld->bhl", qh.astype(jnp.float32),
                   kl.astype(jnp.float32)) * (1.0 / np.sqrt(DH))
    s = s + bias[None]
    valid = jnp.arange(L)[None, None] <= pos
    s = jnp.where(valid, s, -0.7 * np.finfo(np.float32).max)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhl,bhld->bhd", p, vl.astype(jnp.float32))
    attn = o.reshape(B, D).astype(x.dtype)
    y = x + ((attn @ w["wqo"][:, 3 * D:].astype(x.dtype))
             .astype(jnp.float32) * w["sqo"][3 * D:]).astype(x.dtype)
    n2 = layer_norm(y.astype(jnp.float32), w["ln2"], None,
                    eps=1e-5).astype(x.dtype)
    mlp = int8_mlp(n2, w["w1"], w["s1"], w["w2"], w["s2"], act="gelu")
    return y + mlp.astype(y.dtype), kc, vc


def mega_layer(x, kc, vc, pos, layer, w, bias):
    from otter_tpu.ops.megakernel import mpt_decode_layer_megakernel
    return mpt_decode_layer_megakernel(
        x, kc, vc, pos, bias, w["ln1"], w["wqo"], w["sqo"], w["ln2"],
        w["w1"], w["s1"], w["w2"], w["s2"], layer=layer)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from otter_tpu.ops.masks import alibi_bias
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.default_rng(0)
    bias = jnp.asarray(alibi_bias(H, L)[0, :, 0, :], jnp.float32)  # [H, L]

    if mode == "check":
        # one-layer on-chip numerics: mega vs composed with random weights
        w = make_weights(rng, random=True)[0]
        x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32
                        ).astype(jnp.bfloat16) * 0.3
        kc = jnp.asarray(rng.standard_normal((B, 1, H, L, DH)),
                         jnp.float32).astype(jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, 1, H, L, DH)),
                         jnp.float32).astype(jnp.bfloat16)
        y0, kc0, vc0 = jax.jit(functools.partial(
            composed_layer, pos=POS0, layer=0, bias=bias))(x, kc, vc, w=w)
        y1, kc1, vc1 = jax.jit(functools.partial(
            mega_layer, pos=POS0, layer=0, bias=bias))(x, kc, vc, w=w)
        d = np.abs(np.asarray(y0, np.float32) - np.asarray(y1, np.float32))
        rel = d / (np.abs(np.asarray(y0, np.float32)) + 1e-3)
        print(f"on-chip mega vs composed: max abs {d.max():.4f}, "
              f"median rel {np.median(rel):.5f}, "
              f"cache rows equal: "
              f"{np.array_equal(np.asarray(kc0[:, 0, :, POS0]), np.asarray(kc1[:, 0, :, POS0]))}")
        return

    weights = make_weights(rng)

    def fresh_state():
        return (jnp.zeros((B, D), jnp.bfloat16),
                jnp.zeros((B, NL, H, L, DH), jnp.bfloat16),
                jnp.zeros((B, NL, H, L, DH), jnp.bfloat16),
                jnp.asarray(POS0, jnp.int32))

    def run(layer_fn, n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def go(carry):
            def body(i, c):
                x, kc, vc, pos = c
                for li in range(NL):
                    x, kc, vc = layer_fn(x, kc, vc, pos, li,
                                         weights[li], bias)
                return (x, kc, vc, pos + 1)
            return lax.fori_loop(0, n, body, carry)

        def f(c):
            c = go(c)
            np.asarray(c[0])
            return c
        return f

    for name, fn in (("composed", composed_layer), ("mega", mega_layer)):
        if mode not in (name, "both"):
            continue
        f1, f6 = run(fn, 1), run(fn, 6)
        c = fresh_state()
        c = f1(c)           # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = f1(c)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            c = f6(c)
            t6 = time.perf_counter() - t0
            ts.append((t6 - t1) / 5)
        dt = float(np.median(ts)) * 1e3
        print(f"{name}: {dt:.2f} ms/decode-step (32 layers, b{B}, "
              f"L{L}, marginal)")


if __name__ == "__main__":
    main()
