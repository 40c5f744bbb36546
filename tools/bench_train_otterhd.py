"""OtterHD/Fuyu TRAINING throughput A/B: Pallas flash attention vs the
naive XLA einsum path, at real Persimmon-8B block dims and OtterHD's
full-HD sequence length.

Why this bench exists: the reference's headline performance claim is
OtterHD *training* throughput — "improve training throughput by 4-5
times faster" over the vanilla HF Fuyu implementation, attributed to
FlashAttention-2 + fused ops (`/root/reference/README.md:31`,
`/root/reference/docs/OtterHD.md:33-39`). This is the TPU analogue of
that exact comparison:

  - "fused" here = the Pallas flash-attention kernel
    (`ops/flash_attention.py`, fwd+bwd). The reference's OTHER fused
    ops (fused LN / rotary / sq-ReLU MLP) need no kernel on TPU — XLA
    fuses elementwise chains into the surrounding matmuls by default,
    so the naive path already has them; the A/B isolates the one piece
    XLA does NOT give you for free (attention without materializing
    the [B,H,S,S] score matrix).
  - "naive" = `OTTER_ATTN_IMPL=ref`: einsum -> softmax -> einsum with
    explicit causal masking, i.e. what a straight port of the vanilla
    HF persimmon attention lowers to.

Method: full fwd+bwd (jax.value_and_grad over the causal-LM loss, the
training compute path; the optimizer update is identical in both arms
and excluded) on FuyuVLM at real block dims (d=4096, 64 heads, d_head
64, MLP 16384, partial rotary, per-head QK-LN, sq-ReLU) at two depths;
the MARGINAL per-layer time (t[L2]-t[L1])/(L2-L1) cancels the
embedding/lm_head/loss cost shared by both arms, so the reduced bench
vocab (full finetune of a 262k-vocab 8B does not fit one 16 GB chip —
the reference used 8xA100-80G ZeRO-3) does not contaminate the ratio.
Both arms run per-layer remat, matching how the full model trains.

Sequence 2356 = OtterHD full-HD (1080x1920 -> 36x64 = 2304 patches +
newlines + text), the config the reference's claim is about.

Usage: bench_train_otterhd.py [batch] [seq] [vocab] [L1 L2]
       (defaults 1 2356 8192 2 6)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otter_tpu.config import FuyuConfig
    from otter_tpu.models.fuyu import FuyuVLM
    from otter_tpu.runtime.timing import enable_compile_cache
    from otter_tpu.train.step import causal_lm_loss

    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 2356
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    layers = [int(x) for x in sys.argv[4:]] or [2, 6]

    n_patches = 2304 if s >= 2340 else max(1, s - 52)
    patch_dim = 30 * 30 * 3
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(5, vocab - 1, (b, s)), jnp.int32),
        "image_patches": jnp.asarray(
            rng.standard_normal((b, n_patches, patch_dim)), jnp.bfloat16),
        "image_patches_indices": jnp.asarray(np.concatenate(
            [np.tile(np.arange(n_patches), (b, 1)),
             np.full((b, s - n_patches), -1)], axis=1), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(5, vocab - 1, (b, s)), jnp.int32),
    }

    def build(impl: str, L: int):
        """Jitted fwd+bwd at depth L under attention impl `impl`."""
        os.environ["OTTER_ATTN_IMPL"] = impl
        base = FuyuConfig()
        cfg = FuyuConfig(text=base.text.replace(
            vocab_size=vocab, num_hidden_layers=L))
        model = FuyuVLM(cfg, dtype=jnp.bfloat16, remat=True)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), batch["input_ids"],
            image_patches=batch["image_patches"],
            image_patches_indices=batch["image_patches_indices"])
        params = jax.tree_util.tree_map(
            lambda sh: jnp.zeros(sh.shape, jnp.bfloat16
                                 if jnp.issubdtype(sh.dtype, jnp.floating)
                                 else sh.dtype), shapes)

        def loss_fn(p):
            logits, _ = model.apply(
                p, batch["input_ids"],
                image_patches=batch["image_patches"],
                image_patches_indices=batch["image_patches_indices"])
            loss, _ = causal_lm_loss(logits, batch["labels"])
            return loss

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))

        def run():
            loss, grads = grad_fn(params)
            jax.block_until_ready(loss)
        return run

    results = {}
    for impl in ("pallas", "ref"):
        ts = {}
        for L in layers:
            try:
                run = build(impl, L)
                run()                       # compile + warm
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run()
                    samples.append(time.perf_counter() - t0)
                ts[L] = float(np.median(samples))
                print(f"{impl:6s} L={L}: {ts[L] * 1e3:8.1f} ms/step")
            except Exception as e:  # OOM on the naive path is a finding
                print(f"{impl:6s} L={L}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})")
        os.environ.pop("OTTER_ATTN_IMPL", None)
        if len(ts) == len(layers) and len(layers) >= 2:
            l1, l2 = layers[0], layers[-1]
            per_layer = (ts[l2] - ts[l1]) / (l2 - l1) * 1e3
            full = (ts[l1] * 1e3 + per_layer * (36 - l1))
            results[impl] = (per_layer, full)
            print(f"{impl:6s} marginal/layer: {per_layer:.2f} ms; "
                  f"extrapolated 36-layer step: {full:.0f} ms "
                  f"({b * 1e3 / full:.3f} samples/s/chip)")

    if "pallas" in results and "ref" in results:
        r = results["ref"][0] / results["pallas"][0]
        rf = results["ref"][1] / results["pallas"][1]
        print(f"flash-vs-naive per-layer speedup: {r:.2f}x "
              f"(full-model step: {rf:.2f}x) — reference claims 4-5x "
              f"from flash-attn-2 + fused ops on GPU (docs/OtterHD.md)")


if __name__ == "__main__":
    main()
