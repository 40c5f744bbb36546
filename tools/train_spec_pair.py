"""Train a REAL target/draft pair for measured speculative decoding.

VERDICT r3 #3: every speculative number so far used zero weights (full
agreement), so acceptance alpha was assumed, not measured. This trains
two small-but-real OtterVLM byte-level LMs on this repo's own Python
sources (in-repo data, no network): a 6-layer/d=256 target and a
2-layer/d=128 draft sharing the byte vocab. The pair is non-degenerate
by construction — the draft is ~14x smaller and systematically worse,
so greedy agreement sits strictly between 0 and 1 and
`tools/bench_spec_real.py` can measure alpha and end-to-end tok/s.

Both are full OtterVLMs (vision tower + perceiver + gated xattn) so the
bench drives the exact serving classes; training feeds a zero image
with the media token at position 0 and the xattn gates learn to stay
closed (tanh-gate init 0), which is Flamingo's design behavior for
uninformative media.

Usage: python tools/train_spec_pair.py [--steps N] [--out DIR] [--cpu]
Writes {target,draft}.msgpack + pair.json into DIR
(default checkpoints/spec_pair).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

MEDIA, EOC, PAD = 256, 257, 258
VOCAB = 384                      # 256 bytes + specials, padded to 128x
SEQ = 256
BATCH = 32
INNER = 25                       # jitted steps per device call


def corpus() -> np.ndarray:
    """All repo Python sources as one uint8 stream (deterministic
    order)."""
    files = sorted(glob.glob("/root/repo/otter_tpu/**/*.py",
                             recursive=True))
    blob = b"\n".join(open(f, "rb").read() for f in files)
    return np.frombuffer(blob, np.uint8)


def make_cfg(d: int, layers: int, heads: int, xattn_every: int):
    from otter_tpu.config import (OtterConfig, PerceiverConfig, TextConfig,
                                  VisionConfig)
    return OtterConfig(
        vision=VisionConfig(hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=28, patch_size=14),
        text=TextConfig(arch="mpt", vocab_size=VOCAB, hidden_size=d,
                        num_hidden_layers=layers, num_attention_heads=heads,
                        max_seq_len=1024, pos="alibi",
                        norm_type="low_precision_layernorm", act="gelu",
                        intermediate_size=4 * d, tie_embeddings=True,
                        no_bias=True),
        perceiver=PerceiverConfig(dim=64, depth=1, dim_head=16, heads=4,
                                  num_latents=8, max_num_frames=8),
        cross_attn_every_n_layers=xattn_every,
        xattn_dim_head=16, xattn_heads=4,
        media_token_id=MEDIA, eoc_token_id=EOC, answer_token_id=None,
        pad_token_id=PAD)


def batches(data: np.ndarray, rng: np.random.Generator, n: int):
    """[n, BATCH, SEQ] int32: media token + SEQ-1 corpus bytes each."""
    starts = rng.integers(0, len(data) - SEQ, (n, BATCH))
    out = np.empty((n, BATCH, SEQ), np.int32)
    out[:, :, 0] = MEDIA
    for i in range(n):
        for j in range(BATCH):
            s = starts[i, j]
            out[i, j, 1:] = data[s:s + SEQ - 1]
    return out


def train_one(name: str, cfg, data: np.ndarray, steps: int, out_dir: str,
              lr: float = 3e-3):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from otter_tpu.models.otter import OtterVLM

    model = OtterVLM(cfg, dtype=jnp.float32)
    vx = jnp.zeros((BATCH, 1, 1, 3, 28, 28), jnp.float32)
    probe = jnp.zeros((BATCH, SEQ), jnp.int32)
    params = model.init(jax.random.PRNGKey(
        0 if name == "target" else 1), vx, probe)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10),
        decay_steps=steps, end_value=lr * 0.1)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=0.01))
    opt = tx.init(params)

    def loss_fn(p, ids):
        logits = model.apply(p, vx, ids)[0]
        tgt = ids[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        keep = tgt < 256                       # bytes only, no specials
        return (nll * keep).sum() / jnp.maximum(keep.sum(), 1)

    @jax.jit
    def multi_step(params, opt, chunk):
        def step(carry, ids):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, ids)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o), loss
        (params, opt), losses = jax.lax.scan(step, (params, opt), chunk)
        return params, opt, losses.mean()

    rng = np.random.default_rng(42 if name == "target" else 43)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(INNER, steps - done)
        chunk = jnp.asarray(batches(data, rng, k))
        params, opt, ml = multi_step(params, opt, chunk)
        done += k
        print(f"[{name}] step {done}/{steps} loss {float(ml):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    path = os.path.join(out_dir, f"{name}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"[{name}] saved {path} ({os.path.getsize(path)/1e6:.1f} MB)")
    return float(ml)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", default="checkpoints/spec_pair")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from otter_tpu.runtime.timing import enable_compile_cache
    enable_compile_cache()

    os.makedirs(args.out, exist_ok=True)
    data = corpus()
    split = int(len(data) * 0.9)
    print(f"corpus {len(data)/1e6:.1f} MB, train {split}, "
          f"held-out {len(data)-split}")

    cfg_t = make_cfg(256, 6, 8, xattn_every=3)
    cfg_d = make_cfg(128, 2, 4, xattn_every=2)
    loss_t = train_one("target", cfg_t, data[:split], args.steps, args.out)
    loss_d = train_one("draft", cfg_d, data[:split], args.steps, args.out)

    with open(os.path.join(args.out, "pair.json"), "w") as f:
        json.dump({"target": cfg_t.to_dict(), "draft": cfg_d.to_dict(),
                   "steps": args.steps, "final_loss_target": loss_t,
                   "final_loss_draft": loss_d,
                   "holdout_start": split, "seq": SEQ}, f, indent=1)
    print("pair.json written; bench with tools/bench_spec_real.py")


if __name__ == "__main__":
    main()
