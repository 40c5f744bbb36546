"""Train a REAL tiny VLM pair (target + draft) on synthetic MIMIC-IT.

VERDICT r4 #4: the quantization-quality and speculative-acceptance
studies used synthetic random weights (bench_quant_quality) or a
text-only byte pair (train_spec_pair) — no trained model in this repo
actually USED its vision path. This trains two small-but-real OtterVLMs
(CLIP tower + perceiver + gated xattn + MPT decoder — the full serving
classes) on a synthetic vision-grounded task where the answer is
UNRECOVERABLE from text alone:

  image  = 2x2 grid of colored 14x14 squares (8 colors), 28x28 RGB
  prompt = "<image>User: color at <pos> GPT:<answer>"  (pos in TL/TR/BL/BR)
  answer = the color word + <|endofchunk|>

Text-only chance is 12.5%; a model that opens its tanh xattn gates and
reads the image solves it ~100%. Training data flows through the REAL
MimicitDataset (instruction JSON + base64 images JSON, "simple" format,
answer-span label masking), so the whole data path is exercised end to
end, and the checkpoints feed:
  - tools/bench_quant_quality.py --checkpoint  (trained-weights KL)
  - tools/bench_spec_vlm.py                    (real VLM acceptance)
  - tools/run_one_click_tiny.py                (one-click harness e2e)

Usage: python tools/train_tiny_vlm.py [--steps N] [--out DIR] [--cpu]
Writes {target,draft}.msgpack + meta.json + data/ into DIR
(default checkpoints/tiny_vlm). Reference scale model this miniaturizes:
OTTER-Image-MPT7B (instruction_following.py:331-427 training recipe).
"""

import argparse
import base64
import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

MEDIA, EOC, ANS, PAD = 256, 257, 258, 259
VOCAB = 384
SEQ = 24
BATCH = 64

COLORS = {
    "red": (220, 40, 40), "green": (40, 200, 60), "blue": (40, 80, 230),
    "yellow": (235, 220, 40), "purple": (150, 40, 200),
    "orange": (240, 140, 30), "white": (240, 240, 240),
    "black": (15, 15, 15),
}
POSITIONS = ["TL", "TR", "BL", "BR"]


class GridTokenizer:
    """Deterministic word-level tokenizer for the color-grid language
    (TinyTokenizer's hash() ids are per-process random — a persistent
    checkpoint needs stable ids)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = PAD
    specials = {"<image>": MEDIA, "<|endofchunk|>": EOC, "<answer>": ANS,
                "<PAD>": PAD}

    def __init__(self):
        words = (sorted(COLORS) + POSITIONS
                 + ["User:", "GPT:", "color", "at", "what", "is", "the",
                    "describe", "yes", "no"])
        self.vocab = {w: 10 + i for i, w in enumerate(words)}
        self.inv = {v: k for k, v in self.vocab.items()}
        self.inv.update({v: k for k, v in self.specials.items()})

    def _tok(self, text):
        import re
        ids = []
        pattern = "(" + "|".join(map(re.escape, self.specials)) + ")"
        for part in re.split(pattern, text):
            if not part:
                continue
            if part in self.specials:
                ids.append(self.specials[part])
            else:
                ids.extend(self.vocab.get(w, 9) for w in part.split())
        return ids

    def __call__(self, text, add_special_tokens=False, truncation=True,
                 max_length=None, return_tensors=None):
        ids = self._tok(text)
        if max_length:
            ids = ids[:max_length]
        out = {"input_ids": ids, "attention_mask": [1] * len(ids)}
        if return_tensors == "np":
            out = {k: np.asarray([v]) for k, v in out.items()}
        return out

    def convert_tokens_to_ids(self, token):
        return self.specials.get(token, self.vocab.get(token, 9))

    def decode(self, ids, skip_special_tokens=True):
        # keep <answer>/<|endofchunk|> even when skipping specials: the
        # benchmark adapters split the decoded text on those markers
        # (reference benchmarks/models/otter_image.py:81)
        out = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (MEDIA, PAD, 1, 2):
                continue
            out.append(self.inv.get(i, "?"))
        return " ".join(out)


def render_grid(colors4, rng=None, jitter: int = 0) -> np.ndarray:
    """2x2 color grid; optional per-square RGB jitter.

    Jitter makes every rendered image unique: with only 8^4=4096
    distinct pure grids, a model bigger than the dataset memorizes
    grid-identity -> answers instead of reading colors (observed:
    train loss 0.08 but held-out acc 0.37). +-jitter keeps the 8
    anchors separable (min pairwise channel distance ~60) while
    forcing the vision path to classify colors, which generalizes."""
    img = np.zeros((28, 28, 3), np.uint8)
    for i, name in enumerate(colors4):
        r, c = divmod(i, 2)
        rgb = np.asarray(COLORS[name], np.int32)
        if jitter and rng is not None:
            rgb = rgb + rng.integers(-jitter, jitter + 1, 3)
        img[r * 14:(r + 1) * 14, c * 14:(c + 1) * 14] = np.clip(
            rgb, 0, 255).astype(np.uint8)
    return img


def synthesize(out_dir: str, n: int, seed: int = 0, jitter: int = 20):
    """MIMIC-IT-format files: {id: {instruction, answer, image_ids,
    rel_ins_ids}} + {image_id: urlsafe-b64 PNG} (docs/mimicit_format.md).

    Three instruction types, all unanswerable from text alone:
      i%3==0: "color at <pos>"  -> one color word (scored eval task)
      i%3==1: "describe"        -> "TL c0 TR c1 BL c2 BR c3" (8 tokens —
              long enough for speculative-acceptance measurement)
      i%3==2: "is <pos> <color>"-> yes/no (MME-style; the one-click
              harness's real MME scorer runs over held-out pairs)
    Returns (ins_path, img_path, kinds), kinds[i] in {"at","desc","yn"}."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    names = sorted(COLORS)
    images, data = {}, {}
    kinds = []
    for i in range(n):
        colors4 = [names[j] for j in rng.integers(0, len(names), 4)]
        buf = io.BytesIO()
        Image.fromarray(render_grid(colors4, rng, jitter)).save(buf, "PNG")
        images[f"GRID_IMG_{i}"] = base64.urlsafe_b64encode(
            buf.getvalue()).decode()
        if i % 3 == 0:
            pos_i = int(rng.integers(0, 4))
            instruction = f"color at {POSITIONS[pos_i]}"
            answer = colors4[pos_i]
            kinds.append("at")
        elif i % 3 == 1:
            instruction = "describe"
            answer = " ".join(f"{p} {c}"
                              for p, c in zip(POSITIONS, colors4))
            kinds.append("desc")
        else:
            pos_i = int(rng.integers(0, 4))
            truth = bool(rng.integers(0, 2))
            asked = colors4[pos_i] if truth else names[int(
                (names.index(colors4[pos_i])
                 + 1 + rng.integers(0, len(names) - 1)) % len(names))]
            instruction = f"is {POSITIONS[pos_i]} {asked}"
            answer = "yes" if asked == colors4[pos_i] else "no"
            kinds.append("yn")
        data[f"GRID_INS_{i}"] = {
            "instruction": instruction, "answer": answer,
            "image_ids": [f"GRID_IMG_{i}"], "rel_ins_ids": []}
    os.makedirs(out_dir, exist_ok=True)
    ins = os.path.join(out_dir, "GRID_instructions.json")
    img = os.path.join(out_dir, "GRID.json")
    with open(ins, "w") as f:
        json.dump({"data": data}, f)
    with open(img, "w") as f:
        json.dump(images, f)
    return ins, img, kinds


def make_cfg(d: int, layers: int, heads: int, xattn_every: int):
    from otter_tpu.config import (OtterConfig, PerceiverConfig, TextConfig,
                                  VisionConfig)
    return OtterConfig(
        vision=VisionConfig(hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=28, patch_size=14),
        text=TextConfig(arch="mpt", vocab_size=VOCAB, hidden_size=d,
                        num_hidden_layers=layers, num_attention_heads=heads,
                        max_seq_len=256, pos="alibi",
                        norm_type="low_precision_layernorm", act="gelu",
                        intermediate_size=4 * d, tie_embeddings=True,
                        no_bias=True),
        perceiver=PerceiverConfig(dim=64, depth=1, dim_head=16, heads=4,
                                  num_latents=8, max_num_frames=8),
        cross_attn_every_n_layers=xattn_every,
        xattn_dim_head=16, xattn_heads=4,
        media_token_id=MEDIA, eoc_token_id=EOC, answer_token_id=ANS,
        pad_token_id=PAD)


def load_batches(ds, idx: np.ndarray):
    """Indices -> (ids [B,SEQ], mask, labels, patch_images) through the
    REAL MimicitDataset collate (answer-span masking semantics of
    instruction_following.py:163-192 via the <answer>..<|endofchunk|>
    markers the 'simple' format emits)."""
    from otter_tpu.data.mimicit import mask_answer_labels
    samples = [ds[int(i)] for i in idx]
    batch = ds.collate(samples)
    net = batch["net_input"]
    ids = np.asarray(net["input_ids"], np.int32)
    mask = np.asarray(net["attention_masks"], np.int32)
    px = np.asarray(net["patch_images"], np.float32)
    s = ids.shape[1]
    if s < SEQ:
        ids = np.pad(ids, ((0, 0), (0, SEQ - s)), constant_values=PAD)
        mask = np.pad(mask, ((0, 0), (0, SEQ - s)))
    ids, mask = ids[:, :SEQ], mask[:, :SEQ]
    labels = mask_answer_labels(ids, answer_token_id=ANS,
                                eoc_token_id=EOC, eos_token_id=2)
    return ids, mask, labels, px


def train_one(name, cfg, ds, order, steps, out_dir, lr=1e-3, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization, traverse_util

    from otter_tpu.models.otter import OtterVLM

    model = OtterVLM(cfg, dtype=jnp.float32)
    i0, m0, l0, p0 = load_batches(ds, order[:BATCH])
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(p0),
                        jnp.asarray(i0))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10),
        decay_steps=steps, end_value=lr * 0.1)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=0.01))
    opt = tx.init(params)

    def loss_fn(p, px, ids, mask, labels):
        logits = model.apply(p, px, ids, attention_mask=mask)[0]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        tgt = labels[:, 1:]
        keep = tgt >= 0
        nll = -jnp.take_along_axis(
            lp, jnp.maximum(tgt, 0)[..., None], -1)[..., 0]
        return (nll * keep).sum() / jnp.maximum(keep.sum(), 1)

    @jax.jit
    def step(params, opt, px, ids, mask, labels):
        loss, g = jax.value_and_grad(loss_fn)(params, px, ids, mask,
                                              labels)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    t0 = time.time()
    n = len(order)
    for s in range(steps):
        lo = (s * BATCH) % max(1, n - BATCH)
        ids, mask, labels, px = load_batches(ds, order[lo:lo + BATCH])
        params, opt, loss = step(params, opt, jnp.asarray(px),
                                 jnp.asarray(ids), jnp.asarray(mask),
                                 jnp.asarray(labels))
        if s % 100 == 0 or s == steps - 1:
            print(f"[{name}] step {s + 1}/{steps} loss {float(loss):.4f}"
                  f" ({time.time() - t0:.0f}s)", flush=True)

    # proof the model READS the image: mean |tanh(gate)| over the xattn
    # attention gates (Flamingo init 0 = closed)
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    import jax.numpy as jnp2
    gates = [np.mean(np.abs(np.tanh(np.asarray(v, np.float32))))
             for k, v in flat.items() if k.endswith("attn_gate")]
    gate_open = float(np.mean(gates)) if gates else 0.0
    path = os.path.join(out_dir, f"{name}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"[{name}] saved {path} ({os.path.getsize(path)/1e6:.1f} MB), "
          f"mean|tanh(attn_gate)| {gate_open:.3f}")
    return float(loss), gate_open


def evaluate(cfg, params_path, ds, idx, tok):
    """Held-out color accuracy via 1-token greedy decode."""
    import jax.numpy as jnp
    from flax import serialization
    import jax

    from otter_tpu.models.otter import OtterVLM

    model = OtterVLM(cfg, dtype=jnp.float32)
    ids, mask, labels, px = load_batches(ds, idx)
    i0 = jnp.asarray(px)
    params = model.init(jax.random.PRNGKey(0), i0, jnp.asarray(ids))
    with open(params_path, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    @jax.jit
    def first_answer_logits(params, px, ids, mask):
        logits = model.apply(params, px, ids, attention_mask=mask)[0]
        # position of <answer> per row -> logits predicting the NEXT tok
        pos = jnp.argmax((ids == ANS).astype(jnp.int32), axis=1)
        return jnp.take_along_axis(
            logits, pos[:, None, None], 1)[:, 0]

    lg = first_answer_logits(params, jnp.asarray(px), jnp.asarray(ids),
                             jnp.asarray(mask))
    pred = np.asarray(jnp.argmax(lg, -1))
    want = np.array([labels[r][labels[r] >= 0][0] if (labels[r] >= 0).any()
                     else -1 for r in range(len(ids))])
    return float(np.mean(pred == want))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n", type=int, default=24576)
    ap.add_argument("--jitter", type=int, default=20)
    ap.add_argument("--out", default="checkpoints/tiny_vlm")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from otter_tpu.runtime.timing import enable_compile_cache
    enable_compile_cache()

    from otter_tpu.data.mimicit import MimicitDataset, MimicitTask

    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "data")
    ins, img, kinds = synthesize(data_dir, args.n, jitter=args.jitter)
    tok = GridTokenizer()
    ds = MimicitDataset(
        [MimicitTask("GRID", ins, img)], tok,
        max_seq_len=SEQ, patch_image_size=28,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    n = len(ds.train_data_list)
    kind_of = [kinds[int(cid.rsplit("_", 1)[1])]
               for cid in ds.train_data_list]
    rng = np.random.default_rng(7)
    order = rng.permutation(n)
    n_eval = min(512, n // 4)
    train_idx, eval_idx = order[:-n_eval], order[-n_eval:]
    # score held-out accuracy on the single-answer "color at" rows (the
    # "describe" rows' first answer token is position-constant)
    eval_at = np.asarray([i for i in eval_idx
                          if kind_of[int(i)] == "at"])[:256]

    cfg_t = make_cfg(256, 6, 8, xattn_every=3)
    cfg_d = make_cfg(128, 2, 4, xattn_every=2)
    loss_t, gate_t = train_one("target", cfg_t, ds, train_idx,
                               args.steps, args.out, seed=0)
    loss_d, gate_d = train_one("draft", cfg_d, ds, train_idx,
                               max(1, args.steps // 2), args.out, seed=1)
    acc_t = evaluate(cfg_t, os.path.join(args.out, "target.msgpack"),
                     ds, eval_at, tok)
    acc_d = evaluate(cfg_d, os.path.join(args.out, "draft.msgpack"),
                     ds, eval_at, tok)
    print(f"held-out color accuracy: target {acc_t:.3f} (chance 0.125), "
          f"draft {acc_d:.3f}")

    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({"target": cfg_t.to_dict(), "draft": cfg_d.to_dict(),
                   "steps": args.steps, "n": args.n,
                   "jitter": args.jitter, "loss_target": loss_t,
                   "loss_draft": loss_d, "acc_target": acc_t,
                   "acc_draft": acc_d, "gate_target": gate_t,
                   "gate_draft": gate_d, "seq": SEQ,
                   "eval_idx": [int(i) for i in eval_at[:64]],
                   "eval_desc_idx": [int(i) for i in eval_idx
                                     if kind_of[int(i)] == "desc"][:64]},
                  f, indent=1)
    print("meta.json written")


if __name__ == "__main__":
    main()
