"""One-click benchmark harness over the TRAINED tiny VLM (round 5,
VERDICT r4 #4c): the full registry path — model adapter -> MME dataset
-> category scoring -> report files — driven end to end on chip with a
model this repo trained itself.

Rows are REAL MME format (paired yes/no questions per image, category
"color" -> Perception), built from held-out color-grid images the model
never saw, so the resulting acc/acc+ is a genuine generalization score,
not plumbing-only. The adapter is the standard OtterImage registry entry
(prompt contract `<image>User: {q} GPT:<answer>`, the format the model
was trained on through MimicitDataset).

Usage: python tools/run_one_click_tiny.py [--ckpt DIR] [--n 64] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tiny_vlm")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization
    from PIL import Image

    from otter_tpu.api import OtterForConditionalGeneration
    from otter_tpu.benchmarks.evaluate import run
    from otter_tpu.config import OtterConfig
    from otter_tpu.runtime.timing import enable_compile_cache
    from train_tiny_vlm import (COLORS, POSITIONS, SEQ, GridTokenizer,
                                render_grid)

    enable_compile_cache()
    with open(os.path.join(args.ckpt, "meta.json")) as f:
        meta = json.load(f)
    cfg = OtterConfig.from_dict(meta["target"])
    api = OtterForConditionalGeneration(cfg, dtype=jnp.float32)
    vx = jnp.zeros((1, 1, 1, 3, 28, 28), jnp.float32)
    probe = jnp.zeros((1, SEQ), jnp.int32)
    params = api.model.init(jax.random.PRNGKey(0), vx, probe)
    with open(os.path.join(args.ckpt, "target.msgpack"), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    api.params = jax.tree_util.tree_map(jnp.asarray, params)
    api._engine = None

    # held-out MME rows: FRESH grids (generation seed disjoint from the
    # training seed), two questions per image (one yes, one no) so the
    # real MME acc+ metric is exercised
    rng = np.random.default_rng(10_000_019)
    names = sorted(COLORS)
    rows = []
    for i in range(args.n):
        colors4 = [names[j] for j in rng.integers(0, len(names), 4)]
        img = Image.fromarray(render_grid(colors4))
        pos_i = int(rng.integers(0, 4))
        wrong = names[(names.index(colors4[pos_i]) + 1
                       + int(rng.integers(0, len(names) - 1)))
                      % len(names)]
        for asked, ans in ((colors4[pos_i], "yes"), (wrong, "no")):
            rows.append({
                "id": f"color_{i}",
                "instruction": f"is {POSITIONS[pos_i]} {asked}",
                "answer": ans,
                "images": [img], "image_ids": [f"heldout_{i}"]})

    out_dir = args.out or os.path.join(args.ckpt, "one_click")
    os.makedirs(out_dir, exist_ok=True)
    config = {"models": [{"name": "otter_image", "model": api,
                          "tok": GridTokenizer(), "patch_size": 28,
                          "max_new_tokens": 3}],
              "datasets": [{"name": "mme", "rows": rows,
                            "data_path": "heldout-colorgrid"}]}
    res = run(config, out_dir)
    mme = res["otter_image"]["mme"]
    print(json.dumps(mme, indent=1, default=str))
    cat = mme["Perception"]["categories"]["color"]
    print(f"\nMME color category on held-out grids: acc {cat['acc']:.3f}"
          f" (chance 0.5), acc+ {cat['acc_plus']:.3f} (chance 0.25); "
          f"reports in {out_dir}")


if __name__ == "__main__":
    main()
