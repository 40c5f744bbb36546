"""OpenFlamingo-style public-datasets eval suite (reference
`pipeline/benchmarks/public_datasets_suite/evaluate.py:367+`):
COCO/Flickr captioning (CIDEr), VQAv2/OK-VQA/TextVQA/VizWiz (VQA accuracy),
ImageNet/HatefulMemes (rank classification), with k-shot in-context
examples (0/4/8/16/32) and data-parallel sharding over JAX processes
(replacing the reference's DDP sharded inference, eval_model.py:21-22).

Datasets are provided as local JSON manifests:
  captioning: [{image: path|PIL, caption/captions}]
  vqa:        [{image, question, answers: [str]}]
  classification: [{image, class_id}]
"""

from __future__ import annotations

import json
import random
from typing import Dict, List, Optional, Sequence

from otter_tpu.benchmarks.public_suite.coco_metric import (
    compute_cider, postprocess_captioning_generation)
from otter_tpu.benchmarks.public_suite.vqa_metric import (
    compute_vqa_accuracy, postprocess_vqa_generation)
from otter_tpu.benchmarks.public_suite.classification_utils import (
    rank_classification)


def _shard(items: Sequence, rank: int, world: int) -> List:
    return list(items)[rank::world]


def _sample_shots(rng: random.Random, train_items: Sequence, k: int,
                  exclude_idx: int) -> List:
    pool = [x for i, x in enumerate(train_items) if i != exclude_idx]
    return rng.sample(pool, min(k, len(pool))) if k else []


def evaluate_captioning(model, *, test_items: Sequence[dict],
                        train_items: Sequence[dict] = (),
                        num_shots: int = 0, seed: int = 42,
                        rank: int = 0, world: int = 1) -> float:
    """Few-shot captioning; returns CIDEr."""
    rng = random.Random(seed)
    results = []
    annotations = {}
    for i, item in enumerate(_shard(test_items, rank, world)):
        shots = _sample_shots(rng, train_items, num_shots, -1)
        context = "".join(
            f"<image>Output:{s['caption']}<|endofchunk|>" for s in shots)
        prompt = context + "Output:"
        pred = model.generate(prompt, item["image"])
        pred = postprocess_captioning_generation(pred)
        img_id = str(item.get("image_id", i))
        results.append({"image_id": img_id, "caption": pred})
        annotations[img_id] = item.get("captions") or [item["caption"]]
    return compute_cider(results, annotations)


def evaluate_vqa(model, *, test_items: Sequence[dict],
                 train_items: Sequence[dict] = (), num_shots: int = 0,
                 seed: int = 42, rank: int = 0, world: int = 1) -> float:
    """Few-shot VQA; returns VQA accuracy (0..100)."""
    rng = random.Random(seed)
    results = []
    for i, item in enumerate(_shard(test_items, rank, world)):
        shots = _sample_shots(rng, train_items, num_shots, -1)
        context = "".join(
            f"<image>Question:{s['question']} Short answer:"
            f"{s['answers'][0]}<|endofchunk|>" for s in shots)
        prompt = context + f"Question:{item['question']} Short answer:"
        pred = model.generate(prompt, item["image"])
        results.append({"prediction": postprocess_vqa_generation(pred),
                        "answers": item["answers"]})
    return compute_vqa_accuracy(results)


def evaluate_classification(model, *, test_items: Sequence[dict],
                            classnames: Sequence[str],
                            prompt: str = "A photo of",
                            rank: int = 0, world: int = 1) -> float:
    """Rank classification accuracy (0..100)."""
    n_correct = n_total = 0
    for item in _shard(test_items, rank, world):
        pred = rank_classification(model, prompt, item["image"], classnames)
        n_correct += int(pred == int(item["class_id"]))
        n_total += 1
    return 100.0 * n_correct / max(n_total, 1)


EVAL_FNS = {
    "coco": evaluate_captioning,
    "flickr": evaluate_captioning,
    "vqav2": evaluate_vqa,
    "ok_vqa": evaluate_vqa,
    "textvqa": evaluate_vqa,
    "vizwiz": evaluate_vqa,
    "imagenet": evaluate_classification,
    "hateful_memes": evaluate_classification,
}


def main():
    import argparse
    import jax
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="otter_image")
    p.add_argument("--model_path", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--dataset", required=True, choices=sorted(EVAL_FNS))
    p.add_argument("--test_manifest", required=True)
    p.add_argument("--train_manifest", default=None)
    p.add_argument("--classnames_file", default=None)
    p.add_argument("--shots", type=int, nargs="+", default=[0, 4, 8])
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from otter_tpu.benchmarks.models.base_model import load_model
    model = load_model(args.model, {"model_path": args.model_path,
                                    "tokenizer": args.tokenizer})
    with open(args.test_manifest) as f:
        test_items = json.load(f)
    train_items = []
    if args.train_manifest:
        with open(args.train_manifest) as f:
            train_items = json.load(f)

    rank, world = jax.process_index(), jax.process_count()
    fn = EVAL_FNS[args.dataset]
    for shots in args.shots:
        if args.dataset in ("imagenet", "hateful_memes"):
            from otter_tpu.benchmarks.public_suite.classification_utils \
                import HM_CLASSNAMES, load_classnames
            names = load_classnames(args.classnames_file) \
                if args.classnames_file else HM_CLASSNAMES
            score = fn(model, test_items=test_items, classnames=names,
                       rank=rank, world=world)
        else:
            score = fn(model, test_items=test_items,
                       train_items=train_items, num_shots=shots,
                       seed=args.seed, rank=rank, world=world)
        print(json.dumps({"dataset": args.dataset, "shots": shots,
                          "score": score}))


if __name__ == "__main__":
    main()
