"""Benchmark dataset registry + ABC (reference
`pipeline/benchmarks/datasets/base_eval_dataset.py:7-50`).

Datasets accept either a HuggingFace dataset path (downloaded when network
is available) or pre-loaded `rows` (list of dicts) for offline use — the
scoring logic is identical either way.
"""

from __future__ import annotations

import importlib
from abc import ABC, abstractmethod
from typing import Dict, List, Optional

AVAILABLE_EVAL_DATASETS: Dict[str, str] = {
    "mmbench": "MMBenchDataset",
    "mme": "MMEDataset",
    "mathvista": "MathVistaDataset",
    "mmvet": "MMVetDataset",
    "seedbench": "SEEDBenchDataset",
    "pope": "PopeDataset",
    "scienceqa": "ScienceQADataset",
    "magnifierbench": "MagnifierBenchDataset",
}


class BaseEvalDataset(ABC):
    def __init__(self, name: str, dataset_path: str, *,
                 max_batch_size: int = 1):
        self.name = name
        self.dataset_path = dataset_path
        self.max_batch_size = max_batch_size

    def evaluate(self, model, **kwargs):
        return self._evaluate(model, **kwargs)

    @abstractmethod
    def _evaluate(self, model):
        ...

    @staticmethod
    def _load_hf(path: str, split: str, cache_dir=None):
        from datasets import load_dataset as hf_load
        return hf_load(path, split=split, cache_dir=cache_dir)


def load_dataset(dataset_name: str,
                 dataset_args: Optional[Dict] = None) -> BaseEvalDataset:
    assert dataset_name in AVAILABLE_EVAL_DATASETS, (
        f"{dataset_name} is not an available eval dataset")
    module = importlib.import_module(
        f"otter_tpu.benchmarks.datasets.{dataset_name}")
    cls = getattr(module, AVAILABLE_EVAL_DATASETS[dataset_name])
    args = dict(dataset_args or {})
    args.pop("name", None)
    return cls(**args)
