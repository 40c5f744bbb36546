"""Benchmark model registry + ABC (reference
`pipeline/benchmarks/models/base_model.py:7-48`). Adapters for external
GPU-only systems (llava, qwen_vl, instructblip, video_chat, ...) are out of
scope for the TPU framework; the registry covers this framework's model
families plus the API-based gpt4v adapter."""

from __future__ import annotations

import importlib
from abc import ABC, abstractmethod
from typing import Dict, Optional

AVAILABLE_MODELS: Dict[str, str] = {
    "otter_image": "OtterImage",
    "otter_video": "OtterVideo",
    "fuyu": "Fuyu",
    "otterhd": "OtterHD",
    "idefics": "Idefics",
    "gpt4v": "OpenAIGPT4Vision",
}


class BaseModel(ABC):
    def __init__(self, model_name: str, model_path: str, *,
                 max_batch_size: int = 1):
        self.name = model_name
        self.model_path = model_path
        self.max_batch_size = max_batch_size

    @abstractmethod
    def generate(self, question: str, raw_image_data) -> str:
        ...

    @abstractmethod
    def eval_forward(self, question: str, answer: str, image) -> float:
        """Log-likelihood style scoring hook."""
        ...


def load_model(model_name: str, model_args: Optional[Dict] = None
               ) -> BaseModel:
    assert model_name in AVAILABLE_MODELS, (
        f"{model_name} is not an available model")
    module = importlib.import_module(
        f"otter_tpu.benchmarks.models.{model_name}")
    cls = getattr(module, AVAILABLE_MODELS[model_name])
    args = dict(model_args or {})
    args.pop("name", None)
    return cls(**args)
