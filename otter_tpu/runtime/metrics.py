"""Metrics/logging: step timing meters, samples/sec accounting, optional
wandb, and jax.profiler hooks.

Keeps the reference's observability surface (SURVEY.md §5: AverageMeter
`train_utils.py:83-99`, samples/sec/gpu logging
`instruction_following.py:256-279`) and adds a `jax.profiler` trace context
the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Optional


class AverageMeter:
    """Running average (train_utils.py:83-99)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsLogger:
    """Console + optional wandb + JSONL metrics sink."""

    def __init__(self, *, run_name: str = "run", report_to_wandb: bool = False,
                 wandb_project: Optional[str] = None,
                 wandb_entity: Optional[str] = None,
                 jsonl_path: Optional[str] = None, rank: int = 0):
        self.rank = rank
        self.jsonl = None
        self.wandb = None
        if rank != 0:
            return
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
            self.jsonl = open(jsonl_path, "a")
        if report_to_wandb:
            try:
                import wandb
                wandb.init(project=wandb_project, entity=wandb_entity,
                           name=run_name)
                self.wandb = wandb
            except Exception as e:
                print(f"wandb unavailable ({e}); console logging only",
                      file=sys.stderr)

    def log(self, step: int, metrics: dict):
        if self.rank != 0:
            return
        clean = {k: (float(v) if hasattr(v, "__float__") else v)
                 for k, v in metrics.items()}
        print(f"[step {step}] " + " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in clean.items()), flush=True)
        if self.jsonl:
            self.jsonl.write(json.dumps({"step": step, **clean}) + "\n")
            self.jsonl.flush()
        if self.wandb:
            self.wandb.log(clean, step=step)


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace capture around a code region (no-op if logdir is
    None)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
