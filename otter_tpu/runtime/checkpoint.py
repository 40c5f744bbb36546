"""Checkpoint store: one system replacing the reference's three ad-hoc save
paths (SURVEY.md §5: trainable-only .pt, save_pretrained HF export, DeepSpeed
zero3 gathered dicts — `train_utils.py:60-67,186-262`).

Orbax-backed sharded save/restore of TrainState (params + optimizer state +
step), with:
  - trainable-only saves (frozen towers skipped, like `get_checkpoint`)
  - keep-last-N pruning (`delete_previous_checkpoint` behavior)
  - HF-interop export via models/convert.flax_to_hf
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


class CheckpointStore:
    def __init__(self, directory: str, *, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.PyTreeCheckpointer()

    # ── naming ──────────────────────────────────────────────────────

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint_{step}")

    def steps(self):
        out = []
        for d in os.listdir(self.directory):
            m = re.fullmatch(r"checkpoint_(\d+)", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        s = self.steps()
        return s[-1] if s else None

    # ── save/restore ────────────────────────────────────────────────

    def save(self, step: int, state, *, metadata: Optional[dict] = None,
             trainable_only: bool = False) -> str:
        """state: train.step.TrainState (or any pytree with
        .trainable/.frozen/.opt_state), saved sharded via orbax."""
        path = self._path(step)
        if os.path.exists(path):  # re-saving the same step overwrites
            shutil.rmtree(path)
        tree = {
            "step": np.asarray(step),
            "trainable": state.trainable,
            "opt_state": state.opt_state,
        }
        if not trainable_only:
            tree["frozen"] = state.frozen
        self._ckptr.save(path, tree)
        meta = dict(metadata or {}, step=step,
                    trainable_only=trainable_only)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        self._prune()
        return path

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure of `state` (sharding preserved from
        the target's arrays). Returns (state, metadata)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self._path(step)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        template = {
            "step": np.asarray(0),
            "trainable": state.trainable,
            "opt_state": state.opt_state,
        }
        if not meta.get("trainable_only"):
            template["frozen"] = state.frozen
        restored = self._ckptr.restore(path, item=template)
        new_state = state.replace(
            step=jax.numpy.asarray(restored["step"]),
            trainable=restored["trainable"],
            opt_state=restored["opt_state"])
        if "frozen" in restored:
            new_state = new_state.replace(frozen=restored["frozen"])
        return new_state, meta

    def _prune(self):
        steps = self.steps()
        while self.keep and len(steps) > self.keep:
            victim = steps.pop(0)
            shutil.rmtree(self._path(victim), ignore_errors=True)

    # ── HF-interop export (save_final_weights parity) ───────────────

    def export_hf(self, params: Dict, cfg, out_path: str,
                  *, trainable_only_paths=None) -> str:
        """Write an HF-named .safetensors of the (optionally trainable-only)
        params."""
        from otter_tpu.models.convert import flax_to_hf
        from safetensors.numpy import save_file
        flat = {k: np.asarray(v) for k, v in
                traverse_util.flatten_dict(params, sep="/").items()}
        if trainable_only_paths is not None:
            flat = {k: v for k, v in flat.items()
                    if k in trainable_only_paths}
        hf = flax_to_hf(flat, cfg)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                    exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in hf.items()},
                  out_path)
        return out_path
