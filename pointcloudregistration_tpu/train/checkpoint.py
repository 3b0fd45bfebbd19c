"""Orbax checkpointing of train states — one mechanism for every pipeline.

Replaces the reference's four ad-hoc torch.save patterns (SURVEY.md §5:
dip best/final state_dicts, ROPNet's 4-criteria checkpoints with resume,
NgeNet best_loss/best_recall, Lepard Trainer snapshots) with Orbax:
sharded-array-aware, multi-host-safe, atomic.

Best-k tracking mirrors the reference's criteria (min loss / min rotation
error / max recall) via a small metadata sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))
        self._best_path = os.path.join(directory, "best.json")
        self._best: dict = {}
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                self._best = json.load(f)

    def save(self, step: int, state: Any, metrics: dict | None = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metrics:
            self._update_best(step, metrics)

    def _update_best(self, step: int, metrics: dict):
        """Track best checkpoints per criterion (ROPNet/src/train.py:286-308
        keeps min-loss and min-rot-error; trainNgeNet.py:211-216 keeps
        best_loss/best_recall)."""
        changed = False
        for k, v in metrics.items():
            v = float(v)
            mode = "max" if "recall" in k or "fitness" in k else "min"
            cur = self._best.get(k)
            better = (cur is None or
                      (mode == "min" and v < cur["value"]) or
                      (mode == "max" and v > cur["value"]))
            if better:
                self._best[k] = {"value": v, "step": step}
                changed = True
        if changed:
            with open(self._best_path, "w") as f:
                json.dump(self._best, f, indent=2)

    def restore(self, state_template: Any, step: int | None = None):
        """Restore latest (or a given step) into the template's structure."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def best_step(self, criterion: str) -> int | None:
        rec = self._best.get(criterion)
        return None if rec is None else rec["step"]

    @property
    def latest_step(self):
        return self._mgr.latest_step()
