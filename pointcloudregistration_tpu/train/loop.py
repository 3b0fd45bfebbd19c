"""Shared trainer plumbing: checkpoint + metric-log + resume for every
pipeline driver.

The reference wires TensorBoard and torch.save by hand into each of its four
trainers (dip/train.py:62,121-125; ROPNet/src/train.py:236-308;
c2p-net/trainNgeNet.py:211-216; correspondence/lib/trainer.py:68-108). Here
one `TrainHooks` object gives any step-loop the same behavior: periodic Orbax
checkpoints with best-criteria tracking, jsonl/TensorBoard metric streaming,
and restore-latest resume that continues the exact loss curve (data keys are
derived from the absolute step, and the optimizer state rides the
checkpoint).
"""

from __future__ import annotations

from typing import Any

from pointcloudregistration_tpu.train.checkpoint import CheckpointManager
from pointcloudregistration_tpu.utils.logging import MetricLogger


class TrainHooks:
    """Optional checkpoint/log/resume plumbing around a step loop.

    Every method is a no-op when the corresponding directory is None, so
    drivers call them unconditionally.
    """

    def __init__(self, ckpt_dir: str | None = None,
                 log_dir: str | None = None, name: str = "train",
                 save_every: int = 100, max_to_keep: int = 3):
        self.ckpt = (CheckpointManager(ckpt_dir, max_to_keep=max_to_keep)
                     if ckpt_dir else None)
        self.logger = MetricLogger(log_dir, name) if log_dir else None
        self.save_every = save_every

    def restore(self, state_template: Any):
        """(state, start_step): latest checkpoint when present, else the
        template at step 0 — the ROPNet --resume contract
        (ROPNet/src/train.py:236-256: restore model+optimizer+epoch)."""
        if self.ckpt is not None:
            restored = self.ckpt.restore(state_template)
            if restored is not None:
                return restored, int(restored.step)
        return state_template, 0

    def log(self, step: int, metrics: dict):
        if self.logger is not None:
            self.logger.log(step, **metrics)

    def step_end(self, step: int, state: Any, metrics: dict,
                 total_steps: int):
        """Periodic + final checkpoint with best-criteria tracking."""
        if self.ckpt is None:
            return
        done = step + 1
        if done % self.save_every == 0 or done == total_steps:
            self.ckpt.save(done, state, metrics=metrics)

    def close(self):
        if self.logger is not None:
            self.logger.close()
