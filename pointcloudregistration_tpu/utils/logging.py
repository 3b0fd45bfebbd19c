"""Metric logging: jsonl stream + optional TensorBoard.

Replaces the reference's SummaryWriter-in-every-trainer pattern
(dip/train.py:62, ROPNet/src/train.py:32-42, trainNgeNet.py:18-22) with one
logger that always writes machine-readable jsonl and mirrors to TensorBoard
when tensorboardX/flax metric writers are available.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, logdir: str, name: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from flax.metrics import tensorboard
            self._tb = tensorboard.SummaryWriter(os.path.join(logdir, "tb"))
        except Exception:
            pass

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
