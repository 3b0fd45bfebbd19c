"""Long NgeNet training run on one TPU chip — the learned-C2P enablement run.

Batched (vmapped-gradient) variant of pipelines.ngenet.train: each step draws
B synthetic pairs on device, computes per-pair grads, and applies the mean
update — equivalent to the reference's budget of ~4800 single-pair SGD steps
(trainNgeNet.py: 40 epochs x ~120 samples, SGD lr 0.005 momentum 0.98,
ExpLR gamma 0.95/epoch) at 1/B the step count and better MXU utilization.

Usage: python examples/train_ngenet_long.py [steps] [batch] [ckpt_dir]
Writes checkpoints + best.json (best recall) and a jsonl metric log.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.loop import TrainHooks

make_samples = ng.make_samples
batched_train_step = ng.batched_train_step


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else "artifacts/ngenet_ckpt2"
    cfg = ng.NgeNetTrainConfig()
    key = jax.random.PRNGKey(42)

    state = ng.create_train_state(jax.random.fold_in(key, 0), cfg,
                                  ng.make_sample(jax.random.fold_in(key, 1),
                                                 cfg))
    hooks = TrainHooks(ckpt_dir, ckpt_dir, "ngenet_long", save_every=250)
    state, start = hooks.restore(state)

    # saliency gate survives resume: re-derive from the best recall so far
    # (the reference's gate persists within a run, trainNgeNet.py:217-219)
    w_sal = 0.0
    if hooks.ckpt is not None:
        best = hooks.ckpt._best.get("recall")
        if best is not None and best["value"] > cfg.saliency_recall_gate:
            w_sal = 1.0
    print(f"start step {start}, steps {steps}, batch {B}, w_sal {w_sal}",
          flush=True)
    t0 = time.perf_counter()
    for step in range(start, steps):
        kd, kl = jax.random.split(jax.random.fold_in(key, step + 2))
        samples = make_samples(kd, cfg, B)
        state, m = batched_train_step(state, jax.random.split(kl, B),
                                      samples, jnp.asarray(w_sal), cfg)
        if step % 25 == 0 or step == steps - 1 or (step + 1) % 250 == 0:
            mf = {k: float(v) for k, v in m.items()}
            if mf["recall"] > cfg.saliency_recall_gate:
                w_sal = 1.0
            mf["w_saliency"] = w_sal
            mf["wall_s"] = round(time.perf_counter() - t0, 1)
            hooks.log(step, mf)
            hooks.step_end(step, state, mf, steps)
            print(json.dumps({"step": step, **{k: round(v, 4)
                                               for k, v in mf.items()}}),
                  flush=True)
    hooks.close()


if __name__ == "__main__":
    main()
