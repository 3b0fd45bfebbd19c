"""DIP descriptors end-to-end on the REAL phantom dataset.

The reference DIP flow (dip/preprocess_correspondences.py ->
preprocess_lrf.py -> train.py -> demo.py) on data generated from the real
phantom mesh: preprocess LRF patch stores from the pickle's train rows,
train the descriptor net, then register held-out test pairs with
descriptor-RANSAC and report RRE/RTE + inlier ratio + FMR@0.05
(testScript.py:106).

Usage: python examples/train_dip_real.py [steps] [pickle] [ckpt_dir]
Writes artifacts/<ckpt_dir>/accuracy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu import metrics
from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import loaders
from pointcloudregistration_tpu.pipelines import dip


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    pkl = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/data/RANSACTraincropped_real.pickle"
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else "artifacts/dip_real"
    cfg = dip.DIPConfig(n_points=2048)

    rows = loaders.load_ransac_pickle(pkl)
    n_train = int(len(rows) * 0.8)
    train_rows, test_rows = rows[:n_train], rows[n_train:]
    print(f"{len(train_rows)} train / {len(test_rows)} test pairs",
          flush=True)

    store_path = os.path.join(ckpt_dir, "patch_store.npz")
    os.makedirs(ckpt_dir, exist_ok=True)
    t0 = time.perf_counter()
    if os.path.exists(store_path):
        store = dict(np.load(store_path))
    else:
        store = dip.preprocess_dataset(jax.random.PRNGKey(0), train_rows,
                                       cfg, out_path=store_path)
    n_stored = len(store["patches1"])
    print(f"patch store: {n_stored} pairs "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    data = [{k: store[k][i] for k in
             ("patches1", "patches2", "valid1", "valid2")}
            for i in range(n_stored)]
    t0 = time.perf_counter()
    state, hist = dip.train(jax.random.PRNGKey(1), cfg, steps=steps,
                            data=data, ckpt_dir=ckpt_dir, log_dir=ckpt_dir,
                            resume=True)
    print(f"trained {steps} steps ({time.perf_counter() - t0:.0f}s): "
          f"loss {hist[-1]['loss']:.4f} "
          f"pos_dist {hist[-1]['mean_pos_dist']:.4f}", flush=True)

    summary, results = evaluate(state, test_rows, cfg, steps=steps)
    with open(os.path.join(ckpt_dir, "accuracy.json"), "w") as f:
        json.dump({"summary": summary, "pairs": results}, f, indent=1)
    print(json.dumps(summary, indent=1))


def evaluate(state, test_rows, cfg, steps=None):
    """Held-out evaluation: descriptor-RANSAC registration + FMR.

    Shared by the retrained-weights flow (main) and the reference-weights
    flow (examples/eval_dip_reference_weights.py)."""
    results = []
    for i, row in enumerate(test_rows):
        src = jnp.asarray(np.asarray(row["source"], np.float32))
        tgt = jnp.asarray(np.asarray(row["target"], np.float32))
        T = np.asarray(row["transformation"], np.float32)
        key = jax.random.PRNGKey(500 + i)
        R, t, info = dip.register(state, key, src, tgt, cfg)
        rre = float(metrics.isotropic_R_error(R, jnp.asarray(T[:3, :3])))
        rte = float(metrics.isotropic_t_error(t, jnp.asarray(T[:3, 3])))
        # inlier ratio of the mutual descriptor matches at the GT pose
        k1, k2, _ = jax.random.split(key, 3)
        idx_s, d_s, keep_s = dip.describe(state, k1, src, cfg)
        idx_t, d_t, keep_t = dip.describe(state, k2, tgt, cfg)
        sim = jnp.einsum("nc,mc->nm", d_s, d_t)
        nn_t = jnp.argmax(jnp.where(keep_t[None], sim, -jnp.inf), -1)
        nn_s = jnp.argmax(jnp.where(keep_s[:, None], sim, -jnp.inf), 0)
        mutual = (nn_s[nn_t] == jnp.arange(len(idx_s))) & keep_s
        aligned = se3.transform(src[idx_s], jnp.asarray(T[:3, :3]),
                                jnp.asarray(T[:3, 3]))
        d = jnp.linalg.norm(aligned - tgt[idx_t][nn_t], axis=-1)
        ir = float(jnp.sum((d < 0.05) & mutual)
                   / jnp.maximum(jnp.sum(mutual), 1))
        results.append({"rre": rre, "rte": rte, "inlier_ratio": ir,
                        "ransac_fitness": float(info["fitness"])})
        print(json.dumps({"pair": i, **{k: round(v, 4)
                                        for k, v in results[-1].items()}}),
              flush=True)

    ir = np.asarray([r["inlier_ratio"] for r in results])
    rre = np.asarray([r["rre"] for r in results])
    summary = {
        "n_test_pairs": len(results),
        "steps": steps,
        "mean_rre_deg": round(float(rre.mean()), 3),
        "median_rre_deg": round(float(np.median(rre)), 3),
        "mean_rte": round(float(np.mean([r["rte"] for r in results])), 4),
        "mean_inlier_ratio": round(float(ir.mean()), 4),
        "fmr_at_0.05": round(float((ir > 0.05).mean()), 4),
        "registration_recall_re15": round(float((rre < 15.0).mean()), 4),
    }
    return summary, results


if __name__ == "__main__":
    main()
