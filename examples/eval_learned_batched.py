"""Learned-C2P throughput eval: the 234-pair corpus at batch B.

The batch-1 per-pair walls in `eval_accuracy.py` sit on the tunnel's
~24 ms dispatch floor (examples/tunnel_floor_probe.py), which hides the
device-side cost the ≤30 ms/pair target is about. This eval runs the
SAME held-out test pairs through the same
`c2p.register_pair_learned` / `c2p.register_pair` programs, vmapped over
batches of B pairs, so the fixed dispatch cost amortizes and the
reported ms/pair approaches true device time. Accuracy columns are
recomputed to confirm the batched programs return the identical result.

Usage: python -m examples.eval_learned_batched [batch] [ckpt] [pickle]
Writes artifacts/learned_batched_eval.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu import metrics
from pointcloudregistration_tpu.data.mri import NgeNetPairs
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.checkpoint import CheckpointManager

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from eval_accuracy import calibrated_cfg, N_POINTS  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "artifacts/ngenet_real_v3"
    pkl = sys.argv[3] if len(sys.argv) > 3 else \
        "artifacts/data/RANSACTraincropped_real_v3.pickle"

    cfg = calibrated_cfg(pkl)
    state = ng.create_train_state(jax.random.PRNGKey(0), cfg)
    state = CheckpointManager(ckpt).restore(state)
    assert state is not None
    print(f"restored step {int(state.step)}", flush=True)

    test = NgeNetPairs(pkl, "test", max_points=N_POINTS)
    n = (len(test) // B) * B
    print(f"eval {n}/{len(test)} pairs at batch {B}", flush=True)

    ccfg = c2p.C2PConfig()

    @partial(jax.jit, static_argnames=())
    def learned_batch(keys, src, tgt, sm, tm):
        return jax.vmap(lambda k, s, t, a, b: c2p.register_pair_learned(
            state, k, s, t, a, b, ngenet_cfg=cfg))(keys, src, tgt, sm, tm)

    @partial(jax.jit, static_argnames=())
    def classical_batch(keys, src, tgt, sm, tm):
        return jax.vmap(lambda k, s, t, a, b: c2p.register_pair(
            k, s, t, a, b, ccfg))(keys, src, tgt, sm, tm)

    rows, walls_l, walls_c = [], [], []
    for start in range(0, n, B):
        items = [test[i] for i in range(start, start + B)]
        src = jnp.asarray(np.stack(
            [ng._pad_cloud(it["src_points"], N_POINTS)[0] for it in items]))
        sm = jnp.asarray(np.stack(
            [ng._pad_cloud(it["src_points"], N_POINTS)[1] for it in items]))
        tgt = jnp.asarray(np.stack(
            [ng._pad_cloud(it["tgt_points"], N_POINTS)[0] for it in items]))
        tm = jnp.asarray(np.stack(
            [ng._pad_cloud(it["tgt_points"], N_POINTS)[1] for it in items]))
        Ts = np.stack([np.asarray(it["transf"], np.float32)
                       for it in items])
        keys = jnp.asarray(np.stack(
            [jax.random.PRNGKey(100 + start + i) for i in range(B)]))

        t0 = time.perf_counter()
        learned = learned_batch(keys, src, tgt, sm, tm)
        _ = float(jnp.sum(learned["chamfer_nonrigid"]))   # host sync
        walls_l.append((time.perf_counter() - t0) / B)

        t0 = time.perf_counter()
        classical = classical_batch(keys, src, tgt, sm, tm)
        _ = float(jnp.sum(classical["chamfer_nonrigid"]))
        walls_c.append((time.perf_counter() - t0) / B)

        rre_l = metrics.isotropic_R_error(learned["R"],
                                          jnp.asarray(Ts[:, :3, :3]))
        rre_c = metrics.isotropic_R_error(classical["R"],
                                          jnp.asarray(Ts[:, :3, :3]))
        for i in range(B):
            rows.append({
                "rre_learned": float(rre_l[i]),
                "rre_classical": float(rre_c[i]),
                "chamfer_learned": float(learned["chamfer_nonrigid"][i]),
                "chamfer_classical": float(classical["chamfer_nonrigid"][i]),
            })

    wl, wc = np.asarray(walls_l[1:]), np.asarray(walls_c[1:])
    summary = {
        "n_pairs": n, "batch": B, "ckpt_step": int(state.step),
        "learned_ms_per_pair_median": round(float(np.median(wl)) * 1e3, 2),
        "classical_ms_per_pair_median": round(float(np.median(wc)) * 1e3, 2),
        "learned_median_rre_deg": round(float(np.median(
            [r["rre_learned"] for r in rows])), 3),
        "classical_median_rre_deg": round(float(np.median(
            [r["rre_classical"] for r in rows])), 3),
        "learned_median_chamfer": round(float(np.median(
            [r["chamfer_learned"] for r in rows])), 4),
        "classical_median_chamfer": round(float(np.median(
            [r["chamfer_classical"] for r in rows])), 4),
    }
    out = {"summary": summary, "pairs": rows}
    with open("artifacts/learned_batched_eval.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
