"""Weak-scaling study of the pairs-sharded C2P pipeline.

Runs `register_batch_sharded` with a growing pairs-axis mesh and a
proportionally growing batch (weak scaling), reporting pairs/s per mesh
size. On a CPU host this exercises the 8 virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu);
on a pod slice it rides ICI/DCN. The structural guarantee behind the
numbers — zero cross-pair collectives in the compiled program — is
asserted by tests/test_scaling.py.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH="/root/repo:$PYTHONPATH" python examples/scaling_study.py
"""

import json
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # sitecustomize presets a TPU platform; the config override must land
    # before backend init for the CPU-mesh run to actually use the CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.parallel import mesh as mesh_mod, pipeline
from pointcloudregistration_tpu.pipelines import c2p


def main(pairs_per_device: int = 2, n_points: int = 512):
    cfg = c2p.C2PConfig(
        ransac_hypotheses=2048, icp_iters=10,
        ndp=c2p.C2PConfig().ndp._replace(m=3, iters=10, width=32))
    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    results = []
    for nd in sizes:
        mesh = mesh_mod.make_mesh(n_pairs=nd, n_blocks=1,
                                  devices=jax.devices()[:nd])
        B = pairs_per_device * nd
        key = jax.random.PRNGKey(0)
        data = synthetic.make_batch(key, B, n_points=n_points,
                                    deform_amp=0.05)
        args = (data["source"], data["target"], data["source_mask"],
                data["target_mask"])
        out = pipeline.register_batch_sharded(mesh, key, *args, cfg=cfg)
        float(jnp.sum(out["chamfer_rigid"]))        # sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = pipeline.register_batch_sharded(mesh, key, *args, cfg=cfg)
            float(jnp.sum(out["chamfer_rigid"]))
        dt = (time.perf_counter() - t0) / reps
        results.append({"devices": nd, "batch": B,
                        "pairs_per_sec": round(B / dt, 2)})
        print(json.dumps(results[-1]))
    if len(results) > 1:
        base = results[0]["pairs_per_sec"]
        eff = results[-1]["pairs_per_sec"] / (base * results[-1]["devices"])
        print(json.dumps({"weak_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
