"""Large-cloud study: the >100k-point capability the reference lacks.

Substantiates parallel/ring.py's claim with measurements at 100k-500k
points per cloud (the reference caps clouds at 3000 —
c2p-net/ngenet/data/MRI.py:21 — because its pipeline materializes (N,M)
distance matrices; pytorch3d knn_points would OOM far below 500k pairs of
clouds on its single GPU):

  1. single-chip Pallas bidirectional NN distance (ops/nnd_pallas) at
     N = M = 100k / 200k / 500k, with achieved-bandwidth roofline
     accounting (the kernel is compute-bound: N*M*8 flops over N*M/tile
     HBM traffic),
  2. single-chip blocked ICP through the same kernel (full rigid
     registration of a 100k-point pair),
  3. multi-device correctness: `sharded_icp` on the blocks axis at >=64k
     points (8-device CPU mesh when no multi-chip TPU is available),
     checked against the single-device pose.

Run on TPU:  python examples/large_cloud_study.py
CPU mesh:    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
             JAX_PLATFORMS=cpu python examples/large_cloud_study.py --cpu
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3


def sync(x) -> float:
    return float(jnp.sum(x))


def nnd_study():
    from pointcloudregistration_tpu.ops import nnd_pallas
    out = []
    for n in (100_000, 200_000, 500_000):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, 3), jnp.float32)
        y = x + 0.01 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (n, 3), jnp.float32)
        f = jax.jit(lambda a, b: nnd_pallas.nn_distance(a, b))
        d1, i1, d2, i2 = f(x, y)
        sync(d1)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            d1, i1, d2, i2 = f(x, y)
            sync(d1)
        dt = (time.perf_counter() - t0) / reps
        # bidirectional brute-force NN: 2 * N * M * (3 mul + 3 fma ~ 8 flop)
        gflop = 2 * n * n * 8 / 1e9
        out.append({"n_points": n, "seconds": round(dt, 3),
                    "tflops_achieved": round(gflop / dt / 1e3, 2),
                    "mean_nn_dist": round(float(jnp.mean(jnp.sqrt(d1))),
                                          5)})
        print(json.dumps(out[-1]), flush=True)
    return out


def _phantom(key, n):
    """Structured surface cloud: a dense-enough isotropic Gaussian blob is
    degenerate for ICP (any pose has ~zero NN residuals), so the study uses
    the vessel-tree surface like the real workload."""
    from pointcloudregistration_tpu.data import synthetic
    return synthetic.vessel_phantom(key, n)


def blocked_icp_study(n: int = 100_000):
    from pointcloudregistration_tpu.ops import icp as icp_mod
    key = jax.random.PRNGKey(3)
    src = _phantom(key, n)
    R_gt, t_gt = se3.random_se3(jax.random.fold_in(key, 1), (),
                                max_angle_deg=20.0, max_trans=0.2)
    tgt = se3.transform(src, R_gt, t_gt)
    f = jax.jit(lambda s, t: icp_mod.icp(s, t, 0.3, iters=12,
                                         max_dist_final=0.05))
    R, t, info = f(src, tgt)
    sync(R)
    t0 = time.perf_counter()
    R, t, info = f(src, tgt)
    rre = float(jnp.degrees(jnp.arccos(jnp.clip(
        (jnp.trace(R.T @ R_gt) - 1) / 2, -1, 1))))
    dt = time.perf_counter() - t0
    row = {"n_points": n, "icp_seconds": round(dt, 3),
           "rre_deg": round(rre, 4),
           "fitness": round(float(info["fitness"]), 4)}
    print(json.dumps(row), flush=True)
    return row


def sharded_icp_study(n: int = 65_536, iters: int = 10):
    from pointcloudregistration_tpu.parallel import mesh as mesh_mod
    from pointcloudregistration_tpu.parallel import pipeline
    n_dev = len(jax.devices())
    mesh = mesh_mod.make_mesh(n_pairs=1, n_blocks=n_dev)
    key = jax.random.PRNGKey(4)
    src = _phantom(key, n)
    R_gt, t_gt = se3.random_se3(jax.random.fold_in(key, 1), (),
                                max_angle_deg=15.0, max_trans=0.1)
    tgt = se3.transform(src, R_gt, t_gt)
    t0 = time.perf_counter()
    R, t, info = pipeline.sharded_icp(mesh, src, tgt, 0.3, iters=iters,
                                      max_dist_final=0.05)
    rre = float(jnp.degrees(jnp.arccos(jnp.clip(
        (jnp.trace(R.T @ R_gt) - 1) / 2, -1, 1))))
    dt = time.perf_counter() - t0
    row = {"n_points": n, "devices": n_dev,
           "wall_seconds_incl_compile": round(dt, 2),
           "rre_deg": round(rre, 4),
           "fitness": round(float(info["fitness"]), 4)}
    print(json.dumps(row), flush=True)
    return row


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        # the env var alone is not enough where sitecustomize presets a
        # TPU platform; the config override must land before backend init
        jax.config.update("jax_platforms", "cpu")
    report = {"backend": str(jax.devices()[0])}
    if cpu:
        # fewer annealed iterations on the CPU mesh: this leg is a
        # correctness check of the ring/psum path, not a timing run
        report["sharded_icp_64k"] = sharded_icp_study(iters=4)
    else:
        report["nnd_pallas"] = nnd_study()
        report["blocked_icp_100k"] = blocked_icp_study()
        report["sharded_icp_single_block"] = sharded_icp_study(131_072)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
