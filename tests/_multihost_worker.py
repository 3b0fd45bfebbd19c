"""Worker for the REAL 2-process DCN test (tests/test_multihost.py).

Runs as `python tests/_multihost_worker.py <coordinator> <n_proc> <pid>`:
initializes jax.distributed against the local coordinator, builds the
global (pairs, blocks) mesh over 2x4 virtual CPU devices, drives
`register_batch_multihost` with ONLY this process's pair slice, and checks
this host's rows against a locally-computed unsharded reference.
Prints "MULTIHOST_OK <pid>" on success.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * n_proc

    from pointcloudregistration_tpu.parallel import distributed
    from pointcloudregistration_tpu.pipelines import c2p
    from pointcloudregistration_tpu.data import synthetic

    mesh = distributed.global_mesh(n_blocks=2)
    assert mesh.shape["pairs"] == 2 * n_proc
    assert mesh.shape["blocks"] == 2

    # every process generates the SAME global pair set deterministically,
    # then keeps only its local_pair_range slice (the per-host data
    # contract — a real loader would read only these rows from disk)
    TOTAL = 8
    N = 256
    data = synthetic.make_batch(jax.random.PRNGKey(7), TOTAL, n_points=N,
                                max_angle_deg=30.0, max_trans=0.3)
    lo, hi = distributed.local_pair_range(TOTAL)
    assert (hi - lo) == TOTAL // n_proc

    cfg = c2p.C2PConfig(ransac_hypotheses=512, icp_iters=8, run_ndp=False,
                        fused_fpfh=False)
    key = jax.random.PRNGKey(3)
    out = distributed.register_batch_multihost(
        mesh, key,
        np.asarray(data["source"])[lo:hi], np.asarray(data["target"])[lo:hi],
        np.asarray(data["source_mask"])[lo:hi],
        np.asarray(data["target_mask"])[lo:hi],
        cfg=cfg, total_pairs=TOTAL)

    # this host's rows of the global result
    R_global = out["R"]
    local_rows = {}
    for shard in R_global.addressable_shards:
        start = shard.index[0].start or 0
        local_rows[start] = np.asarray(shard.data)
    got = np.concatenate([local_rows[k] for k in sorted(local_rows)], axis=0)

    # unsharded single-chip reference for the same slice, same per-pair keys
    keys = jax.random.split(key, TOTAL)[lo:hi]
    want = []
    for i in range(hi - lo):
        r = c2p.register_pair(keys[i], data["source"][lo + i],
                              data["target"][lo + i],
                              data["source_mask"][lo + i],
                              data["target_mask"][lo + i], cfg)
        want.append(np.asarray(r["R"]))
    want = np.stack(want)
    err = np.abs(got - want).max()
    assert err < 1e-4, f"process {pid}: sharded R deviates by {err}"
    print(f"MULTIHOST_OK {pid} err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
