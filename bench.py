"""Benchmark: end-to-end registration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: TOF-PC registration pairs/sec/chip through the full
C2P-style pipeline (FPFH + vectorized RANSAC + ICP + NDP non-rigid refine)
at the reference's working size (3000 points/cloud,
c2p-net/ngenet/data/MRI.py:21).

Baseline: MEASURED on this host by examples/bench_reference_classical.py
(2026-08-20, 8 pairs x 3000 pts): 1.789 pairs/s for the reference's
classical flow (FPFH + Open3D-parity adaptive RANSAC, vectorized numpy
batches + ICP; stage split fpfh 0.11 / ransac 0.37 / icp 0.07 s/pair,
mean RRE 3.6 deg on the same synthetic workload). That measurement covers
only the CLASSICAL stages — the reference's full C2P additionally runs
~360 eager CUDA rounds of NDP per pair (SURVEY.md §3.5), which this
pipeline includes — so vs_baseline here is conservative.
(vs_baseline = ours / reference).
"""

import json
import time

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.pipelines import c2p

# measured: examples/bench_reference_classical.py on the bench host
# (see module docstring); NOT an estimate
REFERENCE_PAIRS_PER_SEC = 1.789


def main():
    n_points = 3000
    batch = 16     # measured throughput knee on one v5e chip
    cfg = c2p.C2PConfig()

    key = jax.random.PRNGKey(0)
    data = synthetic.make_batch(key, batch, n_points=n_points,
                                max_angle_deg=45.0, max_trans=0.5,
                                deform_amp=0.05)

    step = jax.jit(lambda k, s, t, sm, tm: c2p.register_batch(
        k, s, t, sm, tm, cfg))
    args = (data["source"], data["target"], data["source_mask"],
            data["target_mask"])

    def sync(o):
        # IMPORTANT: on the axon TPU tunnel, block_until_ready returns
        # before remote execution finishes; only a host readback of a
        # data-dependent value truly synchronizes. Never time without one.
        return float(jnp.sum(o["chamfer_nonrigid"])
                     + jnp.sum(o["R"]) + jnp.sum(o["warped"][..., 0, 0]))

    out = step(jax.random.PRNGKey(1), *args)      # compile
    sync(out)

    n_rep = 5
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = step(jax.random.PRNGKey(2 + i), *args)
        sync(out)
    dt = (time.perf_counter() - t0) / n_rep

    pairs_per_sec = batch / dt
    cd = float(jnp.mean(out["chamfer_nonrigid"]))
    print(json.dumps({
        "metric": "c2p_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
        "detail": {
            "n_points": n_points,
            "batch": batch,
            "ms_per_pair": round(dt / batch * 1e3, 2),
            "mean_chamfer_nonrigid": round(cd, 6),
        },
    }))


if __name__ == "__main__":
    main()
