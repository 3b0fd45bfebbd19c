"""Measure the per-dispatch wall floor of this environment's TPU path.

The axon tunnel serializes dispatch + host readback over an RPC link, so
every `fn(x); float(result)` round costs a fixed latency regardless of
device work. All batch-1 per-pair walls in the evals sit on top of this
floor; this probe measures it directly so PERF.md can separate
tunnel-RTT from device compute.

Three probes, n_rep each, median reported:
  trivial   jitted (8,) f32 add + host readback      -> pure RTT floor
  small     jitted 128x128 matmul + readback         -> RTT + ~nothing
  nop_repeat same trivial fn called twice per round  -> is it per-call?

Usage: python -m examples.tunnel_floor_probe [n_rep]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _median_wall(fn, args, n_rep):
    out = fn(*args)
    _ = float(jnp.sum(out))           # compile + warm
    walls = []
    for _i in range(n_rep):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))       # host readback = true sync
        walls.append(time.perf_counter() - t0)
    w = np.asarray(walls)
    return {"median_ms": round(float(np.median(w)) * 1e3, 3),
            "p10_ms": round(float(np.percentile(w, 10)) * 1e3, 3),
            "p90_ms": round(float(np.percentile(w, 90)) * 1e3, 3)}


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    x8 = jnp.arange(8, dtype=jnp.float32)
    a = jnp.ones((128, 128), jnp.float32)

    trivial = jax.jit(lambda x: x + 1.0)
    small = jax.jit(lambda m: m @ m)

    def two_calls(x):
        return trivial(trivial(x))

    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "n_rep": n_rep,
        "trivial_add_readback": _median_wall(trivial, (x8,), n_rep),
        "matmul128_readback": _median_wall(small, (a,), n_rep),
        "two_dispatches_one_readback": _median_wall(two_calls, (x8,), n_rep),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
