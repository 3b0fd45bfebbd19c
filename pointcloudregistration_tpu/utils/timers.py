"""Wall-clock timers + TPU profiling hooks.

Parity with the reference's tic/toc accumulators
(deformationpyramid/utils/tiktok.py, correspondence/lib/tictok.py:10-65,
ROPNet/src/utils/time.py:4-10 @time_calc) plus the TPU-correct additions:
`device_sync` forces a host readback (on remote-tunnel backends
block_until_ready returns before execution finishes — timing without a
readback measures dispatch only) and `trace` wraps jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from functools import wraps

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force completion of `x`'s computation; returns a scalar readback."""
    leaves = jax.tree.leaves(x)
    if not leaves:
        return 0.0
    acc = 0.0
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            acc += float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1]))
    return acc


class Timers:
    """Accumulating named timers (tiktok.py Timers parity: tic/toc with
    avg/total/count reporting)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._starts = {}

    def tic(self, name: str):
        self._starts[name] = time.perf_counter()

    def toc(self, name: str, sync_on=None):
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        self.tic(name)
        yield
        self.toc(name, sync_on)

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "avg_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        return "\n".join(
            f"{k:24s} total {v['total_s']:8.3f}s  avg {v['avg_ms']:8.2f}ms"
            f"  x{v['count']}" for k, v in self.summary().items())


def time_calc(fn):
    """Decorator printing wall time per call (ROPNet utils/time.py:4-10)."""
    @wraps(fn)
    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        print(f"{fn.__name__}: {time.perf_counter() - t0:.3f}s")
        return out
    return wrapped


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context — xprof-compatible TPU traces
    (SURVEY.md §5 tracing equivalent)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
