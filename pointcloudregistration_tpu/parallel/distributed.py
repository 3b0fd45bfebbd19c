"""Multi-host initialization + data sharding helpers.

The reference has no distributed layer (SURVEY.md §2.8); this is the
framework's multi-host entry: `jax.distributed` per-host init, a global
(hosts x chips) mesh with the pair axis spanning DCN and the point-block
axis staying on ICI, and per-host pair-range assignment for data loading.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from pointcloudregistration_tpu.parallel.mesh import BLOCKS_AXIS, PAIRS_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-host (no-op when
    single-process or already initialized)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_blocks: int = 1) -> Mesh:
    """(pairs, blocks) over ALL devices: pairs spans hosts (DCN), blocks
    stays within a host's chips (ICI) — collectives for the ring/psum ops
    ride ICI only."""
    devs = np.asarray(jax.devices())
    n = len(devs)
    assert n % n_blocks == 0, (n, n_blocks)
    # devices are ordered host-major; reshape keeps blocks intra-host
    return Mesh(devs.reshape(n // n_blocks, n_blocks),
                (PAIRS_AXIS, BLOCKS_AXIS))


def local_pair_range(total_pairs: int) -> tuple[int, int]:
    """Contiguous slice of the global pair set owned by this host — the
    per-host data-loading contract."""
    pid, pc = jax.process_index(), jax.process_count()
    per = -(-total_pairs // pc)
    start = pid * per
    return start, min(start + per, total_pairs)
