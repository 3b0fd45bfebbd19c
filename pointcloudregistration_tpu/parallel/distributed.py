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


def global_from_local(mesh: Mesh, local, axis_name: str = PAIRS_AXIS):
    """Assemble a global pair-sharded jax.Array from this process's
    contiguous local slice (the multi-host input contract).

    Every process passes its own `local_pair_range` slice; the result is a
    global array sharded P(pairs) over the mesh. Works single-process too
    (local == global). Host-major device order in `global_mesh` guarantees
    each process's shards are exactly its contiguous slice.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


def register_batch_multihost(mesh: Mesh, key: jax.Array,
                             source_local, target_local,
                             source_mask_local=None, target_mask_local=None,
                             cfg=None, total_pairs: int | None = None):
    """Data-parallel registration across processes (the DCN pair axis).

    Each process supplies ONLY its `local_pair_range(total_pairs)` slice of
    the pair set; pairs shard over the mesh's `pairs` axis (spanning DCN),
    and the compiled step contains zero cross-pair collectives
    (tests/test_scaling.py), so the only multi-host cost is dispatch.

    `key` must be identical on every process (per-pair keys are derived
    from the global pair index, so results are process-count invariant).
    Returns the global output pytree; read this host's rows via
    `out.addressable_shards` or `local_pair_range`.
    """
    import jax.numpy as jnp
    from pointcloudregistration_tpu.parallel.pipeline import (
        make_register_batch_sharded)
    B_local = source_local.shape[0]
    if total_pairs is None:
        total_pairs = B_local * jax.process_count()
    if source_mask_local is None:
        source_mask_local = np.ones(source_local.shape[:-1], bool)
    if target_mask_local is None:
        target_mask_local = np.ones(target_local.shape[:-1], bool)
    keys = jax.random.split(key, total_pairs)
    key_impl = "threefry2x32"
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        key_impl = str(jax.random.key_impl(keys))
        keys = jax.random.key_data(keys)
    lo, hi = local_pair_range(total_pairs)
    args = tuple(global_from_local(mesh, a) for a in (
        np.asarray(keys)[lo:hi], source_local, target_local,
        source_mask_local, target_mask_local))
    return make_register_batch_sharded(mesh, cfg, key_impl)(*args)
