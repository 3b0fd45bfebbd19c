"""Pipeline-level sharded drivers: the user-facing distributed layer.

Two scaling modes (SURVEY.md §2.8 — all new design, the reference is
single-GPU):

  * `register_batch_sharded` — the pair axis is embarrassingly parallel:
    shard the batch over the `pairs` mesh axis (pjit; XLA partitions every
    vmapped op along the batch dimension, DCN-friendly across hosts).
  * `sharded_icp` — one pair too large for a chip: points sharded over the
    `blocks` axis; each iteration runs a ring NN pass (ppermute over ICI)
    and a psum-reduced Kabsch (16 numbers per pair cross the wire), i.e.
    ICP on >100k-point clouds the reference can never touch.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.parallel import ring
from pointcloudregistration_tpu.parallel.mesh import (BLOCKS_AXIS,
                                                      PAIRS_AXIS,
                                                      pair_sharding,
                                                      replicated)


@lru_cache(maxsize=8)
def make_register_batch_sharded(mesh: Mesh, cfg=None,
                                key_impl: str = "threefry2x32"):
    """Build the jitted DP registration step: pairs sharded over `pairs`.

    The step is a `shard_map` over the pair axis, so cross-pair
    communication is impossible *by construction* — each device runs the
    full single-chip pipeline on its local pair shard (XLA's automatic
    partitioner is not trusted here: its top_k/sort handling inserts
    gratuitous all-gathers into the vmapped RANSAC scan). Takes
    (keys (B,2) u32, source, target, source_mask, target_mask).

    Cached on (mesh, cfg, key_impl) so repeated `register_batch_sharded`
    calls reuse one jitted program instead of retracing (regression-tested
    in tests/test_scaling.py).
    """
    from pointcloudregistration_tpu.pipelines import c2p
    if cfg is None:
        cfg = c2p.C2PConfig()

    def body(keys, s, t, sm, tm):
        return jax.vmap(
            lambda k, s1, t1, sm1, tm1: c2p.register_pair(
                jax.random.wrap_key_data(k, impl=key_impl),
                s1, t1, sm1, tm1, cfg))(
            keys, s, t, sm, tm)

    # check_vma off: the single-chip pipeline's scan carries are initialized
    # from constants (unvarying), which the varying-manual-axes checker
    # rejects under shard_map even though the program is correct per-shard.
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(PAIRS_AXIS),) * 5,
        out_specs=P(PAIRS_AXIS), check_vma=False))


def register_batch_sharded(mesh: Mesh, key: jax.Array,
                           source: jax.Array, target: jax.Array,
                           source_mask=None, target_mask=None, cfg=None):
    """Data-parallel C2P registration: pair batch sharded over `pairs`.

    Same contract as pipelines.c2p.register_batch; the batch dimension must
    be divisible by the mesh's pairs axis. Weak scaling is near-linear: no
    cross-pair communication exists anywhere in the pipeline (asserted on
    the compiled HLO in tests/test_scaling.py).
    """
    if source_mask is None:
        source_mask = jnp.ones(source.shape[:-1], bool)
    if target_mask is None:
        target_mask = jnp.ones(target.shape[:-1], bool)
    B = source.shape[0]
    # per-pair keys are split on the host and sharded with the pairs — a
    # replicated key split inside the shard would repeat across devices
    keys = jax.random.split(key, B)
    key_impl = "threefry2x32"
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        key_impl = str(jax.random.key_impl(keys))
        keys = jax.random.key_data(keys)        # raw (B, 2) u32 shards
    psh = pair_sharding(mesh)
    args = jax.device_put((keys, source, target, source_mask, target_mask),
                          (psh,) * 5)
    return make_register_batch_sharded(mesh, cfg, key_impl)(*args)


def _icp_blocked(src_block, tgt_block, src_maskb, tgt_maskb,
                 max_dist: float, iters: int, max_dist_final: float):
    """Body run inside shard_map: blocks axis carries point shards."""
    # threshold annealing from max_dist to max_dist_final (geometric), the
    # same schedule as ops/icp.py
    ratio = (max_dist_final / max_dist) ** (1.0 / max(iters - 1, 1))
    dists = max_dist * ratio ** jnp.arange(iters)

    def step(carry, dist_i):
        R, t = carry
        moved = se3.transform(src_block, R, t)
        d2, nn = ring.ring_nn_points(moved, tgt_block, tgt_maskb)
        w = ((d2 < dist_i * dist_i) & src_maskb).astype(src_block.dtype)
        R_new, t_new = ring.psum_kabsch(src_block, nn, w)
        # guard: degenerate steps (too few matches) keep the previous pose
        n_match = jax.lax.psum(jnp.sum(w), BLOCKS_AXIS)
        ok = n_match > 3
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        moved = se3.transform(src_block, R, t)
        d2, _ = ring.ring_nn_points(moved, tgt_block, tgt_maskb)
        inl = (d2 < dist_i * dist_i) & src_maskb
        rmse = jnp.sqrt(
            jax.lax.psum(jnp.sum(jnp.where(inl, d2, 0.0)), BLOCKS_AXIS)
            / jnp.maximum(jax.lax.psum(jnp.sum(inl), BLOCKS_AXIS), 1))
        fit = (jax.lax.psum(jnp.sum(inl), BLOCKS_AXIS)
               / jnp.maximum(jax.lax.psum(jnp.sum(src_maskb), BLOCKS_AXIS),
                             1))
        return (R, t), (rmse, fit)

    (R, t), (rmses, fits) = jax.lax.scan(step, (jnp.eye(3), jnp.zeros(3)),
                                         dists)
    return R, t, {"inlier_rmse": rmses[-1], "fitness": fits[-1]}


def sharded_icp(mesh: Mesh, src: jax.Array, tgt: jax.Array,
                max_dist: float, iters: int = 20,
                src_mask=None, tgt_mask=None,
                max_dist_final: float | None = None):
    """Distributed ICP of ONE pair with points sharded over `blocks`.

    src (N, 3), tgt (M, 3); N and M must divide by the blocks axis size.
    Returns (R, t, info) replicated on every device. The N x M search never
    materializes anywhere: each device scans rotating target blocks.
    """
    if src_mask is None:
        src_mask = jnp.ones(src.shape[:-1], bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[:-1], bool)
    if max_dist_final is None:
        max_dist_final = max_dist

    body = partial(_icp_blocked, max_dist=max_dist, iters=iters,
                   max_dist_final=max_dist_final)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(BLOCKS_AXIS, None), P(BLOCKS_AXIS, None),
                  P(BLOCKS_AXIS), P(BLOCKS_AXIS)),
        out_specs=(P(), P(), P()))
    return jax.jit(fn)(src, tgt, src_mask, tgt_mask)
