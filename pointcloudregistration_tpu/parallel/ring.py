"""Ring-pass collectives over point blocks: distributed NN search, Chamfer,
and psum-reduced Procrustes.

This is the point-cloud analogue of ring attention (SURVEY.md §5
"long-context"): each device in the `blocks` mesh axis holds one block of the
target cloud; blocks rotate around the ICI ring via `ppermute` while every
device keeps a running (min, argmin) against its resident queries. The online
min is exact (unlike softmax accumulators), so P ring steps give the same
result as the dense search with N*M/P^2-sized working sets per device —
clouds >100k points the single-GPU reference can never touch.

All functions are written for use inside `shard_map` over a mesh with a
`blocks` axis (and typically a `pairs` axis handled by vmap/batching).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointcloudregistration_tpu.core import procrustes
from pointcloudregistration_tpu.parallel.mesh import BLOCKS_AXIS, PAIRS_AXIS

_BIG = 1e10


def _local_min(query, refb, ref_maskb):
    """Dense (n_local, m_local) min+argmin — one ring step's local work."""
    d = (jnp.sum(query * query, -1, keepdims=True)
         - 2.0 * jnp.einsum("nc,mc->nm", query, refb,
                            precision=jax.lax.Precision.HIGHEST)
         + jnp.sum(refb * refb, -1)[None, :])
    d = jnp.maximum(d, 0.0)
    if ref_maskb is not None:
        d = jnp.where(ref_maskb[None, :], d, _BIG)
    return jnp.min(d, -1), jnp.argmin(d, -1).astype(jnp.int32)


def ring_nn_search(query_block: jax.Array, ref_block: jax.Array,
                   ref_mask_block: jax.Array | None = None,
                   axis_name: str = BLOCKS_AXIS):
    """1-NN of local queries against the FULL distributed reference.

    Called inside shard_map. query_block (n, 3) is this device's resident
    queries; ref_block (m, 3) its resident reference block. Returns
    (sqdist (n,), global_idx (n,)) where global_idx indexes the unsharded
    reference: after k rotations device p holds block (p + k) mod P, so the
    global offset is that block id times the block size.
    """
    P_ = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    m = ref_block.shape[0]
    perm = [(i, (i + 1) % P_) for i in range(P_)]  # send right

    def step(k, carry):
        best_d, best_i, refb, maskb = carry
        block_id = (me + k) % P_
        d, i = _local_min(query_block, refb,
                          maskb if ref_mask_block is not None else None)
        gi = i + block_id * m
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_i = jnp.where(take, gi, best_i)
        # rotate blocks: device p sends its current block to p+1, so after
        # the shift device p holds the block previously at p-1... but we
        # want p to progress to block (p+k+1): receive from p+1 => send left
        refb = jax.lax.ppermute(refb, axis_name,
                                [((i + 1) % P_, i) for i in range(P_)])
        maskb = jax.lax.ppermute(maskb, axis_name,
                                 [((i + 1) % P_, i) for i in range(P_)])
        return best_d, best_i, refb, maskb

    # derive carry inits from the (device-varying) inputs so their manual
    # axes match the loop outputs under shard_map's varying-axis typing
    mask0 = (ref_mask_block if ref_mask_block is not None
             else jnp.isfinite(ref_block[..., 0]))
    init = (jnp.zeros_like(query_block[..., 0]) + _BIG,
            (query_block[..., 0] * 0).astype(jnp.int32),
            ref_block, mask0)
    best_d, best_i, _, _ = jax.lax.fori_loop(0, P_, step, init)
    return best_d, best_i


def ring_nn_points(query_block: jax.Array, ref_block: jax.Array,
                   ref_mask_block: jax.Array | None = None,
                   axis_name: str = BLOCKS_AXIS):
    """Like ring_nn_search but returns the nearest reference COORDINATES
    (n, 3) alongside the squared distances.

    Carrying coordinates through the ring avoids the cross-device gather a
    global index would otherwise require — the consumer (distributed ICP,
    Procrustes) needs the points, not the indices.
    """
    P_ = jax.lax.axis_size(axis_name)
    perm = [((i + 1) % P_, i) for i in range(P_)]       # receive from right

    def step(k, carry):
        best_d, best_p, refb, maskb = carry
        d, i = _local_min(query_block, refb,
                          maskb if ref_mask_block is not None else None)
        nn = refb[i]                                    # (n, 3)
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_p = jnp.where(take[..., None], nn, best_p)
        refb = jax.lax.ppermute(refb, axis_name, perm)
        maskb = jax.lax.ppermute(maskb, axis_name, perm)
        return best_d, best_p, refb, maskb

    mask0 = (ref_mask_block if ref_mask_block is not None
             else jnp.isfinite(ref_block[..., 0]))
    init = (jnp.zeros_like(query_block[..., 0]) + _BIG,
            query_block * 0.0, ref_block, mask0)
    best_d, best_p, _, _ = jax.lax.fori_loop(0, P_, step, init)
    return best_d, best_p


def ring_chamfer(x_block: jax.Array, y_block: jax.Array,
                 x_mask_block=None, y_mask_block=None,
                 axis_name: str = BLOCKS_AXIS, sqrt: bool = False):
    """Symmetric Chamfer of two distributed clouds (scalar, replicated).

    Each device holds a block of x and of y; both directions run their ring
    pass, per-device partial sums are psum'd.
    """
    d1, _ = ring_nn_search(x_block, y_block, y_mask_block, axis_name)
    d2, _ = ring_nn_search(y_block, x_block, x_mask_block, axis_name)
    if x_mask_block is not None:
        d1 = jnp.where(x_mask_block, d1, 0.0)
        n1 = jax.lax.psum(jnp.sum(x_mask_block), axis_name)
    else:
        n1 = jax.lax.psum(d1.shape[0] * jnp.ones((), d1.dtype), axis_name)
    if y_mask_block is not None:
        d2 = jnp.where(y_mask_block, d2, 0.0)
        n2 = jax.lax.psum(jnp.sum(y_mask_block), axis_name)
    else:
        n2 = jax.lax.psum(d2.shape[0] * jnp.ones((), d2.dtype), axis_name)
    if sqrt:
        d1 = jnp.sqrt(jnp.maximum(d1, 0.0))
        d2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    s1 = jax.lax.psum(jnp.sum(d1), axis_name)
    s2 = jax.lax.psum(jnp.sum(d2), axis_name)
    return s1 / jnp.maximum(n1, 1) + s2 / jnp.maximum(n2, 1)


def psum_kabsch(src_block: jax.Array, tgt_block: jax.Array,
                weight_block: jax.Array | None = None,
                axis_name: str = BLOCKS_AXIS):
    """Weighted Kabsch where points are sharded over the blocks axis.

    Per-point moments (sum w, sum w*s, sum w*t, sum w*s t^T) are linear, so
    16 numbers per pair are psum'd over ICI and the tiny 3x3 solve runs
    replicated — the Schur-style reduction of SURVEY.md §2.8.
    """
    if weight_block is None:
        weight_block = jnp.ones(src_block.shape[:-1], src_block.dtype)
    w = jnp.maximum(weight_block, 0.0)
    wsum = jax.lax.psum(jnp.sum(w, -1), axis_name)
    wsum = jnp.maximum(wsum, 1e-9)
    sc = jax.lax.psum(jnp.sum(src_block * w[..., None], -2), axis_name) / wsum
    tc = jax.lax.psum(jnp.sum(tgt_block * w[..., None], -2), axis_name) / wsum
    s0 = src_block - sc
    t0 = tgt_block - tc
    H = jax.lax.psum(
        jnp.einsum("...n,...ni,...nj->...ij", w, s0, t0,
                   precision=jax.lax.Precision.HIGHEST), axis_name) / wsum
    return procrustes.kabsch_from_covariance(H, sc, tc)


def make_sharded_chamfer(mesh, n_points_x: int, n_points_y: int):
    """Convenience: jitted (B, N, 3) x (B, M, 3) -> (B,) chamfer with points
    sharded over the blocks axis and pairs over the pairs axis."""
    @partial(shard_map, mesh=mesh,
             in_specs=(P(PAIRS_AXIS, BLOCKS_AXIS, None),
                       P(PAIRS_AXIS, BLOCKS_AXIS, None)),
             out_specs=P(PAIRS_AXIS))
    def _sharded(xb, yb):
        f = jax.vmap(lambda x, y: ring_chamfer(x, y, axis_name=BLOCKS_AXIS))
        return f(xb, yb)
    return jax.jit(_sharded)
