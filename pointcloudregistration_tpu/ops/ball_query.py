"""Ball query and sample-and-group with static shapes.

Parity with the reference's dense-distance ball query + grouping
(ROPNet/src/models/model_utils.py:44-102 ball_query/sample_and_group): K
neighbors within radius around each center, short rows filled with the
first-found neighbor (the reference's fill convention), all fixed-shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.geometry import square_dists, gather_points

_BIG = 1e10


@partial(jax.jit, static_argnames=("k",))
def ball_query(centers: jax.Array, points: jax.Array, radius: float, k: int,
               points_mask: jax.Array | None = None):
    """(..., S, 3), (..., N, 3) -> (idx (..., S, k) int32, valid (..., S, k)).

    Selects up to k points within `radius` of each center (nearest-first,
    unlike the reference's arbitrary-order pick — strictly better and
    deterministic). Rows with fewer than k in-radius points repeat the
    nearest in-radius point; `valid` marks real members. Centers with zero
    in-radius points fall back to the nearest point overall (valid all-False).
    """
    d = square_dists(centers, points)                    # (..., S, N)
    if points_mask is not None:
        d = jnp.where(points_mask[..., None, :], d, _BIG)
    in_ball = d <= radius * radius
    d_gated = jnp.where(in_ball, d, _BIG)
    negd, idx = jax.lax.top_k(-d_gated, k)               # nearest-first
    valid = (-negd) < _BIG / 2
    # fill short rows with the first (nearest) entry; rows with no member at
    # all use the globally nearest point so downstream gathers stay in-range
    nearest_any = jnp.argmin(d, -1).astype(jnp.int32)    # (..., S)
    first = jnp.where(valid[..., :1], idx[..., :1].astype(jnp.int32),
                      nearest_any[..., None])
    idx = jnp.where(valid, idx, first)
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k", "use_xyz"))
def sample_and_group(centers: jax.Array, points: jax.Array, radius: float,
                     k: int, features: jax.Array | None = None,
                     points_mask=None, use_xyz: bool = True):
    """Group neighborhoods around centers.

    Returns (grouped_xyz_rel (..., S, k, 3), grouped_feats, idx, valid) where
    grouped_xyz_rel is neighbor positions relative to the center
    (reference: ROPNet/src/models/model_utils.py:70-102).
    """
    idx, valid = ball_query(centers, points, radius, k, points_mask)
    grouped = gather_points(points, idx)                 # (..., S, k, 3)
    rel = grouped - centers[..., :, None, :]
    feats = None
    if features is not None:
        feats = gather_points(features, idx)             # (..., S, k, C)
        if use_xyz:
            feats = jnp.concatenate([rel, feats], -1)
    elif use_xyz:
        feats = rel
    return rel, feats, idx, valid
