"""Voxel-grid (barycenter) subsampling with static output capacity.

TPU-native replacement for the reference's C++ grid subsampling
(c2p-net/ngenet/cpp_wrappers/cpp_subsampling/grid_subsampling/
grid_subsampling.cpp:5-211): the C++ walks an unordered_map of voxels and
accumulates barycenters — its output size and ordering are data-dependent
(the map's iteration order even leaks into results). Here:

  * cell ids are collision-free linearizations (per-axis grids clamped to
    1024 cells so ids fit int32),
  * occupied cells are found by sort + boundary-flag + cumsum (deterministic,
    ascending-cell-id order — strictly better than the C++'s map order),
  * barycenters come from `jax.ops.segment_sum` into a fixed capacity, so the
    whole op jits with static shapes; a boolean mask marks live rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_GRID_MAX = 1024  # per-axis cells; 2^30 ids fit int32


def voxel_cell_ids(points: jax.Array, voxel: float,
                   origin: jax.Array | None = None) -> jax.Array:
    """(N, 3) -> (N,) int32 collision-free cell ids (row-major x,y,z)."""
    if origin is None:
        origin = jnp.min(points, axis=0)
    cell = jnp.clip(jnp.floor((points - origin) / voxel).astype(jnp.int32),
                    0, _GRID_MAX - 1)
    return (cell[:, 0] + cell[:, 1] * _GRID_MAX
            + cell[:, 2] * _GRID_MAX * _GRID_MAX)


@partial(jax.jit, static_argnames=("capacity",))
def grid_subsample(points: jax.Array, voxel: float, capacity: int,
                   mask: jax.Array | None = None,
                   features: jax.Array | None = None):
    """Barycenter voxel subsampling.

    points (N, 3) -> (sub_points (capacity, 3), sub_mask (capacity,),
    [sub_features (capacity, C)]). Occupied voxels beyond `capacity` are
    dropped (lowest cell ids kept — deterministic). Padded rows hold the
    cloud centroid (a harmless in-bounds location).
    """
    N = points.shape[0]
    if mask is None:
        mask = jnp.ones((N,), bool)
    ids = voxel_cell_ids(points, voxel)
    # masked points go to a sentinel cell sorted last
    ids = jnp.where(mask, ids, jnp.int32(2**31 - 1))
    order = jnp.argsort(ids)
    ids_s = ids[order]
    pts_s = points[order]
    mask_s = mask[order]
    newseg = jnp.concatenate([jnp.ones((1,), bool),
                              ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(newseg) - 1                       # (N,) 0..U-1
    seg = jnp.where(mask_s, seg, capacity)             # masked -> overflow row
    seg = jnp.minimum(seg, capacity)                   # overflow beyond cap
    w = mask_s.astype(points.dtype)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg,
                               num_segments=capacity + 1)[:capacity]
    cnts = jax.ops.segment_sum(w, seg, num_segments=capacity + 1)[:capacity]
    live = cnts > 0
    centroid = jnp.sum(points * mask[:, None], 0) / jnp.maximum(jnp.sum(mask), 1)
    sub = jnp.where(live[:, None], sums / jnp.maximum(cnts[:, None], 1e-9),
                    centroid)
    if features is not None:
        fs = features[order]
        fsum = jax.ops.segment_sum(fs * w[:, None], seg,
                                   num_segments=capacity + 1)[:capacity]
        fsub = jnp.where(live[:, None], fsum / jnp.maximum(cnts[:, None], 1e-9),
                         0.0)
        return sub, live, fsub
    return sub, live


def grid_subsample_batch(points: jax.Array, voxel: float, capacity: int,
                         mask: jax.Array | None = None):
    """vmapped variant: (B, N, 3) -> ((B, capacity, 3), (B, capacity)).

    (reference: grid_subsampling.cpp:109-211 batched with max_p cap)
    """
    if mask is None:
        mask = jnp.ones(points.shape[:-1], bool)
    return jax.vmap(lambda p, m: grid_subsample(p, voxel, capacity, m))(
        points, mask)
