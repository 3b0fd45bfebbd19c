"""Batched point-cloud geometry primitives (pure jax.numpy).

Parity targets: square distance matrices (ROPNet/src/utils/process.py:14-30,
c2p-net/ngenet/utils/process.py), PPF angle features
(ROPNet/src/utils/process.py:230-251, information_interactive.py:48-84),
covariance normal estimation (Open3D estimate_normals usage throughout the
reference), unit-cube scaling (DataPreparation/run.py:45-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.eig3 import eigh3, smallest_eigvec3

_EPS = 1e-8


def square_dists(a: jax.Array, b: jax.Array,
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Pairwise squared distances: (..., N, 3) x (..., M, 3) -> (..., N, M).

    Uses the |a|^2 - 2ab + |b|^2 expansion so the cross term rides the MXU,
    clamped at zero (the reference clamps at 1e-7 to dodge sqrt-NaNs;
    ROPNet/src/utils/process.py:14-30).

    precision: HIGHEST (6-pass f32 emulation) by default. A single bf16
    MXU pass (DEFAULT) injects ~1e-2 absolute error on unit clouds — large
    enough to flip NN decisions (measured: RANSAC fitness 0.11 -> 0.085) —
    but HIGH (3-pass, ~2e-6 relative) is safe for *ordering-only* consumers
    like approximate-neighborhood features and descriptor matching, at half
    the MXU passes.
    """
    a2 = jnp.sum(a * a, -1, keepdims=True)          # (..., N, 1)
    b2 = jnp.sum(b * b, -1, keepdims=True)          # (..., M, 1)
    cross = jnp.einsum("...nc,...mc->...nm", a, b, precision=precision)
    d = a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def angle(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Numerically-stable angle between vectors via atan2(|v1 x v2|, v1.v2).

    (reference: ROPNet/src/utils/process.py:230-251)
    """
    cross = jnp.cross(v1, v2)
    return jnp.arctan2(jnp.linalg.norm(cross, axis=-1),
                       jnp.sum(v1 * v2, axis=-1))


def ppf_features(centers: jax.Array, center_normals: jax.Array,
                 neighbors: jax.Array, neighbor_normals: jax.Array) -> jax.Array:
    """Point-pair features: 4-d (angle(n1,d), angle(n2,d), angle(n1,n2), |d|).

    centers (..., N, 3), neighbors (..., N, K, 3) -> (..., N, K, 4).
    (reference: ROPNet/src/models/TFMR.py:17-38 `get_ppf`,
    c2p-net/ngenet/models/information_interactive.py:48-84)
    """
    d = neighbors - centers[..., :, None, :]
    n1 = jnp.broadcast_to(center_normals[..., :, None, :], neighbors.shape)
    n2 = neighbor_normals
    a1 = angle(n1, d)
    a2 = angle(n2, d)
    a3 = angle(n1, n2)
    dist = jnp.linalg.norm(d, axis=-1)
    return jnp.stack([a1, a2, a3, dist], -1)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched fancy-index gather: (..., M, C), (..., N[, K]) -> (..., N[, K], C).

    (reference: ROPNet/src/models/model_utils.py:27-41 gather_points,
    c2p-net/ngenet/models/KPConv/blocks.py:10-41 gather)
    """
    C = points.shape[-1]
    batch = points.shape[:-2]
    tail = idx.shape[len(batch):]
    flat = idx.reshape(batch + (-1,))                       # (..., N*K)
    out = jnp.take_along_axis(points, flat[..., None], axis=-2)
    return out.reshape(batch + tail + (C,))


def estimate_normals(points: jax.Array, neighbor_idx: jax.Array,
                     neighbor_mask: jax.Array | None = None,
                     orient_to: jax.Array | None = None) -> jax.Array:
    """Covariance normals from precomputed kNN tables (closed-form 3x3 eig).

    points (..., N, 3), neighbor_idx (..., N, K) int32, optional mask
    (..., N, K) bool -> unit normals (..., N, 3). Replaces Open3D
    estimate_normals (used at DataPreparation/RANSAC.py:12-22,
    c2p-net/ngenet/utils/o3d.py:55, ROPNet/src/data/MRI.py).

    orient_to: optional viewpoint; normals flipped to face it (Open3D's
    orient_normals_towards_camera_location analogue). Defaults to orienting
    away from the cloud centroid, a deterministic stand-in.
    """
    nbrs = gather_points(points, neighbor_idx)              # (..., N, K, 3)
    if neighbor_mask is None:
        neighbor_mask = jnp.ones(neighbor_idx.shape, bool)
    w = neighbor_mask[..., None].astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(w, -2), 1.0)
    mean = jnp.sum(nbrs * w, -2, keepdims=True) / cnt[..., None, :]
    centered = (nbrs - mean) * w
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered) / cnt[..., :1, None]
    normals = smallest_eigvec3(cov)        # only the plane normal is needed
    if orient_to is None:
        centroid = jnp.mean(points, -2, keepdims=True)
        outward = points - centroid
        flip = jnp.sum(normals * outward, -1, keepdims=True) < 0
    else:
        toward = orient_to[..., None, :] - points
        flip = jnp.sum(normals * toward, -1, keepdims=True) < 0
    return jnp.where(flip, -normals, normals)


def to_unit_cube(points: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Scale+center a cloud into the unit cube; returns (scaled, center, scale).

    (reference: DataPreparation/run.py:45-75 to_unit_cube/scale_mesh)
    """
    lo = jnp.min(points, axis=-2, keepdims=True)
    hi = jnp.max(points, axis=-2, keepdims=True)
    center = (lo + hi) / 2.0
    scale = jnp.max(hi - lo, axis=(-2, -1), keepdims=True) + _EPS
    return (points - center) / scale, center[..., 0, :], scale[..., 0, 0]


def jitter(key: jax.Array, points: jax.Array, sigma: float = 0.001,
           clip: float = 0.005) -> jax.Array:
    """Clipped Gaussian jitter (reference: DataPreparation/Augment.py:58-66)."""
    noise = jnp.clip(sigma * jax.random.normal(key, points.shape, points.dtype),
                     -clip, clip)
    return points + noise


def random_crop_halfspace(key: jax.Array, points: jax.Array, keep_ratio: float):
    """Half-space crop keeping `keep_ratio` of points; returns boolean mask.

    The reference removes points beyond the keep_ratio-quantile along a random
    direction (ROPNet/src/utils/process.py:210-227). Static-shape version:
    returns a mask; callers gather-with-pad or reweight.
    """
    direction = jax.random.normal(key, points.shape[:-2] + (3,), points.dtype)
    direction = direction / (jnp.linalg.norm(direction, -1, keepdims=True) + _EPS)
    proj = jnp.einsum("...nc,...c->...n", points, direction)
    thresh = jnp.quantile(proj, keep_ratio, axis=-1, keepdims=True)
    return proj <= thresh


def centroid_weighted(points: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted centroid: (..., N, 3), (..., N) -> (..., 3)."""
    wsum = jnp.maximum(jnp.sum(weights, -1, keepdims=True), _EPS)
    return jnp.sum(points * weights[..., None], -2) / wsum
