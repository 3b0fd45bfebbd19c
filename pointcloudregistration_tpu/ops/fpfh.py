"""Fast Point Feature Histograms (FPFH) — batched, fixed-K, on-device.

Replaces Open3D's compute_fpfh_feature (DataPreparation/RANSAC.py:12-33:
normals at radius 4*voxel, FPFH at radius 7*voxel) for the classical
FPFH+RANSAC global registration pipeline. Implementation follows Rusu et al.
(ICRA'09): per neighbor pair, the Darboux-frame angle triplet

    u = n_i,  v = (p_j - p_i) x u / |.|,  w = u x v
    alpha = v . n_j
    phi   = u . (p_j - p_i) / |p_j - p_i|
    theta = atan2(w . n_j, u . n_j)

is histogrammed into 11 bins per angle (33-d SPFH); the FPFH is
SPFH_i + mean_j SPFH_j / d_ij (distance-weighted neighbor sum). Everything
is fixed-K neighbor tables + soft one-hot scatter, so it jits and vmaps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.geometry import gather_points
from pointcloudregistration_tpu.ops import knn as _knn

_EPS = 1e-8
N_BINS = 11


def _hist_soft(values: jax.Array, lo: float, hi: float,
               weights: jax.Array) -> jax.Array:
    """Weighted hard-binned histogram over the last axis.

    values (..., K) in [lo, hi] -> (..., N_BINS). One-hot via comparison with
    broadcasted bin ids (TPU-friendly; no scatter).
    """
    x = jnp.clip((values - lo) / (hi - lo), 0.0, 1.0 - 1e-6)
    b = jnp.floor(x * N_BINS)                          # (..., K)
    bins = jnp.arange(N_BINS, dtype=b.dtype)
    onehot = (b[..., None] == bins) * weights[..., None]
    return jnp.sum(onehot, axis=-2)                    # (..., N_BINS)


@partial(jax.jit, static_argnames=("k",))
def spfh(points: jax.Array, normals: jax.Array, radius: float, k: int = 64,
         mask: jax.Array | None = None, neighbors=None):
    """Simplified PFH: (..., N, 3) x2 -> (..., N, 33) histograms.

    `neighbors`: optional precomputed (sqdists, idx) k-NN table (e.g. shared
    with normal estimation) to avoid a second 1-NN/top-k pass.
    """
    d2, idx = _knn.knn(points, points, k, mask, mask) \
        if neighbors is None else neighbors
    pj = gather_points(points, idx)                    # (..., N, K, 3)
    nj = gather_points(normals, idx)
    diff = pj - points[..., :, None, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    # radius gate from the exact recomputed distances; the kNN d2 (whatever
    # its precision) still flags padded neighbors via the 1e10 sentinel the
    # search planted, which is far cheaper than a membership gather
    in_r = (dist <= radius) & (d2 < 1e9)
    if mask is not None:
        in_r = in_r & mask[..., None]
    self_pair = dist < _EPS                            # exclude self
    w = (in_r & ~self_pair).astype(points.dtype)
    dirn = diff / (dist[..., None] + _EPS)
    u = jnp.broadcast_to(normals[..., :, None, :], nj.shape)
    v = jnp.cross(dirn, u)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)
    wv = jnp.cross(u, v)
    alpha = jnp.sum(v * nj, -1)                        # [-1, 1]
    phi = jnp.sum(u * dirn, -1)                        # [-1, 1]
    theta = jnp.arctan2(jnp.sum(wv * nj, -1), jnp.sum(u * nj, -1))  # [-pi,pi]
    h = jnp.concatenate([
        _hist_soft(alpha, -1.0, 1.0, w),
        _hist_soft(phi, -1.0, 1.0, w),
        _hist_soft(theta, -jnp.pi, jnp.pi, w),
    ], -1)                                             # (..., N, 33)
    cnt = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
    return h / cnt, idx, dist, w


@partial(jax.jit, static_argnames=("k",))
def fpfh(points: jax.Array, normals: jax.Array, radius: float, k: int = 64,
         mask: jax.Array | None = None, neighbors=None) -> jax.Array:
    """FPFH descriptors: (..., N, 3) x2 -> (..., N, 33), L2-normalized."""
    h_spfh, idx, dist, w = spfh(points, normals, radius, k, mask, neighbors)
    hj = gather_points(h_spfh, idx)                    # (..., N, K, 33)
    wd = w / (dist + _EPS)
    wd = jnp.where(w > 0, wd, 0.0)
    cnt = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
    neigh = jnp.sum(hj * wd[..., None], -2) / cnt
    f = h_spfh + neigh
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + _EPS)
