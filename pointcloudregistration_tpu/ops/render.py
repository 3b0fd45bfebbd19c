"""Differentiable point-cloud splatting + silhouette cost.

Parity with the reference's pytorch3d renderer path
(deformationpyramid/model/point_render.py:36-133 PCDRender:
PerspectiveCameras + PointsRasterizer + AlphaCompositor) and the silhouette
objective (deformationpyramid/model/loss.py:248-305 silhouette_cost).

TPU-first: instead of rasterization with z-buffers, points are splatted as
isotropic Gaussians accumulated with a soft-or compositor — one dense
(N, H*W) weight matrix on the MXU for the typical N<=5k silhouette use, all
exactly differentiable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def project_pinhole(points: jax.Array, fx: float, fy: float,
                    cx: float, cy: float):
    """Camera-frame points (N, 3) -> pixel coords (N, 2) + depth (N,).
    (geometry.py:53-130 projection helpers)"""
    z = jnp.maximum(points[..., 2], 1e-6)
    u = points[..., 0] / z * fx + cx
    v = points[..., 1] / z * fy + cy
    return jnp.stack([u, v], -1), z


@partial(jax.jit, static_argnames=("height", "width"))
def splat_silhouette(points_cam: jax.Array, height: int, width: int,
                     fx: float, fy: float, cx: float, cy: float,
                     sigma_px: float = 1.5,
                     mask: jax.Array | None = None) -> jax.Array:
    """Render a soft silhouette (H, W) in [0, 1] from camera-frame points."""
    uv, z = project_pinhole(points_cam, fx, fy, cx, cy)
    ys = jnp.arange(height, dtype=points_cam.dtype)
    xs = jnp.arange(width, dtype=points_cam.dtype)
    # per-point Gaussian weight to every pixel (separable)
    wx = jnp.exp(-((uv[:, 0:1] - xs[None, :]) ** 2)
                 / (2 * sigma_px ** 2))                  # (N, W)
    wy = jnp.exp(-((uv[:, 1:2] - ys[None, :]) ** 2)
                 / (2 * sigma_px ** 2))                  # (N, H)
    if mask is not None:
        wx = wx * mask[:, None]
    behind = z <= 1e-6
    wx = jnp.where(behind[:, None], 0.0, wx)
    # soft-or compositing through a saturating exponential: the exact
    # 1 - prod(1 - w) is non-separable per pixel; exp(-sum w) matches it to
    # first order and keeps the accumulation a single (N,H)x(N,W) matmul
    acc = jnp.einsum("nh,nw->hw", wy, wx, precision=_PREC)
    return 1.0 - jnp.exp(-acc)


def silhouette_cost(src_cam: jax.Array, tgt_cam: jax.Array,
                    height: int = 120, width: int = 160,
                    fx: float = 100.0, fy: float = 100.0,
                    cx: float = 80.0, cy: float = 60.0,
                    src_mask=None, tgt_mask=None) -> jax.Array:
    """MSE between rendered silhouettes (loss.py:248-305 semantics)."""
    s = splat_silhouette(src_cam, height, width, fx, fy, cx, cy,
                         mask=src_mask)
    t = splat_silhouette(tgt_cam, height, width, fx, fy, cx, cy,
                         mask=tgt_mask)
    return jnp.mean((s - t) ** 2)
