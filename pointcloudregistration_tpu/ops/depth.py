"""Depth-image geometry: back-projection and pixel-grid meshing.

Parity with the reference's cxx image processing
(deformationpyramid/cxx/image_proc.cpp depth_to_mesh: depth map ->
vertex/face mesh with edge-length culling) and the pixel/point projection
helpers (deformationpyramid/model/geometry.py:53-130).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def backproject_depth(depth: jax.Array, fx: float, fy: float,
                      cx: float, cy: float):
    """(H, W) depth -> (H*W, 3) camera-frame points + (H*W,) validity."""
    H, W = depth.shape
    v, u = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                        jnp.arange(W, dtype=depth.dtype), indexing="ij")
    z = depth
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    pts = jnp.stack([x, y, z], -1).reshape(-1, 3)
    valid = (depth > 0).reshape(-1)
    return pts, valid


@partial(jax.jit, static_argnames=("max_edge",))
def depth_to_mesh(depth: jax.Array, fx: float, fy: float,
                  cx: float, cy: float, max_edge: float = 0.05):
    """Depth map -> (vertices (H*W, 3), faces (2*(H-1)*(W-1), 3), face_mask).

    Each pixel quad becomes two triangles; faces with any invalid vertex or
    any edge longer than `max_edge` are masked out (image_proc.cpp
    depth_to_mesh edge-length culling).
    """
    H, W = depth.shape
    verts, valid = backproject_depth(depth, fx, fy, cx, cy)

    idx = jnp.arange(H * W).reshape(H, W)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[:-1, 1:].reshape(-1)
    c = idx[1:, :-1].reshape(-1)
    d = idx[1:, 1:].reshape(-1)
    faces = jnp.concatenate([jnp.stack([a, b, c], -1),
                             jnp.stack([b, d, c], -1)], 0)

    def edge_ok(i, j):
        return (jnp.linalg.norm(verts[i] - verts[j], axis=-1) < max_edge)

    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    mask = (valid[f0] & valid[f1] & valid[f2]
            & edge_ok(f0, f1) & edge_ok(f1, f2) & edge_ok(f0, f2))
    return verts, faces, mask
