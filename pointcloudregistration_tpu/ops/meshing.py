"""Mesh surface sampling — the on-device stand-in for Open3D's
`sample_points_uniformly` / `sample_points_poisson_disk`
(DataPreparation/run.py:87-117).

Uniform sampling is area-weighted triangle choice + uniform barycentric
coordinates, one fused program (a gather + two matmul-free FMAs per point).
Poisson-disk-style blue-noise resampling is served by farthest-point
sampling over an oversampled uniform set (ops/fps.py) — deterministic and
jittable where Open3D's dart-throwing is neither.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_mesh_surface(key: jax.Array, verts: jax.Array, faces: jax.Array,
                        n_samples: int) -> jax.Array:
    """Uniform-by-area surface samples of a triangle mesh.

    verts (V, 3) float, faces (F, 3) int -> (n_samples, 3).
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    area = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    kf, kb = jax.random.split(key)
    probs = area / (jnp.sum(area) + 1e-12)
    fidx = jax.random.choice(kf, faces.shape[0], (n_samples,), p=probs)
    # uniform barycentric via the sqrt trick
    u12 = jax.random.uniform(kb, (n_samples, 2))
    su = jnp.sqrt(u12[:, 0:1])
    b0 = 1.0 - su
    b1 = su * (1.0 - u12[:, 1:2])
    b2 = su * u12[:, 1:2]
    return b0 * v0[fidx] + b1 * v1[fidx] + b2 * v2[fidx]
