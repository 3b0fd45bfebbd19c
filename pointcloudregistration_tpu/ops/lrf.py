"""Batched Local Reference Frame (LRF) extraction + patch canonicalization.

Capability parity with dip/lrf.py:19-78 (the "Perfect Match" LRF, Gojcic
CVPR'19), which the reference evaluates in a per-point Python loop over an
Open3D KD-tree — its throughput bottleneck (SURVEY.md §3.2). Here the whole
anchor set is one fused batch: fixed-K in-radius neighbor tables, closed-form
3x3 eig for the z axis (eq. 3-4), the alpha*beta-weighted in-plane x axis
(eq. 5), and patch rotation/normalization — thousands of LRFs per kernel
launch instead of one per Python iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.eig3 import eigh3
from pointcloudregistration_tpu.core.geometry import gather_points
from pointcloudregistration_tpu.ops import knn as _knn

_EPS = 1e-9


@partial(jax.jit, static_argnames=("k", "patch_size"))
def lrf_patches(key: jax.Array, points: jax.Array, anchor_idx: jax.Array,
                radius: float, k: int = 128, patch_size: int = 256,
                points_mask: jax.Array | None = None):
    """Extract canonicalized patches around anchor points.

    points (N, 3), anchor_idx (A,) -> dict with
      patches (A, patch_size, 3): LRF-rotated, radius-normalized neighbors
      frames  (A, 3, 3): lRg columns [xp, yp, zp]
      valid   (A, patch_size): real-neighbor mask (short patches zero-pad,
              matching lrf.py:73-75)

    Neighbors are the k nearest within `radius` (the reference falls back to
    plain kNN when a ball is nearly empty, lrf.py:30-31 — the k-nearest-
    gated-by-radius table subsumes both).
    """
    anchors = points[anchor_idx]                        # (A, 3)
    d2, idx = _knn.knn(anchors, points, k, ref_mask=points_mask)
    in_r = d2 <= radius * radius
    if points_mask is not None:
        in_r = in_r & gather_points(points_mask[:, None], idx)[..., 0]
    nbrs = gather_points(points, idx)                   # (A, k, 3)
    rel = nbrs - anchors[:, None, :]                    # q - p
    # exclude the anchor itself from the covariance (ptnn = idx[1:])
    not_self = d2 > _EPS
    w = (in_r & not_self).astype(points.dtype)          # (A, k)
    cnt = jnp.maximum(jnp.sum(w, -1), 1.0)
    # eq. 3: covariance of (q - p) around the ANCHOR (not the mean)
    cov = jnp.einsum("ak,aki,akj->aij", w, rel, rel,
                     precision=jax.lax.Precision.HIGHEST) / cnt[:, None, None]
    _, V = eigh3(cov)
    np_hat = V[..., :, 0]                               # smallest eigvec
    # eq. 4 sign disambiguation: zp points away from the neighbor mass
    s = jnp.sum(w * jnp.einsum("ai,aki->ak", np_hat, -rel), -1)
    zp = jnp.where((s > 0)[:, None], np_hat, -np_hat)
    # eq. 5: in-plane direction weighted by alpha (radius falloff) and
    # beta (out-of-plane magnitude)
    proj = jnp.einsum("aki,ai->ak", rel, zp)            # (q-p).zp
    v_inplane = rel - proj[..., None] * zp[:, None, :]
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    alpha = (radius - dist) ** 2
    beta = proj ** 2
    xp_raw = jnp.sum((w * alpha * beta)[..., None] * v_inplane, -2)
    xp_norm = jnp.linalg.norm(xp_raw, axis=-1, keepdims=True)
    # degenerate fallback: any unit vector orthogonal to zp
    e = jnp.zeros_like(zp).at[..., 0].set(1.0)
    alt = jnp.cross(zp, e)
    altn = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    e2 = jnp.zeros_like(zp).at[..., 1].set(1.0)
    alt = jnp.where(altn > 1e-6, alt / (altn + _EPS),
                    jnp.cross(zp, e2)
                    / (jnp.linalg.norm(jnp.cross(zp, e2), axis=-1,
                                       keepdims=True) + _EPS))
    xp = jnp.where(xp_norm > 1e-8, xp_raw / (xp_norm + _EPS), alt)
    yp = jnp.cross(xp, zp)
    lRg = jnp.stack([xp, yp, zp], -1)                   # columns
    # rotate ALL in-radius neighbors (incl. anchor) into the LRF, normalize
    patch_all = jnp.einsum("aji,akj->aki", lRg, rel,
                           precision=jax.lax.Precision.HIGHEST) / radius
    # choose patch_size of the valid entries (random, without replacement —
    # lrf.py:77 np.random.choice); invalid slots zero-padded
    score = jax.random.uniform(key, in_r.shape) + in_r.astype(points.dtype)
    take = min(patch_size, k)
    _, pick = jax.lax.top_k(score, take)
    patch = jnp.take_along_axis(patch_all, pick[..., None], axis=-2)
    valid = jnp.take_along_axis(in_r, pick, axis=-1)
    patch = jnp.where(valid[..., None], patch, 0.0)
    if take < patch_size:          # fewer candidates than patch slots: pad
        pad = patch_size - take
        patch = jnp.pad(patch, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return {"patches": patch, "frames": lRg, "valid": valid,
            "anchors": anchors}
