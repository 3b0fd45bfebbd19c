"""Iterative closest point as a fixed-iteration lax.scan — one compiled
program instead of the reference's eager Open3D loop.

Parity target: o3d.pipelines.registration.registration_icp point-to-point
with max-correspondence-distance gating (DataPreparation/RANSAC.py:55-63,
dip/preprocess_correspondences.py ICP usage). Correspondence rejection uses
weights (0/1 masks) instead of dynamic-size correspondence sets, so shapes
stay static and the whole solve jits/vmaps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3, procrustes
from pointcloudregistration_tpu.ops import knn as _knn

_SENTINEL = 1e6


def _nn(query, ref, query_mask, ref_mask, block):
    """1-NN dispatch: Pallas kernel on TPU (masks via sentinel displacement),
    blocked jnp elsewhere."""
    if jax.default_backend() == "tpu":
        from pointcloudregistration_tpu.ops import nnd_pallas
        refs = ref if ref_mask is None else jnp.where(
            ref_mask[..., None], ref, _SENTINEL)
        d2, idx = nnd_pallas.nn_search(query, refs)
        if query_mask is not None:
            d2 = jnp.where(query_mask, d2, 0.0)
            idx = jnp.where(query_mask, idx, 0)
        return d2, idx
    return _knn.nn_search(query, ref, query_mask, ref_mask, block)


@partial(jax.jit, static_argnames=("iters", "block", "max_dist_final"))
def icp(src: jax.Array, tgt: jax.Array, max_dist: float,
        iters: int = 30,
        R0: jax.Array | None = None, t0: jax.Array | None = None,
        src_mask: jax.Array | None = None, tgt_mask: jax.Array | None = None,
        block: int = 2048, max_dist_final: float | None = None):
    """Point-to-point ICP.

    src (..., N, 3), tgt (..., M, 3) -> (R, t, info) aligning src to tgt.
    info: dict with fitness (inlier fraction) and inlier_rmse, matching
    Open3D's RegistrationResult fields consumed by the reference
    (DataPreparation/RANSAC.py:120-132: inlier_rmse, correspondence count).

    max_dist_final: when set, the correspondence-rejection threshold anneals
    geometrically from max_dist to max_dist_final across iterations —
    a coarse-to-fine schedule that lands ~4x tighter rotations than a fixed
    threshold at the same iteration count.
    """
    batch = src.shape[:-2]
    if max_dist_final is None:
        max_dist_final = max_dist
    frac = (jnp.arange(iters, dtype=src.dtype)
            / jnp.maximum(iters - 1, 1))
    dist_sched = max_dist * (max_dist_final / max_dist) ** frac
    if R0 is None:
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), batch + (3, 3))
    if t0 is None:
        t0 = jnp.zeros(batch + (3,), src.dtype)
    if src_mask is None:
        src_mask = jnp.ones(src.shape[:-1], bool)

    def step(carry, dist_i):
        R, t = carry
        moved = se3.transform(src, R, t)
        d2, idx = _nn(moved, tgt, src_mask, tgt_mask, block)
        w = ((d2 < dist_i * dist_i) & src_mask).astype(src.dtype)
        nn = jnp.take_along_axis(tgt, idx[..., None], axis=-2)
        # solve on ORIGINAL src so composition errors don't accumulate
        R_new, t_new = procrustes.kabsch(src, nn, w)
        # degenerate guard: if no inliers, keep previous transform
        has = jnp.sum(w, -1, keepdims=True)[..., None] > 3
        R_new = jnp.where(has, R_new, R)
        t_new = jnp.where(has[..., 0], t_new, t)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), dist_sched)
    moved = se3.transform(src, R, t)
    d2, _ = _nn(moved, tgt, src_mask, tgt_mask, block)
    inl = (d2 < max_dist_final * max_dist_final) & src_mask
    n_inl = jnp.sum(inl, -1)
    n_src = jnp.maximum(jnp.sum(src_mask, -1), 1)
    fitness = n_inl / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0), -1)
                    / jnp.maximum(n_inl, 1))
    return R, t, {"fitness": fitness, "inlier_rmse": rmse,
                  "n_correspondences": n_inl}
