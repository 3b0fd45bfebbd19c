"""Augmentation ops — PRNG-keyed JAX replacements for the reference's
numpy augmentation (DataPreparation/Augment.py:10-90: per-axis random
rotation ±90°, translation ±1.5, clipped jitter; ROPNet/src/data/MRI.py:51-78
compose: stored-GT alignment + random SE(3) disorientation + subsampling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import jitter, random_crop_halfspace


def random_rotate(key, points, max_angle_deg: float = 90.0):
    """(reference: Augment.generate_random_rotation_matrix + transform)"""
    R = se3.random_rotation(key, points.shape[:-2], max_angle_deg,
                            points.dtype)
    return se3.transform(points, R, jnp.zeros(points.shape[:-2] + (3,),
                                              points.dtype)), R


def random_translate(key, points, max_trans: float = 1.5):
    """(reference: Augment.generate_random_tranlation_vector)"""
    t = jax.random.uniform(key, points.shape[:-2] + (3,), points.dtype,
                           -max_trans, max_trans)
    return points + t[..., None, :], t


def jitter_points(key, points, sigma: float = 0.001, clip: float = 0.005):
    """(reference: Augment.jitter_point_cloud)"""
    return jitter(key, points, sigma, clip)


@partial(jax.jit, static_argnames=("npts",))
def subsample_fixed(key, points, npts: int, mask=None):
    """Uniformly choose npts point indices (without replacement when
    possible) — the reference's npts=2048 sampling (data/MRI.py:69-72)."""
    N = points.shape[-2]
    if mask is None:
        scores = jax.random.uniform(key, points.shape[:-1])
    else:
        scores = jax.random.uniform(key, points.shape[:-1]) + mask * 10.0
    _, idx = jax.lax.top_k(scores, npts)
    sub = jnp.take_along_axis(points, idx[..., None], axis=-2)
    submask = (jnp.take_along_axis(mask, idx, axis=-1) if mask is not None
               else jnp.ones(sub.shape[:-1], bool))
    return sub, submask, idx


def disorient(key, points, max_angle_deg: float = 45.0,
              max_trans: float = 0.5):
    """Random SE(3) disorientation; returns (moved, R_gt, t_gt) where the GT
    realigns moved to the input (reference: process.py:68-80 +
    data/MRI.py:58-61)."""
    R, t = se3.random_se3(key, points.shape[:-2], max_angle_deg, max_trans)
    Ri, ti = se3.invert(R, t)
    return se3.transform(points, Ri, ti), R, t


def crop_halfspace(key, points, keep_ratio: float = 0.7):
    """Boolean half-space crop mask
    (reference: process.py:210-227 random_crop)."""
    return random_crop_halfspace(key, points, keep_ratio)
