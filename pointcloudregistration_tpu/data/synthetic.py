"""Synthetic vascular-phantom pair factory — pure JAX, PRNG-keyed.

The reference's data pipeline starts from two scanned meshes of a fetal-cow
vascular phantom (TOF-MRI and PC-MRI modalities, DataPreparation/run.py:77-91)
and manufactures aligned/augmented training pairs. Scanned meshes are assets,
not code; this module provides the equivalent *generator*: a branching
vessel-tree point-cloud phantom with modality-style differences (coverage,
noise, smooth non-rigid bias) so every pipeline stage — classical baselines,
descriptor learning, end-to-end registration, non-rigid refinement — can be
trained and benchmarked without external data.

Everything is traceable: a (B,)-keyed vmap manufactures whole batches of
pairs on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import to_unit_cube, jitter


def _smooth_dirs(key: jax.Array, n_coef: int = 4):
    """Random coefficients for a smooth sinusoid curve R -> R^3."""
    ka, kb, kp = jax.random.split(key, 3)
    amp = jax.random.uniform(ka, (n_coef, 3), minval=-1.0, maxval=1.0)
    frq = jax.random.uniform(kb, (n_coef, 1), minval=0.5, maxval=2.5)
    phs = jax.random.uniform(kp, (n_coef, 3), minval=0.0, maxval=2 * jnp.pi)
    return amp, frq, phs


def _curve(t: jax.Array, amp, frq, phs, along: jax.Array):
    """Evaluate smooth curve: mainly along `along`, wiggled by sinusoids."""
    wig = jnp.sum(amp[None] * jnp.sin(frq[None] * t[:, None, None] * 2 * jnp.pi
                                      + phs[None]), axis=1)  # (T, 3)
    return t[:, None] * along[None, :] * 4.0 + wig * 0.35


def _tube_points(key: jax.Array, n: int, amp, frq, phs, along, radius0: float):
    """Sample n surface points of a tube around the curve; returns (pts, t)."""
    kt, kphi, kr = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (n,))
    phi = jax.random.uniform(kphi, (n,), minval=0.0, maxval=2 * jnp.pi)
    c = _curve(t, amp, frq, phs, along)                       # (n, 3)
    # tangent by finite difference; build orthonormal frame
    eps = 1e-3
    c2 = _curve(t + eps, amp, frq, phs, along)
    tan = (c2 - c) / eps
    tan = tan / (jnp.linalg.norm(tan, axis=-1, keepdims=True) + 1e-8)
    up = jnp.array([0.12, 0.87, 0.48])
    n1 = jnp.cross(tan, up[None, :])
    n1 = n1 / (jnp.linalg.norm(n1, axis=-1, keepdims=True) + 1e-8)
    n2 = jnp.cross(tan, n1)
    r = radius0 * (1.0 - 0.55 * t)                            # taper
    pts = c + r[:, None] * (n1 * jnp.cos(phi)[:, None]
                            + n2 * jnp.sin(phi)[:, None])
    return pts, t


def vessel_phantom(key: jax.Array, n_points: int, n_branches: int = 5,
                   radius0: float = 0.35) -> jax.Array:
    """(n_points, 3) branching vessel-tree surface cloud in the unit cube."""
    keys = jax.random.split(key, n_branches + 1)
    per = n_points // n_branches
    rem = n_points - per * (n_branches - 1)
    all_pts = []
    # trunk
    amp, frq, phs = _smooth_dirs(keys[0])
    trunk_dir = jnp.array([1.0, 0.15, -0.1])
    pts0, t0 = _tube_points(keys[1], rem, amp, frq, phs, trunk_dir, radius0)
    all_pts.append(pts0)
    for b in range(1, n_branches):
        kb = jax.random.split(keys[b + 1], 4)
        amp_b, frq_b, phs_b = _smooth_dirs(kb[0])
        # branch attaches somewhere along the trunk and veers off
        attach_t = jax.random.uniform(kb[1], (), minval=0.15, maxval=0.8)
        attach = _curve(attach_t[None], amp, frq, phs, trunk_dir)[0]
        direction = jax.random.normal(kb[2], (3,))
        direction = direction / (jnp.linalg.norm(direction) + 1e-8)
        pts_b, _ = _tube_points(kb[3], per, amp_b, frq_b, phs_b, direction,
                                radius0 * 0.55)
        all_pts.append(pts_b * 0.6 + attach[None, :])
    pts = jnp.concatenate(all_pts, 0)
    scaled, _, _ = to_unit_cube(pts)
    return scaled


def modality_views(key: jax.Array, n_points: int,
                   tof_noise: float = 0.004, pc_noise: float = 0.010,
                   pc_dropout: float = 0.35, deform_amp: float = 0.0,
                   base: jax.Array | None = None):
    """One phantom, two modality-style views (aligned!).

    Returns dict(tof (N,3), pc (N,3), pc_mask (N,), gt identity) — the
    aligned state the reference reaches after its FPFH+RANSAC prealign of
    the TOF/PC meshes (DataPreparation/run.py:92-117). `pc` has coarser
    noise, branch dropout (mask), and an optional smooth deformation field
    (amplitude `deform_amp`) emulating modality disagreement; C2P's
    non-rigid stage exists to absorb exactly this.

    base: optional (n_points, 3) unit-cube cloud to use instead of the
    generated vessel tree — e.g. the real phantom mesh head
    (pipelines.dataprep.phantom_from_obj).
    """
    kshape, kn1, kn2, kd, kdef = jax.random.split(key, 5)
    if base is None:
        base = vessel_phantom(kshape, n_points)
    tof = jitter(kn1, base, sigma=tof_noise, clip=3 * tof_noise)
    pc = jitter(kn2, base, sigma=pc_noise, clip=3 * pc_noise)
    if deform_amp > 0:
        # smooth low-frequency displacement field
        freqs = jax.random.uniform(kdef, (3, 3), minval=1.0, maxval=2.5)
        amps = jax.random.normal(jax.random.fold_in(kdef, 1), (3, 3))
        disp = jnp.stack([
            jnp.sum(amps[i] * jnp.sin(pc * freqs[i] * jnp.pi + 0.7 * i), -1)
            for i in range(3)], -1)
        pc = pc + deform_amp * disp / 3.0
    # branch dropout: drop points in a few random balls (modality coverage)
    centers = jax.random.choice(kd, base, (4,), axis=0)
    d2 = jnp.min(jnp.sum((pc[:, None, :] - centers[None]) ** 2, -1), 1)
    keep = d2 > (pc_dropout * 0.25) ** 2
    return {"tof": tof, "pc": pc, "pc_mask": keep}


@partial(jax.jit, static_argnames=("n_points", "max_angle_deg", "max_trans",
                                   "deform_amp"))
def make_pair(key: jax.Array, n_points: int = 3000,
              max_angle_deg: float = 45.0, max_trans: float = 0.5,
              deform_amp: float = 0.0):
    """One registration problem with ground truth.

    Mirrors the reference's sample contract
    (DataPreparation/RANSAC.py:128-132 pickle keys): returns dict with
    source (disoriented TOF), target (PC), masks, and the GT (R, t) such
    that transform(source, R, t) aligns source to target.
    """
    kv, kt = jax.random.split(key)
    views = modality_views(kv, n_points, deform_amp=deform_amp)
    R, t = se3.random_se3(kt, (), max_angle_deg=max_angle_deg,
                          max_trans=max_trans)
    # source = TOF pushed away by the inverse => GT transform realigns it
    Ri, ti = se3.invert(R, t)
    source = se3.transform(views["tof"], Ri, ti)
    return {
        "source": source,
        "target": views["pc"],
        "source_mask": jnp.ones(source.shape[:-1], bool),
        "target_mask": views["pc_mask"],
        "R_gt": R,
        "t_gt": t,
    }


def make_batch(key: jax.Array, batch: int, n_points: int = 3000, **kw):
    """vmapped batch of independent pairs: dict of (B, ...) arrays."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: make_pair(k, n_points, **kw))(keys)
