"""SO(3)/SE(3) parameterizations and maps, fully batched and jit-friendly.

Capability parity with the reference's rotation/transform utilities
(reference: c2p-net/deformationpyramid/model/rigid_body.py:5-119,
ROPNet/src/utils/process.py:68-177, DataPreparation/Augment.py:10-90) —
re-derived here as pure jax.numpy, usable under vmap/jit/grad on TPU.

Conventions:
  * Rotations are 3x3 matrices acting on column vectors; points are row
    vectors so application is ``p @ R.T + t``.
  * All functions broadcast over arbitrary leading batch dimensions.
  * Quaternions are (w, x, y, z), unnormalized inputs accepted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternions
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Accepts unnormalized quaternions (normalizes internally), matching the
    behavior the reference relies on for its regressed 7-dof pose head
    (reference: ROPNet/src/utils/process.py:122-151).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], -2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz unit quaternion (w >= 0).

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the best-conditioned by largest pivot.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate (unnormalized) quaternions, one per pivot choice
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], -2)  # (..., 4, 4)
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)
    q = q[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Euler angles (XYZ intrinsic, radians)
# ---------------------------------------------------------------------------

def euler_to_rotmat(angles: jax.Array) -> jax.Array:
    """(..., 3) (rx, ry, rz) -> (..., 3, 3); R = Rz @ Ry @ Rx.

    Matches the reference's per-axis composition used for augmentation
    (reference: DataPreparation/Augment.py:10-44,
    c2p-net/deformationpyramid/model/rigid_body.py:19-59).
    """
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    Rx = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cx, -sx], -1),
        jnp.stack([zero, sx, cx], -1)], -2)
    Ry = jnp.stack([
        jnp.stack([cy, zero, sy], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sy, zero, cy], -1)], -2)
    Rz = jnp.stack([
        jnp.stack([cz, -sz, zero], -1),
        jnp.stack([sz, cz, zero], -1),
        jnp.stack([zero, zero, one], -1)], -2)
    # chain in fp32: bf16 MXU passes visibly de-orthonormalize 3x3 products
    prec = jax.lax.Precision.HIGHEST
    return jnp.einsum("...ij,...jk,...kl->...il", Rz, Ry, Rx, precision=prec)


def rotmat_to_euler(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) XYZ Euler angles (inverse of euler_to_rotmat)."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    rx = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    ry = jnp.arctan2(-R[..., 2, 0], sy)
    rz = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([rx, ry, rz], -1)


# ---------------------------------------------------------------------------
# axis-angle / so(3) exponential map
# ---------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3), stable near theta=0.

    (reference behavior: c2p-net/deformationpyramid/model/rigid_body.py:113-119)
    """
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(w / theta[..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    R = eye + s * K + (1.0 - c) * (K @ K)
    # near-zero fall back to first-order I + skew(w)
    small = (theta2 < 1e-12)[..., None, None]
    return jnp.where(small, eye + skew(w), R)


def log_so3(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) axis-angle (principal branch).

    Extracted via the unit quaternion (branch-free Shepperd), which stays
    well-conditioned through theta -> pi where the classic trace formula's
    theta/(2 sin theta) factor loses precision.
    """
    q = rotmat_to_quat(R)
    w, xyz = q[..., 0], q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n > 1e-7, theta / (n + _EPS), 2.0)
    return xyz * scale[..., None]


def exp_se3(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., 6) twist (w, v) -> (R, t) with the V-matrix for translation.

    (reference behavior: c2p-net/deformationpyramid/model/rigid_body.py:97-111)
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(w / theta[..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    th = theta[..., None, None]
    R = eye + s * K + (1.0 - c) * (K @ K)
    V = eye + ((1.0 - c) / th) * K + ((th - s) / th) * (K @ K)
    small = (theta2 < 1e-12)[..., None, None]
    R = jnp.where(small, eye + skew(w), R)
    V = jnp.where(small, eye + 0.5 * skew(w), V)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al.)
# ---------------------------------------------------------------------------

def sixd_to_rotmat(x: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt of two column vectors.

    (reference behavior: c2p-net/deformationpyramid/model/rigid_body.py:5-17)
    """
    a1, a2 = x[..., :3], x[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + _EPS)
    a2p = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], -1)


# ---------------------------------------------------------------------------
# application / composition / inversion
# ---------------------------------------------------------------------------

def transform(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply (R, t): (..., N, 3), (..., 3, 3), (..., 3) -> (..., N, 3).

    (reference behavior: ROPNet/src/utils/process.py:90-101 batch_transform)
    """
    # fp32 always: a 3-wide contraction is bandwidth-bound, and bf16 MXU
    # accumulation injects ~1e-3 relative coordinate noise — larger than the
    # correspondence radii the pipelines key on.
    return jnp.einsum("...ij,...nj->...ni", R, points,
                      precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


def compose(R1, t1, R2, t2):
    """T1 ∘ T2: apply T2 first, then T1. Returns (R1@R2, R1@t2 + t1)."""
    prec = jax.lax.Precision.HIGHEST
    R = jnp.einsum("...ij,...jk->...ik", R1, R2, precision=prec)
    return R, jnp.einsum("...ij,...j->...i", R1, t2, precision=prec) + t1


def invert(R, t):
    """(R, t) -> (R^T, -R^T t). (reference: ROPNet/src/utils/process.py:177)"""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t,
                           precision=jax.lax.Precision.HIGHEST)


def to_matrix4(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> (..., 4, 4) homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], -2)


def from_matrix4(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    return T[..., :3, :3], T[..., :3, 3]


# ---------------------------------------------------------------------------
# random sampling (explicit PRNG keys — replaces the reference's global
# np.random seeding, DataPreparation/Augment.py:37-49)
# ---------------------------------------------------------------------------

def random_rotation(key: jax.Array, batch_shape=(), max_angle_deg: float = 90.0,
                    dtype=jnp.float32) -> jax.Array:
    """Random per-axis Euler rotation with each angle in ±max_angle_deg.

    Mirrors the reference's augmentation distribution
    (DataPreparation/Augment.py:37-44: independent uniform per-axis angles).
    """
    lim = jnp.deg2rad(jnp.asarray(max_angle_deg, dtype))
    angles = jax.random.uniform(key, batch_shape + (3,), dtype, -lim, lim)
    return euler_to_rotmat(angles)


def random_uniform_rotation(key: jax.Array, batch_shape=(), dtype=jnp.float32):
    """Haar-uniform random rotation via normalized quaternion."""
    q = jax.random.normal(key, batch_shape + (4,), dtype)
    return quat_to_rotmat(q)


def random_se3(key: jax.Array, batch_shape=(), max_angle_deg: float = 45.0,
               max_trans: float = 0.5, dtype=jnp.float32):
    """Random (R, t) matching the reference's disorientation sampling
    (ROPNet/src/utils/process.py:68-80)."""
    kr, kt = jax.random.split(key)
    R = random_rotation(kr, batch_shape, max_angle_deg, dtype)
    t = jax.random.uniform(key=kt, shape=batch_shape + (3,), dtype=dtype,
                           minval=-max_trans, maxval=max_trans)
    return R, t
