"""Closed-form eigendecomposition of symmetric 3x3 matrices.

TPU-first replacement for the generic LAPACK `eigh` the reference leans on
(numpy eig in dip/lrf.py:4-78, Open3D covariance normals). A trigonometric
analytic solve vectorizes perfectly over millions of covariance matrices
(normal estimation, LRF extraction) with no custom call, and stays on the VPU.

Eigenvalues are returned ascending; eigenvectors are columns of V.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def det3(A: jax.Array) -> jax.Array:
    """Closed-form determinant of (..., 3, 3) — exact fp32 on the VPU,
    avoiding the LU route of jnp.linalg.det (and its bf16 MXU passes)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def eigvalsh3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending. Analytic (Cardano)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = det3(B)
    r = detB / (2.0 * p ** 3 + _EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], -1)


def _eigvec_for(A: jax.Array, lam: jax.Array, fallback: jax.Array) -> jax.Array:
    """Eigenvector of symmetric A for eigenvalue lam via row cross-products.

    The null space of (A - lam I) is spanned by the cross product of any two
    independent rows; pick the largest-norm candidate for stability. When all
    candidates vanish (repeated eigenvalue), return `fallback` (an arbitrary
    unit vector orthogonalization handles it at the call site).
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c20 = jnp.cross(r2, r0)
    cands = jnp.stack([c01, c12, c20], -2)            # (..., 3, 3)
    norms = jnp.linalg.norm(cands, axis=-1)            # (..., 3)
    best = jnp.argmax(norms, -1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)[..., 0, :]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    degenerate = n[..., 0] < 1e-10
    v = jnp.where(degenerate[..., None], fallback, v / (n + _EPS))
    return v


def smallest_eigvec3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3).

    The normal-estimation fast path: skips the other two eigenvectors and
    the orthonormal-frame assembly of `eigh3` (~2x cheaper for covariance
    normals, where only the plane normal is needed)."""
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    An = A / scale[..., None, None]
    w = eigvalsh3(An)
    ez = jnp.zeros(An.shape[:-2] + (3,), An.dtype).at[..., 2].set(1.0)
    return _eigvec_for(An, w[..., 0], ez)


def eigh3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric (..., 3, 3) -> (eigvals ascending (...,3), eigvecs (...,3,3)).

    Eigenvectors are columns: ``A @ V[..., :, k] = w[k] * V[..., :, k]``.
    Robust to repeated eigenvalues: the middle vector is built by cross
    product of the two extreme vectors, guaranteeing an orthonormal frame.
    """
    # scale-normalize for conditioning
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    An = A / scale[..., None, None]
    w = eigvalsh3(An)
    ex = jnp.zeros(An.shape[:-2] + (3,), An.dtype).at[..., 0].set(1.0)
    ez = jnp.zeros(An.shape[:-2] + (3,), An.dtype).at[..., 2].set(1.0)
    v_hi = _eigvec_for(An, w[..., 2], ex)
    # low eigenvector: orthogonalize fallback against v_hi for degenerate case
    fb_lo = ez - jnp.sum(ez * v_hi, -1, keepdims=True) * v_hi
    fb_lo_n = jnp.linalg.norm(fb_lo, axis=-1, keepdims=True)
    fb_lo = jnp.where(fb_lo_n < 1e-6,
                      ex - jnp.sum(ex * v_hi, -1, keepdims=True) * v_hi,
                      fb_lo)
    fb_lo = fb_lo / (jnp.linalg.norm(fb_lo, axis=-1, keepdims=True) + _EPS)
    v_lo = _eigvec_for(An, w[..., 0], fb_lo)
    # re-orthogonalize v_lo against v_hi (they can drift for near-degenerate)
    v_lo = v_lo - jnp.sum(v_lo * v_hi, -1, keepdims=True) * v_hi
    v_lo = v_lo / (jnp.linalg.norm(v_lo, axis=-1, keepdims=True) + _EPS)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], -1)
    return w * scale[..., None], V
