"""Coherent Point Drift (rigid / affine / nonrigid) as fixed-iteration EM.

Replaces probreg's cupy-backed CPD (DataPreparation/CPD.py:26-73: Rigid,
Affine and NonRigid variants on GPU). The E-step responsibilities and every
M-step moment are dense matmuls — exactly the shape of compute the MXU wants —
so each variant is a lax.scan of fused EM steps, O(N*M) per iteration with no
data-dependent shapes. Follows Myronenko & Song (TPAMI'10) notation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pointcloudregistration_tpu.core import procrustes
from pointcloudregistration_tpu.core.eig3 import det3
from pointcloudregistration_tpu.core.geometry import square_dists

_EPS = 1e-9
_PREC = lax.Precision.HIGHEST


def _init_sigma2(x: jax.Array, y: jax.Array) -> jax.Array:
    n, m = x.shape[-2], y.shape[-2]
    return jnp.sum(square_dists(y, x)) / (3.0 * n * m)


def _estep(x: jax.Array, ty: jax.Array, sigma2: jax.Array, w: float):
    """Responsibilities P (M, N) for targets x given transformed sources ty."""
    n, m = x.shape[-2], ty.shape[-2]
    d2 = square_dists(ty, x)                            # (M, N)
    g = jnp.exp(-d2 / (2.0 * sigma2))
    c = ((2.0 * jnp.pi * sigma2) ** 1.5) * (w / max(1.0 - w, _EPS)) * (m / n)
    denom = jnp.sum(g, axis=-2, keepdims=True) + c      # (1, N)
    return g / jnp.maximum(denom, _EPS)


@partial(jax.jit, static_argnames=("iters",))
def cpd_rigid(x: jax.Array, y: jax.Array, w: float = 0.0, iters: int = 50):
    """Rigid CPD: returns (s, R, t, sigma2) with x ~ s R y + t.

    x: target (N, 3), y: source (M, 3).
    """
    sigma2_0 = _init_sigma2(x, y)

    def step(carry, _):
        s, R, t, sigma2 = carry
        ty = s * jnp.einsum("ij,mj->mi", R, y, precision=_PREC) + t
        P = _estep(x, ty, sigma2, w)                    # (M, N)
        Np = jnp.maximum(jnp.sum(P), _EPS)
        p1 = jnp.sum(P, -1)                             # (M,)
        pt1 = jnp.sum(P, -2)                            # (N,)
        mu_x = jnp.einsum("n,ni->i", pt1, x, precision=_PREC) / Np
        mu_y = jnp.einsum("m,mi->i", p1, y, precision=_PREC) / Np
        xc = x - mu_x
        yc = y - mu_y
        A = jnp.einsum("mn,ni,mj->ij", P, xc, yc, precision=_PREC)  # (3, 3)
        U, S, V = procrustes.svd3(A)
        detc = jnp.sign(det3(jnp.einsum("ik,jk->ij", U, V, precision=_PREC)))
        C = jnp.array([1.0, 1.0, 1.0]).at[2].set(detc)
        R_new = jnp.einsum("ik,k,jk->ij", U, C, V, precision=_PREC)
        den = jnp.einsum("m,mi,mi->", p1, yc, yc, precision=_PREC)
        s_new = jnp.sum(S * C) / jnp.maximum(den, _EPS)
        t_new = mu_x - s_new * jnp.einsum("ij,j->i", R_new, mu_y,
                                          precision=_PREC)
        xx = jnp.einsum("n,ni,ni->", pt1, xc, xc, precision=_PREC)
        sigma2_new = jnp.maximum(
            (xx - s_new * jnp.sum(S * C)) / (3.0 * Np), 1e-10)
        return (s_new, R_new, t_new, sigma2_new), None

    init = (jnp.asarray(1.0, x.dtype), jnp.eye(3, dtype=x.dtype),
            jnp.zeros(3, x.dtype), sigma2_0)
    (s, R, t, sigma2), _ = lax.scan(step, init, None, length=iters)
    return s, R, t, sigma2


@partial(jax.jit, static_argnames=("iters",))
def cpd_affine(x: jax.Array, y: jax.Array, w: float = 0.0, iters: int = 50):
    """Affine CPD: returns (B, t, sigma2) with x ~ B y + t."""
    sigma2_0 = _init_sigma2(x, y)

    def step(carry, _):
        B, t, sigma2 = carry
        ty = jnp.einsum("ij,mj->mi", B, y, precision=_PREC) + t
        P = _estep(x, ty, sigma2, w)
        Np = jnp.maximum(jnp.sum(P), _EPS)
        p1 = jnp.sum(P, -1)
        pt1 = jnp.sum(P, -2)
        mu_x = jnp.einsum("n,ni->i", pt1, x, precision=_PREC) / Np
        mu_y = jnp.einsum("m,mi->i", p1, y, precision=_PREC) / Np
        xc = x - mu_x
        yc = y - mu_y
        A = jnp.einsum("mn,ni,mj->ij", P, xc, yc, precision=_PREC)
        YPY = jnp.einsum("m,mi,mj->ij", p1, yc, yc, precision=_PREC)
        B_new = jnp.linalg.solve(YPY.T + _EPS * jnp.eye(3), A.T).T
        t_new = mu_x - jnp.einsum("ij,j->i", B_new, mu_y, precision=_PREC)
        xx = jnp.einsum("n,ni,ni->", pt1, xc, xc, precision=_PREC)
        tr_ab = jnp.trace(A @ B_new.T)
        sigma2_new = jnp.maximum((xx - tr_ab) / (3.0 * Np), 1e-10)
        return (B_new, t_new, sigma2_new), None

    init = (jnp.eye(3, dtype=x.dtype), jnp.zeros(3, x.dtype), sigma2_0)
    (B, t, sigma2), _ = lax.scan(step, init, None, length=iters)
    return B, t, sigma2


@partial(jax.jit, static_argnames=("iters",))
def cpd_nonrigid(x: jax.Array, y: jax.Array, w: float = 0.0,
                 beta: float = 2.0, lam: float = 2.0, iters: int = 30):
    """Nonrigid CPD: returns (y_warped, W, sigma2); warp = y + G W.

    G is the (M, M) Gaussian kernel with width beta; each M-step solves the
    (M, M) regularized system (d(P1) G + lam sigma2 I) W = P X - d(P1) Y.
    """
    sigma2_0 = _init_sigma2(x, y)
    G = jnp.exp(-square_dists(y, y) / (2.0 * beta * beta))  # (M, M)
    M = y.shape[-2]

    def step(carry, _):
        Wm, sigma2 = carry
        ty = y + jnp.einsum("mk,ki->mi", G, Wm, precision=_PREC)
        P = _estep(x, ty, sigma2, w)
        Np = jnp.maximum(jnp.sum(P), _EPS)
        p1 = jnp.sum(P, -1)                              # (M,)
        pt1 = jnp.sum(P, -2)
        PX = jnp.einsum("mn,ni->mi", P, x, precision=_PREC)
        A = p1[:, None] * G + lam * sigma2 * jnp.eye(M, dtype=x.dtype)
        rhs = PX - p1[:, None] * y
        W_new = jnp.linalg.solve(A, rhs)
        ty_new = y + jnp.einsum("mk,ki->mi", G, W_new, precision=_PREC)
        xx = jnp.einsum("n,ni,ni->", pt1, x, x, precision=_PREC)
        xty = jnp.einsum("mn,ni,mi->", P, x, ty_new, precision=_PREC)
        yy = jnp.einsum("m,mi,mi->", p1, ty_new, ty_new, precision=_PREC)
        sigma2_new = jnp.maximum((xx - 2 * xty + yy) / (3.0 * Np), 1e-10)
        return (W_new, sigma2_new), None

    init = (jnp.zeros_like(y), sigma2_0)
    (Wm, sigma2), _ = lax.scan(step, init, None, length=iters)
    y_warped = y + jnp.einsum("mk,ki->mi", G, Wm, precision=_PREC)
    return y_warped, Wm, sigma2
