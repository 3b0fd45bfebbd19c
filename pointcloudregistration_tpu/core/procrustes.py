"""Weighted Procrustes / Kabsch alignment — closed-form rigid fitting.

Parity targets: the reference's weighted ICP/Kabsch
(ROPNet/src/models/model_utils.py:105-140 `weighted_icp`,
c2p-net/deformationpyramid/model/geometry.py:8-33 `rigid_fit`,
correspondence/lepard/procrustes.py:18-44 `batch_weighted_procrustes`).

TPU-first design choices:
  * 3x3 SVD replaced by an analytic route: eigendecompose H^T H with the
    closed-form symmetric eig (core.eig3), recover U = H V S^{-1}. No LAPACK
    custom call, fully batched on the VPU, differentiable.
  * Determinant sign fix folded in (reflections rejected).
  * Per-point weights supported everywhere; masked (padded) points get
    weight 0, so static-shape pipelines compose cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pointcloudregistration_tpu.core.eig3 import eigh3, det3

_EPS = 1e-9


def cross_covariance(src: jax.Array, tgt: jax.Array,
                     weights: jax.Array | None = None):
    """Weighted cross-covariance H = sum_i w_i (s_i - s̄)(t_i - t̄)^T.

    Returns (H, src_centroid, tgt_centroid, weight_sum). src/tgt (..., N, 3).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), _EPS)
    wn = w / wsum
    sc = jnp.sum(src * wn[..., None], -2)
    tc = jnp.sum(tgt * wn[..., None], -2)
    s0 = src - sc[..., None, :]
    t0 = tgt - tc[..., None, :]
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, s0, t0, precision=lax.Precision.HIGHEST)
    return H, sc, tc, wsum[..., 0]


def svd3(H: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Analytic SVD of (..., 3, 3): H = U diag(S) V^T, S descending.

    Route: eigh of the symmetric H^T H gives V and S^2; U columns recovered
    as H v / s with Gram-Schmidt + cross-product completion for rank-deficient
    H. Avoids LAPACK; exactly what the TPU wants for millions of tiny SVDs.
    """
    HtH = jnp.einsum("...ji,...jk->...ik", H, H, precision=lax.Precision.HIGHEST)
    w, V = eigh3(HtH)                       # ascending
    # descending order
    w = w[..., ::-1]
    V = V[..., ::-1]
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    # re-orthonormalize V: the closed-form eigenvectors of a near-degenerate
    # HtH (repeated eigenvalues — tiny/collinear inlier sets) can skew by
    # 1e-3, and R = V U^T inherits exactly that orthogonality error. A
    # Gram-Schmidt polish is exact for the well-conditioned case and pins
    # |R R^T - I| back to f32 roundoff for the degenerate one.
    v0 = V[..., :, 0]
    n0v = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    f0 = jnp.zeros_like(v0).at[..., 0].set(1.0)
    v0 = jnp.where(n0v > 1e-8, v0 / jnp.maximum(n0v, _EPS), f0)
    v1 = V[..., :, 1]
    v1 = v1 - jnp.sum(v1 * v0, -1, keepdims=True) * v0
    n1v = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    valt = jnp.cross(v0, f0)
    valtn = jnp.linalg.norm(valt, axis=-1, keepdims=True)
    f1 = jnp.zeros_like(v0).at[..., 1].set(1.0)
    valt = jnp.where(valtn > 1e-6, valt / jnp.maximum(valtn, _EPS),
                     jnp.cross(v0, f1) /
                     jnp.maximum(jnp.linalg.norm(jnp.cross(v0, f1), axis=-1,
                                      keepdims=True), _EPS))
    v1 = jnp.where(n1v > 1e-8, v1 / jnp.maximum(n1v, _EPS), valt)
    v2 = jnp.cross(v0, v1)
    sgn = jnp.sign(jnp.sum(v2 * V[..., :, 2], -1, keepdims=True))
    v2 = v2 * jnp.where(sgn == 0, 1.0, sgn)
    V = jnp.stack([v0, v1, v2], -1)
    U_raw = jnp.einsum("...ij,...jk->...ik", H, V, precision=lax.Precision.HIGHEST)   # columns = s_k u_k
    # normalize columns, with orthonormal completion for tiny singular values
    u0 = U_raw[..., :, 0]
    n0 = jnp.linalg.norm(u0, axis=-1, keepdims=True)
    e0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where(n0 > 1e-8, u0 / jnp.maximum(n0, _EPS), e0)
    u1 = U_raw[..., :, 1]
    u1 = u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    # fallback: any vector orthogonal to u0
    alt = jnp.cross(u0, e0)
    altn = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    e1 = jnp.zeros_like(u0).at[..., 1].set(1.0)
    alt = jnp.where(altn > 1e-6, alt / jnp.maximum(altn, _EPS),
                    jnp.cross(u0, e1) /
                    jnp.maximum(jnp.linalg.norm(jnp.cross(u0, e1), axis=-1, keepdims=True), _EPS))
    u1 = jnp.where(n1 > 1e-8, u1 / jnp.maximum(n1, _EPS), alt)
    u2 = jnp.cross(u0, u1)
    # align u2 with H v2 (cross product gives the wrong sign when det(H)<0);
    # when s2 ~ 0 the sign is irrelevant for reconstruction
    sign2 = jnp.sign(jnp.sum(u2 * U_raw[..., :, 2], -1, keepdims=True))
    u2 = u2 * jnp.where(sign2 == 0, 1.0, sign2)
    U = jnp.stack([u0, u1, u2], -1)
    return U, S, V


@jax.custom_vjp
def _grad_guard(x):
    """Identity whose backward zeroes non-finite cotangent entries.

    Training-time Procrustes layers differentiate through the 3x3 SVD,
    whose VJP blows up on (near-)degenerate covariances — exactly the
    failure the reference catches with a try/except identity fallback
    during early Lepard training (correspondence/lepard/procrustes.py:
    79-84). Wrapping the covariance keeps the forward exact and drops only
    the unstable gradient contribution, jit-compatibly.
    """
    return x


def _grad_guard_fwd(x):
    return x, None


def _grad_guard_bwd(_, g):
    return (jnp.where(jnp.isfinite(g), g, 0.0),)


_grad_guard.defvjp(_grad_guard_fwd, _grad_guard_bwd)


def kabsch(src: jax.Array, tgt: jax.Array,
           weights: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Weighted rigid fit: R, t minimizing sum w_i |R s_i + t - t_i|^2.

    det(R) = +1 enforced by flipping the smallest singular direction
    (reference det-fix: ROPNet/src/models/model_utils.py:128-133).
    """
    H, sc, tc, _ = cross_covariance(src, tgt, weights)
    H = _grad_guard(H)
    U, _, V = svd3(H)
    # R = V U^T with reflection fix on the last column of V
    det = det3(jnp.einsum("...ik,...jk->...ij", V, U, precision=lax.Precision.HIGHEST))
    Vfix = V.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    R = jnp.einsum("...ik,...jk->...ij", Vfix, U, precision=lax.Precision.HIGHEST)
    t = tc - jnp.einsum("...ij,...j->...i", R, sc, precision=lax.Precision.HIGHEST)
    return R, t


def triad_fit(src: jax.Array, tgt: jax.Array):
    """Rigid fit for 3-point correspondence sets via orthonormal triads.

    src/tgt (..., 3, 3) (three points each). Builds a Gram-Schmidt frame on
    each triangle and returns (R, t, ok): R = B A^T maps src onto tgt —
    EXACT when the triplet is an exact rigid correspondence (the RANSAC
    hypothesis assumption), and a good approximation under noise. `ok` is
    False for degenerate (collinear/coincident) triplets. ~20 VPU ops per
    fit vs a full 3x3 SVD — this is what makes scoring 32k hypotheses per
    pair cheap (the final refine still uses exact weighted `kabsch`).
    """
    def frame(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e2 = p[..., 2, :] - p[..., 0, :]
        n1 = jnp.linalg.norm(e1, axis=-1, keepdims=True)
        a1 = e1 / (n1 + _EPS)
        e2p = e2 - jnp.sum(e2 * a1, -1, keepdims=True) * a1
        n2 = jnp.linalg.norm(e2p, axis=-1, keepdims=True)
        a2 = e2p / (n2 + _EPS)
        a3 = jnp.cross(a1, a2)
        ok = (n1[..., 0] > 1e-8) & (n2[..., 0] > 1e-8)
        return jnp.stack([a1, a2, a3], -1), ok          # columns = basis

    A, ok_a = frame(src)
    B, ok_b = frame(tgt)
    R = jnp.einsum("...ik,...jk->...ij", B, A,
                   precision=lax.Precision.HIGHEST)
    sc = jnp.mean(src, -2)
    tc = jnp.mean(tgt, -2)
    t = tc - jnp.einsum("...ij,...j->...i", R, sc,
                        precision=lax.Precision.HIGHEST)
    return R, t, ok_a & ok_b


def kabsch_from_covariance(H: jax.Array, sc: jax.Array, tc: jax.Array):
    """Rigid fit from a precomputed cross-covariance + centroids.

    This is the reduction-friendly form: H, sc, tc are linear in per-point
    terms, so a sharded pipeline psum's 9+3+3+1 numbers per pair across the
    point-block mesh axis and runs this tiny solve replicated (SURVEY §2.8).
    """
    U, _, V = svd3(H)
    det = det3(jnp.einsum("...ik,...jk->...ij", V, U, precision=lax.Precision.HIGHEST))
    Vfix = V.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    R = jnp.einsum("...ik,...jk->...ij", Vfix, U, precision=lax.Precision.HIGHEST)
    t = tc - jnp.einsum("...ij,...j->...i", R, sc, precision=lax.Precision.HIGHEST)
    return R, t


def soft_procrustes(conf: jax.Array, src: jax.Array, tgt: jax.Array,
                    top_k: int | None = None):
    """Confidence-matrix weighted Procrustes (Lepard-style).

    conf (..., N, M) soft correspondence weights; fits R, t aligning src to
    the conf-barycentric targets, weighting each src row by its total mass.
    (reference: correspondence/lepard/procrustes.py:18-92; top-entry gating
    approximated by row-mass weighting, which is jit-stable.)
    """
    row_mass = jnp.sum(conf, -1)                            # (..., N)
    denom = jnp.maximum(row_mass[..., None], _EPS)
    virtual_tgt = jnp.einsum("...nm,...mc->...nc", conf, tgt, precision=lax.Precision.HIGHEST) / denom
    if top_k is not None:
        # keep only the top_k most confident rows (static k)
        thresh = -jnp.sort(-row_mass, axis=-1)[..., top_k - 1:top_k]
        row_mass = jnp.where(row_mass >= thresh, row_mass, 0.0)
    return kabsch(src, virtual_tgt, row_mass)
