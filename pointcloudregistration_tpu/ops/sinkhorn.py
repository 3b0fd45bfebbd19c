"""Log-domain Sinkhorn optimal transport (with dustbin) + OT warp.

Parity targets: the Lepard matcher's `log_optimal_transport`
(correspondence/lepard/matching.py:6-38 — Sinkhorn with a learned dustbin
row/column) and the geomloss-based Sinkhorn non-rigid baseline
(deformationpyramid/model/registration.py:129-146 dispatch on
deformation_model='Sinkhorn').

All iterations are lax.scan of row/column log-softmin updates — numerically
stable and MXU-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.geometry import square_dists


@partial(jax.jit, static_argnames=("iters",))
def log_optimal_transport(scores: jax.Array, alpha: jax.Array,
                          iters: int = 100,
                          row_mask: jax.Array | None = None,
                          col_mask: jax.Array | None = None):
    """Sinkhorn with dustbin: scores (N, M) -> log-assignment (N+1, M+1).

    alpha: scalar dustbin score (learned in Lepard). Masked rows/cols get
    -inf scores so they route to the dustbin.
    """
    n, m = scores.shape
    if row_mask is not None:
        scores = jnp.where(row_mask[:, None], scores, -1e9)
    if col_mask is not None:
        scores = jnp.where(col_mask[None, :], scores, -1e9)
    # augmented matrix with dustbin row+col
    couplings = jnp.block([
        [scores, jnp.full((n, 1), alpha)],
        [jnp.full((1, m), alpha), jnp.asarray([[alpha]])]])

    ns = jnp.sum(row_mask) if row_mask is not None else jnp.asarray(float(n))
    ms = jnp.sum(col_mask) if col_mask is not None else jnp.asarray(float(m))
    norm = -jnp.log(ns + ms)
    log_mu = jnp.concatenate([jnp.full((n,), norm),
                              jnp.asarray([jnp.log(ms) + norm])])
    log_nu = jnp.concatenate([jnp.full((m,), norm),
                              jnp.asarray([jnp.log(ns) + norm])])

    def step(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(step, (jnp.zeros(n + 1), jnp.zeros(m + 1)),
                             None, length=iters)
    return couplings + u[:, None] + v[None, :] - norm


@partial(jax.jit, static_argnames=("iters",))
def sinkhorn_coupling(x: jax.Array, y: jax.Array, epsilon: float = 0.01,
                      iters: int = 100,
                      x_mask=None, y_mask=None):
    """Entropic OT plan between clouds: (N, 3), (M, 3) -> P (N, M)."""
    C = square_dists(x, y)
    scores = -C / epsilon
    if x_mask is not None:
        scores = jnp.where(x_mask[:, None], scores, -1e9)
    if y_mask is not None:
        scores = jnp.where(y_mask[None, :], scores, -1e9)
    n = (jnp.sum(x_mask) if x_mask is not None
         else jnp.asarray(float(x.shape[0])))
    m = (jnp.sum(y_mask) if y_mask is not None
         else jnp.asarray(float(y.shape[0])))
    log_mu = jnp.where(x_mask, -jnp.log(n), -1e9) if x_mask is not None \
        else jnp.full((x.shape[0],), -jnp.log(n))
    log_nu = jnp.where(y_mask, -jnp.log(m), -1e9) if y_mask is not None \
        else jnp.full((y.shape[0],), -jnp.log(m))

    def step(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(scores + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(scores + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        step, (jnp.zeros(x.shape[0]), jnp.zeros(y.shape[0])), None,
        length=iters)
    return jnp.exp(scores + u[:, None] + v[None, :])


def sinkhorn_warp(x: jax.Array, y: jax.Array, epsilon: float = 0.01,
                  iters: int = 100, x_mask=None, y_mask=None):
    """OT-barycentric displacement: warp x toward its transport targets —
    the Sinkhorn non-rigid baseline (registration.py Sinkhorn branch)."""
    P = sinkhorn_coupling(x, y, epsilon, iters, x_mask, y_mask)
    mass = jnp.sum(P, -1, keepdims=True)
    target = jnp.einsum("nm,mc->nc", P, y,
                        precision=jax.lax.Precision.HIGHEST) \
        / jnp.maximum(mass, 1e-12)
    moved = jnp.where(mass > 1e-9, target, x)
    if x_mask is not None:
        moved = jnp.where(x_mask[:, None], moved, x)
    return moved
