"""Circle loss + weighted BCE (NgeNet losses).

Parity with c2p-net/ngenet/losses/loss.py:7-84: circle loss over
coordinate/feature distance matrices with positive radius gating
(pos_radius 0.0375, margins 0.1/1.4, log_scale 16) and the weighted BCE used
for overlap / saliency supervision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def circle_loss(coords_dist: jax.Array, feats_dist: jax.Array,
                pos_radius: float = 0.0375,
                safe_radius: float = 0.1,
                pos_margin: float = 0.1,
                neg_margin: float = 1.4,
                log_scale: float = 16.0,
                row_mask: jax.Array | None = None,
                col_mask: jax.Array | None = None) -> jax.Array:
    """Circle loss on an (N, M) correspondence candidate matrix.

    coords_dist: GT-aligned euclidean distances (defines pos/neg sets);
    feats_dist: descriptor distances (optimized). Rows/cols with no positive
    are dropped, mirroring loss.py:31-38.
    """
    pos_mask = coords_dist < pos_radius
    neg_mask = coords_dist > safe_radius
    if row_mask is not None:
        pos_mask = pos_mask & row_mask[:, None]
        neg_mask = neg_mask & row_mask[:, None]
    if col_mask is not None:
        pos_mask = pos_mask & col_mask[None, :]
        neg_mask = neg_mask & col_mask[None, :]

    pos = feats_dist - 1e5 * (~pos_mask)             # -inf where not positive
    pos_weight = jax.nn.relu(jax.lax.stop_gradient(pos - pos_margin))
    neg = feats_dist + 1e5 * (~neg_mask)
    neg_weight = jax.nn.relu(jax.lax.stop_gradient(neg_margin - neg))

    lse_pos_row = jax.nn.logsumexp(
        log_scale * (pos - pos_margin) * pos_weight, axis=-1)
    lse_neg_row = jax.nn.logsumexp(
        log_scale * (neg_margin - neg) * neg_weight, axis=-1)
    lse_pos_col = jax.nn.logsumexp(
        log_scale * (pos - pos_margin) * pos_weight, axis=-2)
    lse_neg_col = jax.nn.logsumexp(
        log_scale * (neg_margin - neg) * neg_weight, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale

    has_pos_row = jnp.any(pos_mask, -1)
    has_pos_col = jnp.any(pos_mask, -2)
    row = jnp.sum(jnp.where(has_pos_row, loss_row, 0.0)) \
        / jnp.maximum(jnp.sum(has_pos_row), 1)
    col = jnp.sum(jnp.where(has_pos_col, loss_col, 0.0)) \
        / jnp.maximum(jnp.sum(has_pos_col), 1)
    return (row + col) / 2.0


def weighted_bce(logits: jax.Array, labels: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
    """Class-balanced BCE (loss.py:54-84): weights inversely proportional to
    class frequency so sparse overlap/saliency labels don't drown."""
    labels = labels.astype(logits.dtype)
    if mask is None:
        mask = jnp.ones_like(labels, bool)
    m = mask.astype(logits.dtype)
    n_pos = jnp.maximum(jnp.sum(labels * m), 1.0)
    n_neg = jnp.maximum(jnp.sum((1 - labels) * m), 1.0)
    n = n_pos + n_neg
    w = (labels * (n / (2 * n_pos)) + (1 - labels) * (n / (2 * n_neg))) * m
    ce = optax_sigmoid_bce(logits, labels)
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(m), 1.0)


def optax_sigmoid_bce(logits, labels):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p
