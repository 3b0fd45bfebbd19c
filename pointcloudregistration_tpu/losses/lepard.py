"""Lepard matcher loss + NeCo outlier-rejection loss.

Parity targets:
  * MatchMotionLoss (correspondence/lepard/loss.py:80-190): focal loss on
    the matching confidence matrix against radius-gated ground-truth
    correspondences, an L1 MOTION loss between the soft-Procrustes flow and
    the GT flow (the 4DMatch branch: sflow_gt = R_gt(s + s2t_flow) + t_gt
    - s, loss.py:113-129) gated on match recall > 0.01, both repeated for
    every positioning layer of the repositioning transformer
    (loss.py:156-190), with match recall/precision metrics,
  * a fine-level InfoNCE on the KPFCN decoder features at GT level-0
    correspondences — the supervision that makes the coarse->fine landmark
    refinement (pipelines.lepard.estimate_landmarks) meaningful,
  * NeCoLoss (correspondence/outlier_rejection/loss.py): BCE between the
    per-correspondence inlier confidence and the radius-gated inlier labels.

All losses are static-shape and mask-aware (padded rows contribute zero).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import square_dists


class LepardLossConfig(NamedTuple):
    pos_radius: float = 0.05       # GT match radius (config pos_r analogue)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    w_matching: float = 1.0
    w_motion: float = 1.0          # mot_w (loss.py:57)
    w_fine: float = 0.5
    w_neco: float = 1.0
    recall_gate: float = 0.01      # motion loss gate (loss.py:108)
    fine_max_pairs: int = 256
    fine_temperature: float = 0.1


def matching_labels(src_aligned: jax.Array, tgt: jax.Array, radius: float,
                    src_mask: jax.Array | None = None,
                    tgt_mask: jax.Array | None = None) -> jax.Array:
    """(N, M) bool GT correspondence matrix: |T·src_i − tgt_j| < radius
    (the conf_matrix_gt construction in lepard/loss.py)."""
    d2 = square_dists(src_aligned, tgt)
    lbl = d2 < radius * radius
    if src_mask is not None:
        lbl = lbl & src_mask[:, None]
    if tgt_mask is not None:
        lbl = lbl & tgt_mask[None, :]
    return lbl


def focal_matching_loss(conf: jax.Array, labels: jax.Array,
                        src_mask: jax.Array | None = None,
                        tgt_mask: jax.Array | None = None,
                        alpha: float = 0.25, gamma: float = 2.0):
    """Focal BCE over the confidence matrix (lepard/loss.py compute_
    matching_loss): -α(1-c)^γ log c on positives, -(1-α)c^γ log(1-c) on
    negatives, averaged separately then summed (keeps the positive signal
    from drowning in the N·M negatives).

    Returns (loss, metrics dict with match_recall / match_precision).
    """
    valid = jnp.ones_like(labels)
    if src_mask is not None:
        valid = valid & src_mask[:, None]
    if tgt_mask is not None:
        valid = valid & tgt_mask[None, :]
    c = jnp.clip(conf, 1e-6, 1.0 - 1e-6)
    pos = labels & valid
    neg = (~labels) & valid
    loss_pos = -alpha * (1.0 - c) ** gamma * jnp.log(c)
    loss_neg = -(1.0 - alpha) * c ** gamma * jnp.log(1.0 - c)
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    n_neg = jnp.maximum(jnp.sum(neg), 1)
    loss = (jnp.sum(jnp.where(pos, loss_pos, 0.0)) / n_pos
            + jnp.sum(jnp.where(neg, loss_neg, 0.0)) / n_neg)

    # match recall: rows with a GT match whose argmax lands on a GT match
    best = jnp.argmax(jnp.where(valid, conf, -jnp.inf), -1)     # (N,)
    hit = jnp.take_along_axis(labels, best[:, None], -1)[:, 0]
    has_gt = jnp.any(pos, -1)
    recall = (jnp.sum(hit & has_gt)
              / jnp.maximum(jnp.sum(has_gt), 1)).astype(jnp.float32)
    # precision over thresholded predictions
    pred = (conf > 0.5 / conf.shape[-1]) & valid
    precision = (jnp.sum(pred & labels)
                 / jnp.maximum(jnp.sum(pred), 1)).astype(jnp.float32)
    return loss, {"match_recall": recall, "match_precision": precision}


def motion_loss(R_pred: jax.Array, t_pred: jax.Array, s_pcd: jax.Array,
                R_gt: jax.Array, t_gt: jax.Array,
                flow_gt: jax.Array | None = None,
                overlap_mask: jax.Array | None = None):
    """L1 flow supervision (loss.py:110-129): the predicted rigid fit's
    flow sflow_pred = R_pred s + t_pred - s must match the GT motion
    sflow_gt = R_gt (s + s2t_flow) + t_gt - s, averaged over the overlap
    points (rows with a GT match). flow_gt=None is the 3DMatch branch
    (rigid-only GT, loss.py:122-123)."""
    sflow_pred = se3.transform(s_pcd, R_pred, t_pred) - s_pcd
    deformed = s_pcd if flow_gt is None else s_pcd + flow_gt
    sflow_gt = se3.transform(deformed, R_gt, t_gt) - s_pcd
    e1 = jnp.sum(jnp.abs(sflow_pred - sflow_gt), -1)
    if overlap_mask is None:
        return jnp.mean(e1)
    n = jnp.maximum(jnp.sum(overlap_mask), 1)
    return jnp.sum(jnp.where(overlap_mask, e1, 0.0)) / n


def fine_nce_loss(key: jax.Array, fine_src: jax.Array, fine_tgt: jax.Array,
                  corr_idx: jax.Array, corr_mask: jax.Array,
                  max_pairs: int = 256, temperature: float = 0.1):
    """InfoNCE over fine (level-0 decoder) features at GT correspondences:
    each sampled source feature must retrieve ITS corresponding target
    feature against the other sampled targets. Trains the descriptors the
    coarse->fine landmark refinement searches with. Static shape: up to
    max_pairs correspondences sampled by keyed top-k.

    Returns (loss, {"fine_recall": top-1 retrieval rate})."""
    score = jax.random.uniform(key, corr_mask.shape) + corr_mask
    _, sel = jax.lax.top_k(score, max_pairs)
    valid = jnp.take_along_axis(corr_mask, sel, -1)
    a = fine_src[sel]                             # (P, C)
    b = fine_tgt[corr_idx[sel]]                   # (P, C)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("pc,qc->pq", a, b,
                     precision=jax.lax.Precision.HIGHEST) / temperature
    sim = jnp.where(valid[None, :], sim, -1e9)
    logp = jax.nn.log_softmax(sim, -1)
    diag = jnp.diagonal(logp)
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, diag, 0.0)) / n
    hit = jnp.argmax(sim, -1) == jnp.arange(sim.shape[0])
    recall = jnp.sum(hit & valid) / n
    return loss, {"fine_recall": recall.astype(jnp.float32)}


def neco_loss(inlier_conf: jax.Array, corr_src_aligned: jax.Array,
              corr_tgt: jax.Array, radius: float,
              mask: jax.Array | None = None):
    """BCE of the outlier-rejection confidences against radius-gated inlier
    labels (outlier_rejection NeCoLoss). corr_src_aligned: the GT-warped
    source landmark coordinates; labels = |aligned − tgt| < radius."""
    d2 = jnp.sum((corr_src_aligned - corr_tgt) ** 2, -1)
    y = (d2 < radius * radius).astype(jnp.float32)
    c = jnp.clip(inlier_conf, 1e-6, 1.0 - 1e-6)
    bce = -(y * jnp.log(c) + (1.0 - y) * jnp.log(1.0 - c))
    if mask is not None:
        bce = jnp.where(mask, bce, 0.0)
        n = jnp.maximum(jnp.sum(mask), 1)
        acc = jnp.sum(jnp.where(mask, ((c > 0.5) == (y > 0.5)), False)) / n
        return jnp.sum(bce) / n, {"neco_accuracy": acc.astype(jnp.float32)}
    acc = jnp.mean(((c > 0.5) == (y > 0.5)).astype(jnp.float32))
    return jnp.mean(bce), {"neco_accuracy": acc}
