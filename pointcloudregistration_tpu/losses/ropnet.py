"""ROPNet losses (parity with ROPNet/src/loss/loss.py:7-76)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.geometry import square_dists


def init_loss(gt_src, pred_src0):
    """MAE on the iter-0 alignment (loss.py:7-28)."""
    return jnp.mean(jnp.abs(pred_src0 - gt_src))


def refine_loss(gt_src, pred_src_list):
    """MAE summed over refinement iterations (loss.py:31-48)."""
    return sum(jnp.mean(jnp.abs(p - gt_src)) for p in pred_src_list)


def overlap_loss(x_ol, y_ol, dists, thresh: float = 0.05):
    """CE on overlap labels from GT distances (loss.py:52-59).

    x_ol/y_ol: (B, N, 2) logits; dists: (B, N, M) squared distances between
    GT-aligned src and tgt.
    """
    x_gt = (jnp.min(dists, -1) < thresh * thresh).astype(jnp.int32)
    y_gt = (jnp.min(dists, -2) < thresh * thresh).astype(jnp.int32)

    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], -1))

    return (ce(x_ol, x_gt) + ce(y_ol, y_gt)) / 2.0


def total_loss(gt_src, pred_src_list, x_ol, y_ol, tgt,
               beta: float = 0.1):
    """init + beta*ol + refine (loss.py:62-76)."""
    d = square_dists(gt_src, tgt)
    li = init_loss(gt_src, pred_src_list[0])
    lo = overlap_loss(x_ol, y_ol, d)
    lr = refine_loss(gt_src, pred_src_list[1:])
    return li + beta * lo + lr, {"init": li, "ol": lo, "refine": lr}
