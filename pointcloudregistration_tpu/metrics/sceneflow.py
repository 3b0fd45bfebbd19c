"""Scene-flow + feature-match metrics.

Parity with deformationpyramid/model/loss.py:342-431 (EPE, AccS, AccR,
outlier ratio) and deformationpyramid/utils/benchmark_utils.py:93-131 (FMR
curves over inlier-ratio thresholds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scene_flow_metrics(pred_flow: jax.Array, gt_flow: jax.Array,
                       mask: jax.Array | None = None):
    """EPE + accuracy/outlier ratios (loss.py:342-431 semantics:
    AccS: EPE<0.05 or rel<5%; AccR: EPE<0.1 or rel<10%; outlier: EPE>0.3
    or rel>10%)."""
    if mask is None:
        mask = jnp.ones(pred_flow.shape[:-1], bool)
    m = mask.astype(pred_flow.dtype)
    cnt = jnp.maximum(jnp.sum(m, -1), 1)
    epe_pp = jnp.linalg.norm(pred_flow - gt_flow, axis=-1)
    gt_norm = jnp.linalg.norm(gt_flow, axis=-1)
    rel = epe_pp / jnp.maximum(gt_norm, 1e-4)
    epe = jnp.sum(epe_pp * m, -1) / cnt
    accs = jnp.sum(((epe_pp < 0.05) | (rel < 0.05)) * m, -1) / cnt
    accr = jnp.sum(((epe_pp < 0.1) | (rel < 0.1)) * m, -1) / cnt
    outl = jnp.sum(((epe_pp > 0.3) | (rel > 0.1)) * m, -1) / cnt
    return {"EPE": epe, "AccS": accs, "AccR": accr, "outlier": outl}


def fmr_curve(inlier_ratios: jax.Array, thresholds=None):
    """Feature-match recall swept over inlier-ratio thresholds
    (benchmark_utils.py:93-131 FMR wrt inlier-ratio curve)."""
    if thresholds is None:
        thresholds = jnp.linspace(0.0, 0.2, 21)
    return thresholds, jax.vmap(
        lambda t: jnp.mean((inlier_ratios > t).astype(jnp.float32)))(
        thresholds)
