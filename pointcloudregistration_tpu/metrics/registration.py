"""Registration metrics — parity with the reference's formulas.

Sources: ROPNet/src/metrics/metrics.py:6-67 (isotropic/anisotropic R,t
errors), c2p-net/ngenet/metrics/kitti.py:5-29 (RRE/RTE),
ngenet/metrics/threedmatch.py:8-52 (inlier ratio, FMR, recall gates),
deformationpyramid/utils/benchmark_utils.py:290 (inlier ratio),
ROPNet/src/eval.py:23-107 (overlap precision/recall).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.ops import knn as _knn


def isotropic_R_error(R_pred: jax.Array, R_gt: jax.Array) -> jax.Array:
    """Geodesic rotation error in degrees: arccos((tr(R_gt^T R_pred)-1)/2).

    (reference: ROPNet/src/metrics/metrics.py:6-18 Error_R)
    """
    M = jnp.einsum("...ij,...ik->...jk", R_gt, R_pred,
                   precision=jax.lax.Precision.HIGHEST)
    cos = jnp.clip((jnp.trace(M, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))


def isotropic_t_error(t_pred: jax.Array, t_gt: jax.Array,
                      R_gt: jax.Array | None = None) -> jax.Array:
    """Translation error. With R_gt given, measured in the gt frame:
    |R_gt^T (t_pred - t_gt)| — identical in norm to |t_pred - t_gt|, kept for
    formula parity (ROPNet/src/metrics/metrics.py:21-33 Error_t)."""
    d = t_pred - t_gt
    if R_gt is not None:
        d = jnp.einsum("...ij,...i->...j", R_gt, d,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.linalg.norm(d, axis=-1)


def anisotropic_R_error(R_pred: jax.Array, R_gt: jax.Array):
    """Per-axis Euler-angle MSE/MAE in degrees
    (reference: ROPNet/src/metrics/metrics.py:36-54 anisotropic_R_error)."""
    e_pred = jnp.rad2deg(se3.rotmat_to_euler(R_pred))
    e_gt = jnp.rad2deg(se3.rotmat_to_euler(R_gt))
    d = e_pred - e_gt
    return jnp.mean(d * d, -1), jnp.mean(jnp.abs(d), -1)


def anisotropic_t_error(t_pred: jax.Array, t_gt: jax.Array):
    d = t_pred - t_gt
    return jnp.mean(d * d, -1), jnp.mean(jnp.abs(d), -1)


def inlier_ratio(src_corr: jax.Array, tgt_corr: jax.Array,
                 R_gt: jax.Array, t_gt: jax.Array,
                 threshold: float = 0.1,
                 mask: jax.Array | None = None) -> jax.Array:
    """Fraction of putative correspondences within `threshold` after the GT
    transform (reference: ngenet/metrics/threedmatch.py:8-44,
    benchmark_utils.py:290)."""
    src_t = se3.transform(src_corr, R_gt, t_gt)
    d = jnp.linalg.norm(src_t - tgt_corr, axis=-1)
    ok = d < threshold
    if mask is not None:
        return jnp.sum(ok & mask, -1) / jnp.maximum(jnp.sum(mask, -1), 1)
    return jnp.mean(ok, -1)


def feature_match_recall(inlier_ratios: jax.Array,
                         ir_threshold: float = 0.05) -> jax.Array:
    """FMR: fraction of pairs whose inlier ratio exceeds `ir_threshold`
    (reference: testScript.py:106 fmr_threshold=0.05)."""
    return jnp.mean((inlier_ratios > ir_threshold).astype(jnp.float32))


def registration_recall(rre_deg: jax.Array, rte: jax.Array,
                        rre_thresh: float = 15.0,
                        rte_thresh: float = 0.3) -> jax.Array:
    """Recall under RE/TE gates (reference: threedmatch.py:50-52:
    RE < 15 deg, TE < 30 cm)."""
    ok = (rre_deg < rre_thresh) & (rte < rte_thresh)
    return jnp.mean(ok.astype(jnp.float32))


def overlap_precision_recall(pred_mask: jax.Array, gt_mask: jax.Array):
    """Precision/recall of predicted overlap point sets
    (reference: ROPNet/src/eval.py:59-75)."""
    tp = jnp.sum(pred_mask & gt_mask, -1).astype(jnp.float32)
    prec = tp / jnp.maximum(jnp.sum(pred_mask, -1), 1)
    rec = tp / jnp.maximum(jnp.sum(gt_mask, -1), 1)
    return prec, rec


def chamfer_metric(x: jax.Array, y: jax.Array, sqrt: bool = True,
                   x_mask=None, y_mask=None) -> jax.Array:
    """QC-style Chamfer (mean of bidirectional NN distances, sqrt form)
    (reference: DataPreparation/QualityCheck.py:25-31)."""
    return _knn.chamfer(x, y, x_mask, y_mask, sqrt=sqrt)


def hausdorff(x: jax.Array, y: jax.Array, x_mask=None, y_mask=None):
    """Symmetric Hausdorff distance
    (reference: DataPreparation/QualityCheck.py:13-22, scipy
    directed_hausdorff both directions, max)."""
    d1, _, d2, _ = _knn.nn_distance(x, y, x_mask, y_mask)
    if x_mask is not None:
        d1 = jnp.where(x_mask, d1, 0.0)
    if y_mask is not None:
        d2 = jnp.where(y_mask, d2, 0.0)
    h1 = jnp.sqrt(jnp.max(d1, -1))
    h2 = jnp.sqrt(jnp.max(d2, -1))
    return jnp.maximum(h1, h2)


def transform_rmse(src: jax.Array, R_pred: jax.Array, R_gt: jax.Array,
                   t_pred: jax.Array, t_gt: jax.Array) -> jax.Array:
    """MVP-RG-style RMSE between a cloud under predicted vs GT transforms:
    mean per-point Euclidean distance (reference:
    ngenet/metrics/mvp_rg.py:11-24 `RMSE`). Batched: src (B,N,3)."""
    a = se3.transform(src, R_pred, t_pred)
    b = se3.transform(src, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(a - b, axis=-1), axis=-1)


def correspondence_rmse(src: jax.Array, tgt: jax.Array,
                        gt_corr_src: jax.Array, gt_corr_tgt: jax.Array,
                        R_pred: jax.Array, t_pred: jax.Array,
                        corr_mask: jax.Array | None = None) -> jax.Array:
    """RMSE over GT correspondences after the predicted transform
    (reference: threedmatch.py:28-44 `registration_recall_core`)."""
    s = se3.transform(src[gt_corr_src], R_pred, t_pred)
    t = tgt[gt_corr_tgt]
    se = jnp.sum((s - t) ** 2, axis=-1)
    if corr_mask is not None:
        mse = jnp.sum(jnp.where(corr_mask, se, 0.0)) / jnp.maximum(
            jnp.sum(corr_mask), 1)
    else:
        mse = jnp.mean(se)
    return jnp.sqrt(mse)


def mutual_inlier_ratio(src: jax.Array, tgt: jax.Array,
                        row_nn: jax.Array, col_nn: jax.Array,
                        R_gt: jax.Array, t_gt: jax.Array,
                        threshold: float = 0.1,
                        src_mask: jax.Array | None = None):
    """Inlier ratio + mutual-NN inlier ratio of feature matches
    (reference: threedmatch.py:8-25 `inlier_ratio_core`): row_nn[i] is
    src i's NN in tgt feature space, col_nn[j] is tgt j's NN in src.
    Mutual pairs are those with col_nn[row_nn[i]] == i; statics-friendly
    (masked mean instead of gather of a ragged set)."""
    src_t = se3.transform(src, R_gt, t_gt)
    d2 = jnp.sum((src_t - tgt[row_nn]) ** 2, axis=-1)
    ok = d2 < threshold * threshold
    valid = (src_mask if src_mask is not None
             else jnp.ones(src.shape[0], bool))
    ir = jnp.sum(ok & valid) / jnp.maximum(jnp.sum(valid), 1)
    mutual = (col_nn[row_nn] == jnp.arange(src.shape[0])) & valid
    mir = jnp.sum(ok & mutual) / jnp.maximum(jnp.sum(mutual), 1)
    return ir, mir
