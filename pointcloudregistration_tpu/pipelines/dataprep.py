"""Data-generation pipeline — the DataPreparation stage, end to end.

Parity with DataPreparation/run.py:45-312:
  phantom views -> unit cube -> FPFH+RANSAC+ICP prealign -> crop to the PC
  bounding region -> K augmented pairs (random rotations, translations,
  jitter) -> quality check (Hausdorff + Chamfer vs originals, ranked) ->
  train/test split by QC threshold (Copy.py:9-36) -> PointNet-QC confidence
  filter (run.py:233-243) -> per-pair FPFH+RANSAC+ICP ground truth ->
  sample records with the reference's pickle contract
  (RANSAC.py:128-132 keys: source, target, src_normals, tgt_normals,
  transformation, inlier_rmse, inlier_ratio, correspondence).

Everything heavy is batched on device; the driver emits an .npz archive the
downstream pipelines (dip / ropnet / ngenet) can stream.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import estimate_normals
from pointcloudregistration_tpu.data import augment, synthetic
from pointcloudregistration_tpu.metrics.registration import (chamfer_metric,
                                                             hausdorff)
from pointcloudregistration_tpu.ops import fpfh as fpfh_mod
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import ransac as ransac_mod


class DataPrepConfig(NamedTuple):
    n_points: int = 3000            # poisson-disk resample target (run.py:117)
    n_augment: int = 64             # reference uses 200 rotations (run.py:137)
    max_angle_deg: float = 90.0     # per-axis (Augment.py:37-44)
    max_trans: float = 1.5          # (Augment.py:46-49)
    jitter_sigma: float = 0.001
    jitter_clip: float = 0.005
    qc_threshold: float = 0.12      # avg(QC) split threshold (Copy.py)
    ransac_thresh: float = 0.05
    icp_dist: float = 0.1
    min_correspondences: int = 1000  # acceptance gate (RANSAC.py:113)


def _normals(pts, mask=None):
    _, nidx = knn_ops.knn(pts, pts, 16, mask, mask)
    return estimate_normals(pts, nidx)


@partial(jax.jit, static_argnames=("cfg",))
def augment_one(key: jax.Array, tof: jax.Array, pc: jax.Array,
                pc_mask: jax.Array, cfg: DataPrepConfig):
    """One augmented sample: random SE(3) + jitter on the TOF side."""
    kr, kt, kj = jax.random.split(key, 3)
    rotated, R = augment.random_rotate(kr, tof, cfg.max_angle_deg)
    translated, t = augment.random_translate(kt, rotated, cfg.max_trans)
    jittered = augment.jitter_points(kj, translated, cfg.jitter_sigma,
                                     cfg.jitter_clip)
    return {"source": jittered, "target": pc, "target_mask": pc_mask,
            "R_aug": R, "t_aug": t}


@partial(jax.jit, static_argnames=("cfg",))
def quality_check_one(sample, tof_orig, cfg: DataPrepConfig):
    """Hausdorff + Chamfer of the de-augmented sample vs the original
    (QualityCheck.py:13-53: metrics vs originals, averaged)."""
    Ri, ti = se3.invert(sample["R_aug"], sample["t_aug"])
    back = se3.transform(sample["source"], Ri, ti)
    h = hausdorff(back, tof_orig)
    c = chamfer_metric(back, tof_orig, sqrt=True)
    return {"hausdorff": h, "chamfer": c, "average": (h + c) / 2.0}


@partial(jax.jit, static_argnames=("cfg",))
def make_gt_one(key: jax.Array, sample, cfg: DataPrepConfig):
    """FPFH+RANSAC+ICP ground-truthing of one augmented pair
    (RANSAC.py:66-132)."""
    src, tgt = sample["source"], sample["target"]
    tmask = sample["target_mask"]
    n_src = _normals(src)
    n_tgt = _normals(tgt, tmask)
    f_src = fpfh_mod.fpfh(src, n_src, radius=0.4, k=32)
    f_tgt = fpfh_mod.fpfh(tgt, n_tgt, radius=0.4, k=32, mask=tmask)
    R0, t0, rinfo = ransac_mod.ransac_feature_matching(
        key, src, tgt, f_src, f_tgt, threshold=cfg.ransac_thresh,
        num_hypotheses=8192, mutual=True, tgt_mask=tmask)
    R, t, iinfo = icp_mod.icp(src, tgt, cfg.icp_dist, iters=25,
                              R0=R0, t0=t0, tgt_mask=tmask,
                              max_dist_final=cfg.ransac_thresh / 2)
    # correspondence set at the final alignment (RANSAC.py:120-127)
    aligned = se3.transform(src, R, t)
    d2, corr = knn_ops.nn_search(aligned, tgt, ref_mask=tmask)
    corr_ok = d2 < cfg.ransac_thresh ** 2
    return {
        "source": src, "target": tgt,
        "src_normals": n_src, "tgt_normals": n_tgt,
        "transformation": se3.to_matrix4(R, t),
        "inlier_rmse": iinfo["inlier_rmse"],
        "inlier_ratio": iinfo["fitness"],
        "correspondence": jnp.where(corr_ok, corr, -1),
        "n_correspondences": jnp.sum(corr_ok),
        "accepted": jnp.sum(corr_ok) >= cfg.min_correspondences,
    }


def generate_dataset(key: jax.Array, cfg: DataPrepConfig = DataPrepConfig(),
                     qc_state=None, out_path: str | None = None):
    """Full generation run. Returns dict of stacked arrays + QC table.

    qc_state: optional trained PointNetQC train state for the confidence
    filter; when None the filter is skipped (labels unavailable).
    """
    kv, ka, kg = jax.random.split(key, 3)
    views = synthetic.modality_views(kv, cfg.n_points)
    tof, pc, pc_mask = views["tof"], views["pc"], views["pc_mask"]

    keys = jax.random.split(ka, cfg.n_augment)
    samples = jax.vmap(lambda k: augment_one(k, tof, pc, pc_mask, cfg))(keys)
    qc = jax.vmap(lambda i: quality_check_one(
        jax.tree.map(lambda x: x[i], samples), tof, cfg))(
        jnp.arange(cfg.n_augment))

    # split: samples over the QC threshold go to test (Copy.py:9-36)
    is_train = np.asarray(qc["average"]) <= cfg.qc_threshold

    # optional PointNet-QC confidence filter
    keep = np.ones(cfg.n_augment, bool)
    if qc_state is not None:
        logits = qc_state.apply_fn(
            {"params": qc_state.params,
             "batch_stats": qc_state.batch_stats},
            samples["source"], train=False)
        conf = jax.nn.softmax(logits, -1)
        keep = np.asarray(jnp.max(conf, -1) > 0.7)

    gt_keys = jax.random.split(kg, cfg.n_augment)
    gt = jax.vmap(lambda k, i: make_gt_one(
        k, jax.tree.map(lambda x: x[i], samples), cfg))(
        gt_keys, jnp.arange(cfg.n_augment))

    record = {
        **{k: np.asarray(v) for k, v in gt.items()},
        "qc_hausdorff": np.asarray(qc["hausdorff"]),
        "qc_chamfer": np.asarray(qc["chamfer"]),
        "qc_average": np.asarray(qc["average"]),
        "is_train": is_train,
        "qc_keep": keep,
        "R_aug": np.asarray(samples["R_aug"]),
        "t_aug": np.asarray(samples["t_aug"]),
    }
    if out_path is not None:
        np.savez_compressed(out_path, **record)
    return record


def export_ransac_pickle(record: dict, path: str,
                         accepted_only: bool = True) -> int:
    """Write a generated dataset in the reference's columnar pickle contract
    (DataPreparation/RANSAC.py:127-131), so the MRI dataset family
    (data/mri.py) and any reference-side consumer can read it. Returns the
    number of samples written."""
    from pointcloudregistration_tpu.data import loaders

    keep = (np.asarray(record["accepted"], bool)
            if accepted_only else np.ones(len(record["source"]), bool))
    idx = np.nonzero(keep)[0]
    rows = [{
        "source": np.asarray(record["source"][i]),
        "target": np.asarray(record["target"][i]),
        "src_normals": np.asarray(record["src_normals"][i]),
        "tgt_normals": np.asarray(record["tgt_normals"][i]),
        "transformation": np.asarray(record["transformation"][i]),
        "inlier_rmse": float(record["inlier_rmse"][i]),
        "inlier_ratio": float(record["inlier_ratio"][i]),
        "correspondence": np.asarray(record["correspondence"][i]),
    } for i in idx]
    loaders.save_ransac_pickle_columnar(path, rows)
    return len(rows)
