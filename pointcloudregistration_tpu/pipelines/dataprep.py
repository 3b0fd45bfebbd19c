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

import os
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
from pointcloudregistration_tpu.ops import fpfh_pallas
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
    # modality-disagreement deformation applied to the PC view before
    # augmentation (synthetic.modality_views deform_amp): >0 makes the
    # TOF/PC pair genuinely non-rigid so the NDP stage has real work on
    # held-out pairs (the reference's C2P exists for exactly this —
    # c2p-net/validationScript.py:119-341). 0 reproduces the v2 corpus.
    deform_amp: float = 0.0
    # symmetric-pose rejection (an improvement over the reference): the
    # augmentation that generated each sample is known, so a RANSAC GT
    # that disagrees with the augmentation inverse by more than this many
    # degrees locked onto a symmetric alignment of the vessel tree and is
    # rejected. The reference's acceptance-by-correspondence-count
    # (RANSAC.py:113) cannot catch these. <=0 disables.
    max_gt_rre_deg: float = 15.0


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
    if jax.default_backend() == "tpu":
        # fused dense-radius FPFH (ops/fpfh_pallas.py): ~6x the mutual-match
        # inlier fitness of the K-capped features (PERF.md r04), which
        # directly tightens the GT acceptance gate below
        f_src, n_src = fpfh_pallas.fpfh_dense(src, 0.23, 0.4)
        f_tgt, n_tgt = fpfh_pallas.fpfh_dense(tgt, 0.23, 0.4, mask=tmask)
    else:
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
    accepted = jnp.sum(corr_ok) >= cfg.min_correspondences
    # symmetric-pose check against the known augmentation inverse
    R_true, _ = se3.invert(sample["R_aug"], sample["t_aug"])
    cos = (jnp.trace(R.T @ R_true) - 1.0) / 2.0
    gt_rre = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    if cfg.max_gt_rre_deg > 0:
        accepted = accepted & (gt_rre <= cfg.max_gt_rre_deg)
    return {
        "source": src, "target": tgt,
        "src_normals": n_src, "tgt_normals": n_tgt,
        "transformation": se3.to_matrix4(R, t),
        "inlier_rmse": iinfo["inlier_rmse"],
        "inlier_ratio": iinfo["fitness"],
        "correspondence": jnp.where(corr_ok, corr, -1),
        "n_correspondences": jnp.sum(corr_ok),
        "gt_rre_vs_known_deg": gt_rre,
        "accepted": accepted,
    }


def phantom_from_obj(key: jax.Array, obj_path: str,
                     n_points: int = 3000, sample_frac: float = 0.5,
                     voxel: float = 0.005, crop_margin: float | None = None):
    """The real-mesh head of the reference pipeline
    (DataPreparation/run.py:77-117): load the phantom OBJ -> unit-cube scale
    -> uniform surface sampling of int(V·sample_frac) points -> voxel
    downsample -> optional bbox crop -> blue-noise (FPS) resample to
    n_points.

    Scale note: core.geometry.to_unit_cube normalizes to extent 1 (±0.5)
    where the reference's scale_mesh uses extent 2 (±1), so the reference's
    0.01 voxel maps to 0.005 here; every downstream radius in this framework
    is tuned to the extent-1 cube.

    Returns a (n_points, 3) float32 unit-cube cloud ready to stand as the
    `base` of `synthetic.modality_views` / `generate_dataset`.
    """
    from pointcloudregistration_tpu.core.geometry import to_unit_cube
    from pointcloudregistration_tpu.data import loaders
    from pointcloudregistration_tpu.ops import fps as fps_mod
    from pointcloudregistration_tpu.ops import meshing
    from pointcloudregistration_tpu.ops import subsample as subsample_ops

    verts, faces = loaders.read_obj_mesh(obj_path)
    scaled, _, _ = to_unit_cube(jnp.asarray(verts))
    n_surf = max(int(len(verts) * sample_frac), n_points * 2)
    pts = meshing.sample_mesh_surface(key, scaled, jnp.asarray(faces),
                                      n_surf)
    sub, live = subsample_ops.grid_subsample(pts, voxel, n_surf)
    if crop_margin is not None:
        lo = jnp.min(jnp.where(live[:, None], sub, jnp.inf), 0) - crop_margin
        hi = jnp.max(jnp.where(live[:, None], sub, -jnp.inf), 0) + crop_margin
        live = live & jnp.all((sub >= lo) & (sub <= hi), -1)
    # poisson-disk-equivalent resample: FPS spreads samples uniformly
    idx = fps_mod.fps(sub, n_points, mask=live)
    return sub[idx]


def generate_dataset(key: jax.Array, cfg: DataPrepConfig = DataPrepConfig(),
                     qc_state=None, out_path: str | None = None,
                     base: jnp.ndarray | None = None):
    """Full generation run. Returns dict of stacked arrays + QC table.

    qc_state: optional trained PointNetQC train state for the confidence
    filter; when None the filter is skipped (labels unavailable).
    base: optional (n_points, 3) real phantom cloud (phantom_from_obj) to
    use instead of the synthetic vessel tree.
    """
    kv, ka, kg = jax.random.split(key, 3)
    views = synthetic.modality_views(kv, cfg.n_points, base=base,
                                     deform_amp=cfg.deform_amp)
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


def qc_report(record: dict, path: str):
    """Ranked QC report file (QualityCheck.py:54-79 parity).

    The reference writes an xlsx ranked by the Hausdorff/Chamfer average
    (descending — worst samples first) that Copy.py then consumes to move
    outliers. Environment note: openpyxl isn't available here, so the
    ranked table is CSV (same columns, same ordering, same consumer
    contract); pandas writes either from the same frame.

    Returns the DataFrame (also written to `path`).
    """
    import pandas as pd

    n = record["qc_average"].shape[0]
    df = pd.DataFrame({
        "SampleNo": np.arange(n),
        "Hausdorff Distance": record["qc_hausdorff"],
        "Chamfer Distance": record["qc_chamfer"],
        "Average": record["qc_average"],
        "is_train": record["is_train"],
        "accepted": record.get("accepted", np.ones(n, bool)),
    }).sort_values("Average", ascending=False).reset_index(drop=True)
    df.to_csv(path, index=False)
    return df


def materialize_split(record: dict, root: str) -> dict:
    """Write per-sample files into Train/ and Test/ directories.

    The reference's split is *file moves*: every augmented sample lives as
    files under Train/, and Copy.py relocates QC outliers to Test/. This
    materializes the same on-disk layout from the array-level split
    (`is_train`): `root/Train/sample_%03d.npz`, `root/Test/sample_%03d.npz`
    (source, target, transformation per file). Returns
    {"train": [paths], "test": [paths]}.
    """
    out = {"train": [], "test": []}
    for sub in ("Train", "Test"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(record["qc_average"].shape[0]):
        sub = "Train" if record["is_train"][i] else "Test"
        p = os.path.join(root, sub, f"sample_{i:03d}.npz")
        np.savez_compressed(
            p, source=record["source"][i], target=record["target"][i],
            transformation=record["transformation"][i])
        out[sub.lower()].append(p)
    return out


def move_outliers(report_csv: str, threshold: float, train_dir: str,
                  test_dir: str) -> list:
    """File-moving split in the spirit of Copy.py:9-36: read the ranked QC
    report, move every sample with Average >= threshold from Train/ to
    Test/ (the reference walks the descending ranking and breaks on
    Average < thresh, i.e. an inclusive boundary; it additionally skips
    'rot'/'trans' augmented filenames — here every sample is a uniform
    .npz so no such filename classes exist). Returns the list of moved
    paths (missing files are skipped, matching the reference's tolerance
    for already-moved samples)."""
    import shutil

    import pandas as pd

    df = pd.read_csv(report_csv)
    os.makedirs(test_dir, exist_ok=True)
    moved = []
    for _, row in df[df["Average"] >= threshold].iterrows():
        name = f"sample_{int(row['SampleNo']):03d}.npz"
        src = os.path.join(train_dir, name)
        if os.path.exists(src):
            shutil.move(src, os.path.join(test_dir, name))
            moved.append(os.path.join(test_dir, name))
    return moved


def train_pointnet_qc(key: jax.Array, steps: int = 100, batch: int = 8,
                      n_points: int = 512, lr: float = 1e-3,
                      max_angle_deg: float = 90.0,
                      dataset_batches: int = 8):
    """Train the TOF-vs-PC PointNet quality classifier
    (DataPreparation/Pointnet.py:69-226: Keras PointNet, Adam, sparse CE).

    Batches are labeled modality views of phantoms, augmented with random
    rotations exactly like the samples the filter later judges
    (run.py:233-243). Like the reference, training runs epochs over a FIXED
    dataset (`dataset_batches` pregenerated batches cycled) — the modality
    signature (coverage holes, noise scale, smooth bias) is learnable per
    dataset but weak across unlimited fresh phantoms. Returns (train_state,
    history); the state plugs into `generate_dataset(qc_state=...)`.
    """
    import optax
    from flax.training import train_state as ts_mod

    from pointcloudregistration_tpu.data import augment as augment_mod
    from pointcloudregistration_tpu.models.pointnet_qc import PointNetQC

    class _State(ts_mod.TrainState):
        batch_stats: dict = None

    model = PointNetQC()
    k0, k1 = jax.random.split(key)
    variables = model.init({"params": k0, "dropout": k1},
                           jnp.zeros((2, n_points, 3)), train=False)
    state = _State.create(apply_fn=model.apply, params=variables["params"],
                          tx=optax.adam(lr),
                          batch_stats=variables["batch_stats"])

    @jax.jit
    def make_batch(bk):
        keys = jax.random.split(bk, batch)

        def one(k):
            kv, kr1, kr2, ks = jax.random.split(k, 4)
            views = synthetic.modality_views(kv, n_points, deform_amp=0.05)
            # realize the PC coverage mask: dropped points are replaced by
            # resampled kept points, so the classifier sees the actual
            # modality signature (coverage holes + coarser noise + smooth
            # bias) rather than phantom points
            score = views["pc_mask"].astype(jnp.float32) + jax.random.uniform(
                ks, (n_points,), maxval=0.5)
            _, order = jax.lax.top_k(score, n_points)      # kept first
            n_keep = jnp.maximum(jnp.sum(views["pc_mask"]), 1)
            pc_real = views["pc"][order[jnp.mod(jnp.arange(n_points),
                                                n_keep)]]
            tof, _ = augment_mod.random_rotate(kr1, views["tof"],
                                               max_angle_deg)
            pc, _ = augment_mod.random_rotate(kr2, pc_real, max_angle_deg)
            return tof, pc

        tof, pc = jax.vmap(one)(keys)
        x = jnp.concatenate([tof, pc], 0)
        y = jnp.concatenate([jnp.zeros(batch, jnp.int32),
                             jnp.ones(batch, jnp.int32)])
        return x, y

    @jax.jit
    def train_step(state, k, x, y):
        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": k},
                mutable=["batch_stats"])
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, y))
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, (updates["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return (state.apply_gradients(grads=grads).replace(batch_stats=bs),
                loss, acc)

    hist = []
    for step in range(steps):
        kd, kt = jax.random.split(jax.random.fold_in(
            key, (step % dataset_batches) + 2))
        x, y = make_batch(kd)
        state, loss, acc = train_step(state, jax.random.fold_in(kt, step),
                                      x, y)
        hist.append({"loss": float(loss), "accuracy": float(acc)})
    return state, hist


def _apply_T(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def cpd_ground_truth(key: jax.Array, samples, method: str,
                     out_path: str | None = None, iters: int = 50,
                     corr_radius: float = 0.05,
                     max_angle_deg: float = 90.0, max_trans: float = 1.5,
                     seed: int = 0):
    """CPD ground-truthing of RANSAC-aligned pairs — DataPreparation/
    CPD.py:26-73 parity, feeding the RigidCPD/AffineCPD/NonRigidCPD dataset
    stems (data/mri.py METHODS; ROPNet/src/data/MRI.py:103-574).

    Per sample: apply the stored transformation, CPD-register the source
    onto the target (rigid/affine/nonrigid via ops/cpd.py), disorient with a
    fresh random SE(3) and store its inverse as the new GT — exactly the
    reference flow. Rows are exported in the full columnar contract (plus
    normals/correspondences, superset of the reference's 3-key CPD pickle).
    """
    from pointcloudregistration_tpu.data import loaders
    from pointcloudregistration_tpu.data.mri import (_numpy_normals,
                                                     random_se3)
    from pointcloudregistration_tpu.ops import cpd as cpd_mod

    assert method in ("rigid", "affine", "nonrigid"), method
    rng = np.random.default_rng(seed)
    rows = []
    for i, s in enumerate(samples):
        src = np.asarray(s["source"], np.float32)
        tgt = np.asarray(s["target"], np.float32)
        T_stored = np.asarray(s.get("transformation", np.eye(4)), np.float32)
        src = _apply_T(src, T_stored)
        xs, ys = jnp.asarray(tgt), jnp.asarray(src)
        if method == "rigid":
            sc, R_, t_, _ = cpd_mod.cpd_rigid(xs, ys, iters=iters)
            warped = np.asarray(sc * ys @ jnp.asarray(R_).T + t_)
        elif method == "affine":
            B_, t_, _ = cpd_mod.cpd_affine(xs, ys, iters=iters)
            warped = np.asarray(ys @ jnp.asarray(B_).T + t_)
        else:
            warped_j, _, _ = cpd_mod.cpd_nonrigid(xs, ys, iters=iters)
            warped = np.asarray(warped_j)
        # disorient; the inverse is the stored GT (CPD.py:57-66)
        R, t = random_se3(rng, max_angle_deg, max_trans)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        ts = warped @ R.T + t
        T_inv = np.linalg.inv(T).astype(np.float32)
        # correspondences at the CPD alignment (radius-gated NN)
        d2 = (np.sum(warped**2, 1)[:, None] + np.sum(tgt**2, 1)[None]
              - 2.0 * warped @ tgt.T)
        nn = np.argmin(d2, 1)
        ok = d2[np.arange(len(nn)), nn] < corr_radius**2
        rows.append({
            "source": ts.astype(np.float32), "target": tgt,
            "src_normals": _numpy_normals(ts.astype(np.float32)),
            "tgt_normals": _numpy_normals(tgt),
            "transformation": T_inv,
            "inlier_rmse": float(np.sqrt(
                max(d2[np.arange(len(nn)), nn][ok].mean(), 0.0)
                if ok.any() else 0.0)),
            "inlier_ratio": float(ok.mean()),
            "correspondence": np.where(ok, nn, -1).astype(np.int32),
        })
    if out_path is not None:
        loaders.save_ransac_pickle_columnar(out_path, rows)
    return rows


def record_to_rows(record: dict, accepted_only: bool = True) -> list:
    """Generated-dataset record -> list of rows in the reference's columnar
    pickle contract (DataPreparation/RANSAC.py:127-131)."""
    keep = (np.asarray(record["accepted"], bool)
            if accepted_only else np.ones(len(record["source"]), bool))
    idx = np.nonzero(keep)[0]
    return [{
        "source": np.asarray(record["source"][i]),
        "target": np.asarray(record["target"][i]),
        "src_normals": np.asarray(record["src_normals"][i]),
        "tgt_normals": np.asarray(record["tgt_normals"][i]),
        "transformation": np.asarray(record["transformation"][i]),
        "inlier_rmse": float(record["inlier_rmse"][i]),
        "inlier_ratio": float(record["inlier_ratio"][i]),
        "correspondence": np.asarray(record["correspondence"][i]),
    } for i in idx]


def export_ransac_pickle(record: dict, path: str,
                         accepted_only: bool = True) -> int:
    """Write a generated dataset in the reference's columnar pickle contract
    (DataPreparation/RANSAC.py:127-131), so the MRI dataset family
    (data/mri.py) and any reference-side consumer can read it. Returns the
    number of samples written."""
    from pointcloudregistration_tpu.data import loaders

    rows = record_to_rows(record, accepted_only)
    loaders.save_ransac_pickle_columnar(path, rows)
    return len(rows)
