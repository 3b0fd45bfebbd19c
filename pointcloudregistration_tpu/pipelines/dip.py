"""DIP pipeline: patch-pair factory, descriptor training, and registration.

Parity targets:
  * preprocessing (dip/preprocess_correspondences.py + preprocess_lrf.py):
    corresponding anchors on aligned pairs, FPS anchor selection, LRF patch
    extraction — here produced on-device from the synthetic phantom factory
    instead of HDF5 files,
  * training (dip/train.py:35-130): hardest-contrastive + Chamfer of the
    TNet-aligned patch pair, Adam + cosine warm restarts,
  * inference (dip/demo.py:64-202): descriptors on sampled anchors,
    bottom-5% ||mx|| gating, RANSAC on descriptor matches.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.losses import hardest_contrastive
from pointcloudregistration_tpu.models.dip import PointNetFeature
from pointcloudregistration_tpu.ops import fps as fps_mod
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import lrf as lrf_mod
from pointcloudregistration_tpu.ops import ransac as ransac_mod


class DIPConfig(NamedTuple):
    dim: int = 64
    patch_size: int = 256
    lrf_radius: float = 0.20         # patch kernel radius (unit-cube scale)
    lrf_k: int = 128
    n_anchors: int = 256             # anchors per pair per step
    n_points: int = 1500             # phantom size for training pairs
    lr: float = 1e-3
    weight_decay: float = 1e-4
    chamfer_weight: float = 1.0


class DIPTrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(key: jax.Array, cfg: DIPConfig) -> DIPTrainState:
    model = PointNetFeature(dim=cfg.dim)
    k1, k2 = jax.random.split(key)
    dummy = jnp.zeros((2, cfg.patch_size, 3))
    variables = model.init({"params": k1, "dropout": k2}, dummy, train=False)
    # cosine warm restarts (T_0=40, T_mult=2 — dip/train.py:64)
    sched = optax.sgdr_schedule([
        {"init_value": cfg.lr, "peak_value": cfg.lr, "decay_steps": t,
         "warmup_steps": 0, "end_value": 1e-6}
        for t in (40, 80, 160, 320)])
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    return DIPTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"])


@partial(jax.jit, static_argnames=("cfg",))
def make_patch_pair_batch(key: jax.Array, cfg: DIPConfig):
    """Corresponding LRF patch pairs from one synthetic aligned pair.

    The two views are GT-aligned (modality_views), so anchor i on TOF
    corresponds to the nearest PC point — the on-device equivalent of the
    ICP-correspondence preprocessing (preprocess_correspondences.py:42-94).
    Each patch is extracted in its own cloud's LRF, giving the
    rotation-invariance supervision DIP trains for.
    """
    kd, ka, kp1, kp2, kr1, kr2 = jax.random.split(key, 6)
    views = synthetic.modality_views(kd, cfg.n_points, deform_amp=0.0)
    tof, pc, pc_mask = views["tof"], views["pc"], views["pc_mask"]
    anchors = fps_mod.fps(tof, cfg.n_anchors,
                          start_idx=jax.random.randint(ka, (), 0,
                                                       cfg.n_points))
    # NN pairing on the counterpart cloud (preprocess_lrf.py:100-120)
    _, pair_idx = knn_ops.nn_search(tof[anchors], pc, ref_mask=pc_mask)
    p1 = lrf_mod.lrf_patches(kp1, tof, anchors, cfg.lrf_radius,
                             cfg.lrf_k, cfg.patch_size)
    p2 = lrf_mod.lrf_patches(kp2, pc, pair_idx, cfg.lrf_radius,
                             cfg.lrf_k, cfg.patch_size,
                             points_mask=pc_mask)
    # independent random SO(3) per cloud — the invariance the LRF must absorb
    R1 = se3.random_uniform_rotation(kr1)
    R2 = se3.random_uniform_rotation(kr2)
    return {
        "patches1": jnp.einsum("ij,apj->api", R1, p1["patches"]),
        "patches2": jnp.einsum("ij,apj->api", R2, p2["patches"]),
        "valid1": p1["valid"], "valid2": p2["valid"],
    }


@partial(jax.jit, static_argnames=("cfg", "icp_dist"))
def preprocess_pair(key: jax.Array, src: jax.Array, tgt: jax.Array,
                    transformation: jax.Array, cfg: DIPConfig,
                    icp_dist: float = 0.03,
                    src_mask=None, tgt_mask=None):
    """Real-pair preprocessing: the reference's two-script flow in one jit.

    preprocess_correspondences.py:42-94 — apply the stored GT transform,
    ICP-refine (threshold 0.7 original / 0.03 cropped), keep NN
    correspondences; preprocess_lrf.py:73-279 — FPS anchors on the source,
    NN pairing on the target, per-anchor LRF patches both sides.

    Returns dict(patches1, patches2, valid1, valid2, anchors, pair_idx,
    corr_ok) ready for descriptor training on real data.
    """
    kf, kp1, kp2 = jax.random.split(key, 3)
    R_gt, t_gt = transformation[:3, :3], transformation[:3, 3]
    aligned = se3.transform(src, R_gt, t_gt)
    # ICP polish of the stored alignment (preprocess_correspondences.py:55)
    R, t, _ = icp_mod.icp(aligned, tgt, icp_dist, iters=15,
                          src_mask=src_mask, tgt_mask=tgt_mask)
    aligned = se3.transform(aligned, R, t)
    anchors = fps_mod.fps(aligned, cfg.n_anchors, mask=src_mask,
                          start_idx=jax.random.randint(
                              kf, (), 0, src.shape[-2]))
    d2, pair_idx = knn_ops.nn_search(aligned[anchors], tgt,
                                     ref_mask=tgt_mask)
    corr_ok = d2 < icp_dist * icp_dist
    # patches in each cloud's OWN frame (not the aligned frame): the LRF
    # must absorb the pose difference, as in preprocess_lrf.py:131-165
    p1 = lrf_mod.lrf_patches(kp1, src, anchors, cfg.lrf_radius,
                             cfg.lrf_k, cfg.patch_size,
                             points_mask=src_mask)
    p2 = lrf_mod.lrf_patches(kp2, tgt, pair_idx, cfg.lrf_radius,
                             cfg.lrf_k, cfg.patch_size,
                             points_mask=tgt_mask)
    return {"patches1": p1["patches"], "patches2": p2["patches"],
            "valid1": p1["valid"] & corr_ok[..., None],
            "valid2": p2["valid"] & corr_ok[..., None],
            "anchors": anchors, "pair_idx": pair_idx, "corr_ok": corr_ok}


def preprocess_dataset(key: jax.Array, samples, cfg: DIPConfig,
                       icp_dist: float = 0.03,
                       out_path: str | None = None):
    """Host driver: run `preprocess_pair` over a dataset of row dicts (e.g.
    data.mri.MRIPairs items or loaders.load_ransac_pickle rows) and stack
    into the patch stores the trainer streams (the HDF5-store analogue,
    preprocess_lrf.py:166-172)."""
    import numpy as np
    outs = []
    for i, s in enumerate(samples):
        src = jnp.asarray(s.get("src", s.get("source"))[..., :3])
        tgt = jnp.asarray(s.get("tgt", s.get("target"))[..., :3])
        T = jnp.asarray(s.get("transformation",
                              jnp.eye(4)), jnp.float32)
        out = preprocess_pair(jax.random.fold_in(key, i), src, tgt, T,
                              cfg, icp_dist)
        outs.append(jax.tree.map(np.asarray, out))
    stacked = {k: np.stack([o[k] for o in outs]) for k in outs[0]}
    if out_path is not None:
        np.savez_compressed(out_path, **stacked)
    return stacked


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: DIPTrainState, key: jax.Array, batch, cfg: DIPConfig):
    def loss_fn(params):
        (d1, xt1, _, mx1, _), updates1 = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["patches1"], train=True,
            rngs={"dropout": jax.random.fold_in(key, 0)},
            mutable=["batch_stats"])
        (d2, xt2, _, mx2, _), updates2 = state.apply_fn(
            {"params": params, "batch_stats": updates1["batch_stats"]},
            batch["patches2"], train=True,
            rngs={"dropout": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"])
        contrastive, aux = hardest_contrastive(d1, d2)
        # Chamfer between TNet-aligned patch pairs (dip/train.py:84)
        cd = jnp.mean(knn_ops.chamfer(xt1, xt2,
                                      batch["valid1"], batch["valid2"]))
        loss = contrastive + cfg.chamfer_weight * cd
        return loss, (updates2["batch_stats"], contrastive, cd, aux)

    (loss, (bs, contrastive, cd, aux)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=bs)
    return state, {"loss": loss, "contrastive": contrastive, "chamfer": cd,
                   "mean_pos_dist": jnp.mean(aux["pos_dists"])}


def train(key: jax.Array, cfg: DIPConfig = DIPConfig(), steps: int = 200,
          data=None, ckpt_dir: str | None = None,
          log_dir: str | None = None, resume: bool = False,
          save_every: int = 100):
    """Training driver (the reference trains 200 epochs,
    dip/train.py:66-130, checkpointing best/final and logging TensorBoard).

    data: optional sequence of precomputed patch stores — items shaped like
    `preprocess_pair` outputs (e.g. rows of `preprocess_dataset`); when None
    the on-device synthetic patch factory streams batches. Checkpoints,
    metric logs and resume ride `train.loop.TrainHooks`.

    Returns (state, history).
    """
    from pointcloudregistration_tpu.train.loop import TrainHooks
    state = create_train_state(jax.random.fold_in(key, 0), cfg)
    hooks = TrainHooks(ckpt_dir, log_dir, "dip", save_every)
    if resume:
        state, start = hooks.restore(state)
    else:
        start = 0
    hist = []
    for step in range(start, steps):
        kd, kt = jax.random.split(jax.random.fold_in(key, step + 1))
        if data is None:
            batch = make_patch_pair_batch(kd, cfg)
        else:
            row = data[step % len(data)]
            batch = {"patches1": jnp.asarray(row["patches1"]),
                     "patches2": jnp.asarray(row["patches2"]),
                     "valid1": jnp.asarray(row["valid1"]),
                     "valid2": jnp.asarray(row["valid2"])}
        state, m = train_step(state, kt, batch, cfg)
        m = {k: float(v) for k, v in m.items()}
        hist.append(m)
        hooks.log(step, m)
        hooks.step_end(step, state, m, steps)
    hooks.close()
    return state, hist


@partial(jax.jit, static_argnames=("cfg", "n_sample", "gate_percentile"))
def describe(state: DIPTrainState, key: jax.Array, points: jax.Array,
             cfg: DIPConfig, n_sample: int = 512,
             gate_percentile: float = 5.0,
             points_mask: jax.Array | None = None):
    """Sampled anchors -> descriptors with ||mx|| gating (demo.py:64-156).

    Returns (anchor_idx, descriptors, keep_mask).
    """
    ka, kp = jax.random.split(key)
    N = points.shape[0]
    scores = jax.random.uniform(ka, (N,))
    if points_mask is not None:
        scores = scores + points_mask * 10.0
    _, anchor_idx = jax.lax.top_k(scores, n_sample)
    patches = lrf_mod.lrf_patches(kp, points, anchor_idx, cfg.lrf_radius,
                                  cfg.lrf_k, cfg.patch_size,
                                  points_mask=points_mask)
    desc, _, _, mx, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        patches["patches"], train=False)
    mx_norm = jnp.linalg.norm(mx, axis=-1)
    thresh = jnp.percentile(mx_norm, gate_percentile)
    keep = mx_norm >= thresh
    return anchor_idx, desc, keep


@partial(jax.jit, static_argnames=("cfg", "n_sample", "num_hypotheses"))
def register(state: DIPTrainState, key: jax.Array,
             source: jax.Array, target: jax.Array,
             cfg: DIPConfig, n_sample: int = 512,
             ransac_thresh: float = 0.05, num_hypotheses: int = 8192,
             source_mask=None, target_mask=None):
    """DIP registration: descriptors + RANSAC (demo.py:37-202)."""
    k1, k2, k3 = jax.random.split(key, 3)
    idx_s, desc_s, keep_s = describe(state, k1, source, cfg, n_sample,
                                     points_mask=source_mask)
    idx_t, desc_t, keep_t = describe(state, k2, target, cfg, n_sample,
                                     points_mask=target_mask)
    R, t, info = ransac_mod.ransac_feature_matching(
        k3, source[idx_s], target[idx_t], desc_s, desc_t,
        threshold=ransac_thresh, num_hypotheses=num_hypotheses,
        mutual=True, src_mask=keep_s, tgt_mask=keep_t)
    return R, t, info
