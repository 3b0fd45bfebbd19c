"""Lepard landmark-stage pipeline: training + inference + the LNDP loop.

Closes the reference's optional landmark-guided path
(c2p-net/config/LNDP.yaml: use_ldmk True):
  * training — KPFCN backbone -> RepositioningTransformer -> Matching ->
    OutlierRejection, supervised by the focal matching loss + NeCo loss
    (correspondence/lepard/loss.py MatchMotionLoss,
    correspondence/outlier_rejection losses) on synthetic deformed pairs —
    the reference trains the same stack on 4DMatch
    (correspondence/main.py:25-119, lib/trainer.py:17-275);
  * inference — `estimate_landmarks` mirrors Landmark_Model.inference
    (correspondence/landmark_estimator.py:46-75): matches filtered by the
    outlier-rejection confidence become 6-d landmark pairs;
  * LNDP — `register_pair_lndp`: rigid pre-align from the soft-Procrustes
    fit + ICP, then landmark-guided NDP (models/ndp.fit ldmk_* arguments =
    registration.py:210-227 loss_ldmk).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
from flax.training import train_state

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import fourdmatch
from pointcloudregistration_tpu.losses.lepard import (LepardLossConfig,
                                                      fine_nce_loss,
                                                      focal_matching_loss,
                                                      matching_labels,
                                                      motion_loss,
                                                      neco_loss)
from pointcloudregistration_tpu.models import ndp as ndp_mod
from pointcloudregistration_tpu.models.lepard import (KPFCNBackbone,
                                                      LandmarkModel,
                                                      LepardConfig)
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops.pyramid import PyramidConfig, build_pyramid
from pointcloudregistration_tpu import metrics


class LepardTrainConfig(NamedTuple):
    model: LepardConfig = LepardConfig(feat_dim=64, nhead=4, voxel=0.08)
    pyramid: PyramidConfig = PyramidConfig(
        num_layers=4, first_voxel=0.025,
        capacities=(1024, 512, 256, 128), neighbor_caps=(24, 24, 24, 24))
    loss: LepardLossConfig = LepardLossConfig()
    backbone_feats: int = 32
    n_points: int = 1024
    deform_amp: float = 0.08
    tgt_dropout: float = 0.35
    max_angle_deg: float = 30.0
    max_trans: float = 0.3
    lr: float = 1e-4


class LepardPipeline(nn.Module):
    """Siamese backbone + landmark head over coarse pyramid points
    (correspondence/lepard/pipeline.py:8-84)."""
    cfg: LepardTrainConfig

    @nn.compact
    def __call__(self, pyr_src, pyr_tgt, train: bool = False):
        cfg = self.cfg
        bb = KPFCNBackbone(first_feats_dim=cfg.backbone_feats,
                           coarse_dim=cfg.model.feat_dim,
                           voxel=cfg.pyramid.first_voxel)
        out_s = bb(pyr_src, train)
        out_t = bb(pyr_tgt, train)
        c_s, c_t = pyr_src["points"][3], pyr_tgt["points"][3]
        m_s, m_t = pyr_src["masks"][3], pyr_tgt["masks"][3]
        out = LandmarkModel(cfg.model)(c_s, c_t, out_s["coarse_feats"],
                                       out_t["coarse_feats"], m_s, m_t)
        out["coarse_src"], out["coarse_tgt"] = c_s, c_t
        out["coarse_src_mask"], out["coarse_tgt_mask"] = m_s, m_t
        out["fine_feats_src"] = out_s["fine_feats"]
        out["fine_feats_tgt"] = out_t["fine_feats"]
        return out


class LepardTrainState(train_state.TrainState):
    batch_stats: dict = None


@partial(jax.jit, static_argnames=("cfg",))
def make_sample_arrays(source, source_mask, target, target_mask,
                       R_gt, t_gt, flow, cfg: LepardTrainConfig):
    """Explicit pair (+ GT flow in the source frame, 4DMatch semantics:
    R_gt(source + flow) + t_gt lands on the target) -> trainer sample:
    pyramids, per-level flow, and level-0 GT correspondences for the fine
    supervision."""
    pyr_s = build_pyramid(source, source_mask, cfg.pyramid)
    pyr_t = build_pyramid(target, target_mask, cfg.pyramid)
    # flow at the pyramid points (levels are voxel barycenters, not input
    # rows): NN lookup into the raw source cloud — coarse_flow of
    # _4dmatch-style loaders (loss.py:84-88)
    p0, m0 = pyr_s["points"][0], pyr_s["masks"][0]
    pc, mc = pyr_s["points"][3], pyr_s["masks"][3]
    _, i0 = knn_ops.nn_search(p0, source, ref_mask=source_mask)
    _, ic = knn_ops.nn_search(pc, source, ref_mask=source_mask)
    flow0 = jnp.where(m0[:, None], flow[i0], 0.0)
    flow_c = jnp.where(mc[:, None], flow[ic], 0.0)
    # level-0 GT correspondences: radius-gated NN of the GT-warped fine
    # source points into the fine target points
    warped0 = se3.transform(p0 + flow0, R_gt, t_gt)
    d2, corr0 = knn_ops.nn_search(warped0, pyr_t["points"][0],
                                  ref_mask=pyr_t["masks"][0])
    corr0_mask = (d2 < cfg.loss.pos_radius ** 2) & m0
    return {"pyr_src": pyr_s, "pyr_tgt": pyr_t,
            "R_gt": R_gt, "t_gt": t_gt,
            "flow_coarse": flow_c, "flow0": flow0,
            "corr0_idx": corr0, "corr0_mask": corr0_mask}


@partial(jax.jit, static_argnames=("cfg",))
def make_sample(key: jax.Array, cfg: LepardTrainConfig):
    """One deformed training pair + pyramids (the 4DMatch-style supervision
    the reference trains on, correspondence/datasets/_4dmatch.py) with GT
    flow from the deformed-pair generator."""
    pair = fourdmatch.make_deformed_pair(
        key, fourdmatch.FourDMatchConfig(
            n_points=cfg.n_points, deform_amp=cfg.deform_amp,
            tgt_dropout=cfg.tgt_dropout,
            max_angle_deg=cfg.max_angle_deg, max_trans=cfg.max_trans))
    src_mask = jnp.ones(pair["s_pc"].shape[:-1], bool)
    return make_sample_arrays(pair["s_pc"], src_mask,
                              pair["t_pc"], pair["t_mask"],
                              pair["rot"], pair["trans"],
                              pair["s2t_flow"], cfg)


def _pad_rows(a, n, fill=0.0):
    import numpy as np
    a = np.asarray(a)[:n]
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[:len(a)] = a
    mask = np.zeros(n, bool)
    mask[:len(a)] = True
    return out, mask


def sample_from_item(item: dict, cfg: LepardTrainConfig):
    """One FourDMatchPairs row (the reference's npz contract,
    _4dmatch.py:57-69) -> the trainer's sample pytree."""
    src, sm = _pad_rows(item["s_pc"], cfg.n_points)
    flow, _ = _pad_rows(item["s2t_flow"], cfg.n_points)
    tgt, tm = _pad_rows(item["t_pc"], cfg.n_points)
    tm = tm & _pad_rows(item["t_mask"], cfg.n_points)[0].astype(bool)
    return make_sample_arrays(
        jnp.asarray(src), jnp.asarray(sm), jnp.asarray(tgt),
        jnp.asarray(tm), jnp.asarray(item["rot"], jnp.float32),
        jnp.asarray(item["trans"], jnp.float32),
        jnp.asarray(flow), cfg)


def create_train_state(key: jax.Array,
                       cfg: LepardTrainConfig) -> LepardTrainState:
    model = LepardPipeline(cfg)
    sample = make_sample(jax.random.PRNGKey(0), cfg)
    variables = model.init(key, sample["pyr_src"], sample["pyr_tgt"],
                           train=False)
    return LepardTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(cfg.lr),
        batch_stats=variables.get("batch_stats"))


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: LepardTrainState, key: jax.Array, sample,
               cfg: LepardTrainConfig):
    """Full MatchMotionLoss step (correspondence/lepard/loss.py:80-190):
    focal matching + recall-gated L1 motion loss on the final soft
    Procrustes AND every positioning layer, + fine-level InfoNCE + NeCo."""
    lcfg = cfg.loss

    def loss_fn(params):
        out, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            sample["pyr_src"], sample["pyr_tgt"], train=True,
            mutable=["batch_stats"])
        c_s, c_t = out["coarse_src"], out["coarse_tgt"]
        m_s, m_t = out["coarse_src_mask"], out["coarse_tgt_mask"]
        flow_c = sample["flow_coarse"]
        # 4DMatch semantics: GT warp carries the deformation (loss.py:120)
        aligned = se3.transform(c_s + flow_c, sample["R_gt"],
                                sample["t_gt"])
        labels = matching_labels(aligned, c_t, lcfg.pos_radius, m_s, m_t)
        overlap_rows = jnp.any(labels, -1)          # s_overlap_mask
        l_match, mm = focal_matching_loss(out["confidence"], labels,
                                          m_s, m_t, lcfg.focal_alpha,
                                          lcfg.focal_gamma)
        total = lcfg.w_matching * l_match
        # motion loss, gated on recall (loss.py:108-129); jnp.where (not a
        # multiply) so a gated-off step cannot leak NaN gradients
        l_motion = motion_loss(out["R"], out["t"], c_s,
                               sample["R_gt"], sample["t_gt"],
                               flow_gt=flow_c, overlap_mask=overlap_rows)
        total = total + lcfg.w_motion * jnp.where(
            mm["match_recall"] > lcfg.recall_gate, l_motion, 0.0)
        # positioning layers supervised like the final fit (loss.py:156-190)
        for pl in out["position_layers"]:
            l_rpe, mm_rpe = focal_matching_loss(
                pl["conf"], labels, m_s, m_t,
                lcfg.focal_alpha, lcfg.focal_gamma)
            l_mot_rpe = motion_loss(
                pl["R"], pl["t"], c_s, sample["R_gt"], sample["t_gt"],
                flow_gt=flow_c, overlap_mask=overlap_rows)
            total = total + lcfg.w_matching * l_rpe \
                + lcfg.w_motion * jnp.where(
                    mm_rpe["match_recall"] > lcfg.recall_gate,
                    l_mot_rpe, 0.0)
        # fine-level InfoNCE on the KPFCN decoder features
        l_fine, fm = fine_nce_loss(key, out["fine_feats_src"],
                                   out["fine_feats_tgt"],
                                   sample["corr0_idx"],
                                   sample["corr0_mask"],
                                   lcfg.fine_max_pairs,
                                   lcfg.fine_temperature)
        total = total + lcfg.w_fine * l_fine
        l_neco, nm = neco_loss(out["inlier_confidence"], aligned,
                               out["ldmk_tgt"], lcfg.pos_radius,
                               mask=m_s & out["match_mask"])
        total = total + lcfg.w_neco * l_neco
        parts = {"matching_loss": l_match, "motion_loss": l_motion,
                 "fine_loss": l_fine, "neco_loss": l_neco, **mm, **fm, **nm,
                 "rre": metrics.isotropic_R_error(out["R"], sample["R_gt"]),
                 "rte": metrics.isotropic_t_error(out["t"], sample["t_gt"])}
        return total, (updates["batch_stats"], parts)

    (loss, (bs, parts)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads).replace(batch_stats=bs)
    return state, {"loss": loss, **parts}


def train(key: jax.Array, cfg: LepardTrainConfig = LepardTrainConfig(),
          steps: int = 100, log_every: int = 10, data=None,
          ckpt_dir: str | None = None, log_dir: str | None = None,
          resume: bool = False, save_every: int = 100):
    """Driver (correspondence/lib/trainer.py:17-275 train/val loop with
    snapshotting — here via train.loop.TrainHooks).

    data: path to a 4DMatch-contract npz directory (streams
    data.fourdmatch.FourDMatchPairs train split) or any indexable of
    FourDMatchPairs-shaped rows; None streams generated deformed pairs.
    """
    from pointcloudregistration_tpu.train.loop import TrainHooks
    if isinstance(data, str):
        data = fourdmatch.FourDMatchPairs(data, "train",
                                          max_points=cfg.n_points)
    state = create_train_state(jax.random.fold_in(key, 0), cfg)
    hooks = TrainHooks(ckpt_dir, log_dir, "lepard", save_every)
    start = 0
    if resume:
        state, start = hooks.restore(state)
    hist = []
    for step in range(start, steps):
        kd, kl = jax.random.split(jax.random.fold_in(key, step + 1))
        if data is None:
            sample = make_sample(kd, cfg)
        else:
            sample = sample_from_item(data[step % len(data)], cfg)
        state, m = train_step(state, kl, sample, cfg)
        if (step % log_every == 0 or step == steps - 1
                or (step + 1) % save_every == 0):
            mf = {k: float(v) for k, v in m.items()}
            hist.append(mf)
            hooks.log(step, mf)
            hooks.step_end(step, state, mf, steps)
    hooks.close()
    return state, hist


@partial(jax.jit, static_argnames=("cfg", "inlier_thr", "fine_k",
                                   "min_keep", "soft_tau"))
def estimate_landmarks(state: LepardTrainState, source: jax.Array,
                       target: jax.Array, source_mask=None, target_mask=None,
                       cfg: LepardTrainConfig = LepardTrainConfig(),
                       inlier_thr: float = 0.5, fine_k: int = 8,
                       min_keep: int = 0, soft_tau: float = 0.0):
    """Landmark_Model.inference parity (landmark_estimator.py:46-75):
    forward the matcher, keep matches the outlier-rejection net accepts,
    then refine each accepted coarse match to fine (level-0) resolution:
    among the fine_k nearest level-0 target points of a coarse landmark,
    pick the one whose fine (KPFCN decoder) feature best matches the source
    landmark's fine feature — the coarse->fine matching split.

    Returns dict(ldmk_src (L,3), ldmk_tgt (L,3), ldmk_mask (L,), R, t,
    src_idx (L,) — NN index of each landmark into the full source cloud for
    models/ndp.fit's ldmk_idx contract).
    """
    pyr_s = build_pyramid(source, source_mask, cfg.pyramid)
    pyr_t = build_pyramid(target, target_mask, cfg.pyramid)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        pyr_s, pyr_t, train=False)
    keep = (out["match_mask"] & (out["inlier_confidence"] > inlier_thr)
            & out["coarse_src_mask"])
    if min_keep > 0:
        # fallback: when the confidence gate keeps fewer than min_keep
        # landmarks, take the top-min_keep extracted matches by rejection
        # confidence instead (a landmark budget; quality is reported by the
        # caller's landmark-inlier-rate metric)
        conf = jnp.where(out["match_mask"] & out["coarse_src_mask"],
                         out["inlier_confidence"], -1.0)
        thresh = -jnp.sort(-conf)[min_keep - 1]
        topk = conf >= jnp.maximum(thresh, 0.0)
        keep = jnp.where(jnp.sum(keep) >= min_keep, keep,
                         topk & out["match_mask"] & out["coarse_src_mask"])
    p0_s, m0_s = pyr_s["points"][0], pyr_s["masks"][0]
    p0_t, m0_t = pyr_t["points"][0], pyr_t["masks"][0]
    # fine refinement in the source cloud: nearest level-0 point
    _, src0 = knn_ops.nn_search(out["ldmk_src"], p0_s, ref_mask=m0_s)
    f_s = out["fine_feats_src"][src0]                       # (L, C)
    # candidate fine targets around the coarse target landmark
    _, cand = knn_ops.knn(out["ldmk_tgt"], p0_t, fine_k, ref_mask=m0_t)
    f_t = out["fine_feats_tgt"][cand]                       # (L, k, C)
    f_s = f_s / (jnp.linalg.norm(f_s, axis=-1, keepdims=True) + 1e-8)
    f_t = f_t / (jnp.linalg.norm(f_t, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("lc,lkc->lk", f_s, f_t,
                     precision=jax.lax.Precision.HIGHEST)
    cand_valid = jnp.take_along_axis(
        jnp.broadcast_to(m0_t[None], (sim.shape[0], m0_t.shape[0])),
        cand, -1)
    sim = jnp.where(cand_valid, sim, -1e9)
    bestk = jnp.argmax(sim, -1)
    fine_sim = jnp.take_along_axis(sim, bestk[:, None], -1)[:, 0]
    fine_tgt_idx = jnp.take_along_axis(cand, bestk[:, None], -1)[:, 0]
    ldmk_src = p0_s[src0]
    if soft_tau > 0.0:
        # soft fine refinement: instead of committing to the single
        # best-similarity candidate, take the similarity-softmax barycenter
        # of the fine candidates — sub-point landmark precision, the same
        # expectation trick Lepard's fine matching uses over local windows
        # (correspondence/lepard/matching.py fine expectation). Cuts the
        # coarse-voxel quantization error without retraining.
        att = jax.nn.softmax(sim / soft_tau, axis=-1)
        ldmk_tgt = jnp.einsum("lk,lkc->lc", att, p0_t[cand],
                              precision=jax.lax.Precision.HIGHEST)
    else:
        ldmk_tgt = p0_t[fine_tgt_idx]
    # map fine landmark sources to their nearest full-cloud index
    _, src_idx = knn_ops.nn_search(ldmk_src, source, ref_mask=source_mask)
    return {"ldmk_src": ldmk_src, "ldmk_tgt": ldmk_tgt,
            "coarse_ldmk_src": out["ldmk_src"],
            "coarse_ldmk_tgt": out["ldmk_tgt"],
            "ldmk_mask": keep, "src_idx": src_idx,
            "match_mask": out["match_mask"],
            "fine_sim": fine_sim,
            "R": out["R"], "t": out["t"],
            "inlier_confidence": out["inlier_confidence"]}


def register_pair_lndp(state: LepardTrainState, key: jax.Array,
                       source: jax.Array, target: jax.Array,
                       source_mask=None, target_mask=None,
                       cfg: LepardTrainConfig = LepardTrainConfig(),
                       ndp_cfg: ndp_mod.NDPConfig | None = None,
                       inlier_thr: float = 0.5, w_ldmk: float = 1.0,
                       icp_dist: float = 0.1, min_keep: int = 0,
                       fine_k: int = 32, soft_tau: float = 0.0,
                       use_neco_weight: bool = False,
                       disp_gate: float = 0.0):
    """LNDP: landmark estimation -> rigid pre-align -> landmark-guided NDP
    (c2p-net/config/LNDP.yaml flow; registration.py:210-227 landmark loss).

    fine_k: candidate count for the coarse->fine refinement — must be
    large enough that a coarse voxel's worth of level-0 points is covered
    (the coarse level is first_voxel*2^3 wide).
    """
    if ndp_cfg is None:
        ndp_cfg = ndp_mod.NDPConfig(m=5, k0=-3, width=64, iters=30,
                                    data_cap=None)
    lm = estimate_landmarks(state, source, target, source_mask, target_mask,
                            cfg, inlier_thr, min_keep=min_keep,
                            fine_k=fine_k, soft_tau=soft_tau)
    R, t, _ = icp_mod.icp(source, target, icp_dist, iters=15,
                          R0=lm["R"], t0=lm["t"],
                          src_mask=source_mask, tgt_mask=target_mask)
    aligned = se3.transform(source, R, t)
    # kept landmarks weighted by fine-similarity confidence: noisy
    # landmarks contribute proportionally less to the LNDP cost.
    # use_neco_weight additionally multiplies by the outlier-rejection
    # confidence — the weight NeCo was trained to be
    # (outlier_rejection/pipeline.py:41-77 sigmoid confidence).
    ldmk_w = lm["ldmk_mask"] * jnp.clip(lm["fine_sim"], 0.0, 1.0)
    if use_neco_weight:
        ldmk_w = ldmk_w * jnp.clip(lm["inlier_confidence"], 0.0, 1.0)
    if disp_gate > 0.0:
        # geometric gate: after the rigid pre-align, a true landmark's
        # residual displacement is bounded by the deformation amplitude;
        # gross mismatches (vessel-branch confusion) sit far outside it.
        # Measured (r04, 6 held-out pairs): gate 0.08 lifts the landmark
        # inlier rate 0.43 -> 0.73 — the same role the reference's NeCo
        # confidence threshold plays, applied in metric space.
        disp = jnp.linalg.norm(
            se3.transform(lm["ldmk_src"], R, t) - lm["ldmk_tgt"], axis=-1)
        ldmk_w = ldmk_w * (disp < disp_gate)
        lm = dict(lm)
        lm["ldmk_mask"] = lm["ldmk_mask"] & (disp < disp_gate)
    warped, aux = ndp_mod.fit(key, aligned, target, ndp_cfg,
                              data_mask=source_mask, tgt_mask=target_mask,
                              ldmk_idx=lm["src_idx"],
                              ldmk_tgt=lm["ldmk_tgt"], w_ldmk=w_ldmk,
                              ldmk_mask=ldmk_w)
    cd = knn_ops.chamfer(warped, target, source_mask, target_mask, sqrt=True)
    return {"R": R, "t": t, "warped": warped, "chamfer_nonrigid": cd,
            "landmarks": lm, "ndp_losses": aux["losses"]}
