"""Pipeline-overlap study: can phase-shifting batch halves beat XLA?

VERDICT r04 item 6. The classical C2P e2e sits between max(stage) and
sum(stages) (PERF.md): the suggestion was to double-buffer pairs so the
"VPU-bound" NDP of half A overlaps the "MXU-bound" FPFH of half B.

The TPU execution model constrains what that can mean: a TensorCore runs
ONE op at a time from a linearized HLO schedule — there is no concurrent
dispatch of two independent HLO ops onto MXU and VPU; overlap exists
only (a) inside a fused op / Pallas kernel pipeline and (b) between
compute and DMA. So "overlapping stages" can only change the linear
order the latency-hiding scheduler picks. This script measures three
orders on identical inputs:

  vanilla   register_batch (vmap over all pairs; XLA picks the order)
  phased    stages of half A and half B traced interleaved
            (FPFH_A, FPFH_B, RANSAC_A, ..., NDP_B) — a hint, not a bind
  barrier   the interleave FORCED with jax.lax.optimization_barrier ties
            (stage s of half B cannot be scheduled before stage s-1 of
            half A and vice versa) — an actual double-buffer schedule

Run: python examples/pipeline_overlap_study.py [batch] [n_points]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models import ndp as ndp_mod
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import ransac as ransac_mod
from pointcloudregistration_tpu.pipelines import c2p


def _stage_feats(S, SM, cfg):
    return jax.vmap(lambda p, m: c2p._features(p, m, cfg))(S, SM)


def _stage_rigid(keys, S, T, fS, fT, SM, TM, cfg):
    R0, t0, rinfo = jax.vmap(
        lambda k, s, t, fs, ft, sm, tm: ransac_mod.ransac_feature_matching(
            k, s, t, fs, ft, threshold=cfg.ransac_thresh,
            num_hypotheses=cfg.ransac_hypotheses, mutual=cfg.mutual,
            src_mask=sm, tgt_mask=tm))(keys, S, T, fS, fT, SM, TM)
    R, t, _ = jax.vmap(
        lambda s, t_, r0, tt0, sm, tm: icp_mod.icp(
            s, t_, cfg.icp_dist, iters=cfg.icp_iters, R0=r0, t0=tt0,
            src_mask=sm, tgt_mask=tm,
            max_dist_final=cfg.icp_dist_final))(S, T, R0, t0, SM, TM)
    return R, t, rinfo["inliers"]


def _stage_ndp(keys, S, T, R, t, inl, SM, TM, cfg):
    aligned = jax.vmap(se3.transform)(S, R, t)
    warped, _ = ndp_mod.fit_batch(keys[0], aligned, T, cfg.ndp,
                                  data_mask=inl & SM, tgt_mask=TM)
    return jax.vmap(lambda w, t_, sm, tm: knn_ops.chamfer(
        w, t_, sm, tm, sqrt=True))(warped, T, SM, TM)


def _tie(x, dep):
    """Make every leaf of x artificially depend on dep (scheduling fence)."""
    z = jnp.sum(dep) * 0.0
    return jax.tree.map(lambda a: a + z.astype(a.dtype), x)


@partial(jax.jit, static_argnames=("cfg", "mode"))
def run(key, S, T, SM, TM, cfg: c2p.C2PConfig, mode: str):
    B = S.shape[0]
    keys = jax.random.split(key, B)
    if mode == "vanilla":
        out = c2p.register_batch(key, S, T, SM, TM, cfg)
        return out["chamfer_nonrigid"]
    h = B // 2
    Sa, Sb = S[:h], S[h:]
    Ta, Tb = T[:h], T[h:]
    SMa, SMb = SM[:h], SM[h:]
    TMa, TMb = TM[:h], TM[h:]
    ka, kb = keys[:h], keys[h:]
    if mode == "phased":
        fSa = _stage_feats(Sa, SMa, cfg)
        fTa = _stage_feats(Ta, TMa, cfg)
        fSb = _stage_feats(Sb, SMb, cfg)
        fTb = _stage_feats(Tb, TMb, cfg)
        Ra, ta, ia = _stage_rigid(ka, Sa, Ta, fSa, fTa, SMa, TMa, cfg)
        Rb, tb, ib = _stage_rigid(kb, Sb, Tb, fSb, fTb, SMb, TMb, cfg)
        cda = _stage_ndp(ka, Sa, Ta, Ra, ta, ia, SMa, TMa, cfg)
        cdb = _stage_ndp(kb, Sb, Tb, Rb, tb, ib, SMb, TMb, cfg)
        return jnp.concatenate([cda, cdb])
    # barrier: B's stage s gated on A's stage s (and A's s+1 on B's s) —
    # the explicit double-buffer schedule the VERDICT suggested
    fSa = _stage_feats(Sa, SMa, cfg)
    fTa = _stage_feats(Ta, TMa, cfg)
    (Sb2, Tb2) = _tie((Sb, Tb), fTa)             # B feats after A feats
    fSb = _stage_feats(Sb2, SMb, cfg)
    fTb = _stage_feats(Tb2, TMb, cfg)
    (Sa2,) = _tie((Sa,), fTb)                    # A rigid after B feats
    Ra, ta, ia = _stage_rigid(ka, Sa2, Ta, fSa, fTa, SMa, TMa, cfg)
    (Sb3,) = _tie((Sb,), ta)                     # B rigid after A rigid
    Rb, tb, ib = _stage_rigid(kb, Sb3, Tb, fSb, fTb, SMb, TMb, cfg)
    (Sa3,) = _tie((Sa,), tb)                     # A ndp after B rigid
    cda = _stage_ndp(ka, Sa3, Ta, Ra, ta, ia, SMa, TMa, cfg)
    (Sb4,) = _tie((Sb,), cda)                    # B ndp last
    cdb = _stage_ndp(kb, Sb4, Tb, Rb, tb, ib, SMb, TMb, cfg)
    return jnp.concatenate([cda, cdb])


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    cfg = c2p.C2PConfig()
    data = synthetic.make_batch(jax.random.PRNGKey(0), batch,
                                n_points=n_points, max_angle_deg=45.0,
                                max_trans=0.5, deform_amp=0.05)
    S, T = data["source"], data["target"]
    SM, TMm = data["source_mask"], data["target_mask"]
    key = jax.random.PRNGKey(1)
    report = {"batch": batch, "n_points": n_points}
    for mode in ("vanilla", "phased", "barrier"):
        cd = run(key, S, T, SM, TMm, cfg, mode)   # compile
        _ = float(jnp.sum(cd))
        reps = 5
        t0 = time.perf_counter()
        for _i in range(reps):
            cd = run(key, S, T, SM, TMm, cfg, mode)
            _ = float(jnp.sum(cd))
        dt = (time.perf_counter() - t0) / reps
        report[mode] = {"ms_per_pair": round(dt / batch * 1e3, 3),
                        "pairs_per_s": round(batch / dt, 2),
                        "mean_chamfer": round(float(jnp.mean(cd)), 5)}
        print(json.dumps({mode: report[mode]}), flush=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
