"""Learned-vs-classical accuracy evaluation on held-out real-phantom pairs.

The ACCURACY.md generator: runs the trained-NgeNet learned C2P
(pipelines.c2p.register_pair_learned — the faithful testScript.py:126-206
flow) and the classical C2P (FPFH+RANSAC+ICP+NDP) over the TEST split of
the real-phantom pickle and reports the reference's metric set
(validationScript.py:335-341 + ROPNet/src/eval.py:98-107 +
testScript.py:106 FMR):
  RRE / RTE (isotropic), chamfer (rigid + nonrigid), feature inlier ratio,
  FMR@0.05, registration recall (RE<15 deg), wall time.

Usage: python examples/eval_accuracy.py [ckpt_dir] [pickle] [out_json]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu import metrics
from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data.mri import NgeNetPairs
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops.pyramid import calibrate_neighbor_caps
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.checkpoint import CheckpointManager

N_POINTS = 2048


def calibrated_cfg(pkl: str) -> ng.NgeNetTrainConfig:
    """Reconstruct the training config (same deterministic calibration as
    examples/train_ngenet_real.py)."""
    import os
    cfg = ng.NgeNetTrainConfig(n_points=N_POINTS)
    if os.environ.get("NGENET_DENSE", "1") == "1":
        cfg = cfg._replace(model=cfg.model._replace(dense=True))
    ds0 = NgeNetPairs(pkl, "train", max_points=cfg.n_points)
    clouds = []
    for i in range(min(8, len(ds0))):
        it = ds0[i]
        for k in ("src_points", "tgt_points"):
            clouds.append(ng._pad_cloud(it[k], cfg.n_points))
    return cfg._replace(pyramid=calibrate_neighbor_caps(clouds, cfg.pyramid))


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "radius"))
def feature_inliers(state, cfg, src, tgt, sm, tm, T_gt, radius=0.05):
    """Mutual-NN feature-match inlier ratio at the GT alignment — the FMR
    ingredient (testScript.py:106; threedmatch.py:8-44 semantics). Jitted:
    an eager forward costs ~100 s/pair through the remote tunnel."""
    pyr_s, n_s = ng._pyramid_with_normals(src, sm, cfg.pyramid,
                                          cfg.model.dense)
    pyr_t, n_t = ng._pyramid_with_normals(tgt, tm, cfg.pyramid,
                                          cfg.model.dense)
    out_s, out_t = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        pyr_s, pyr_t, n_s, n_t, train=False)
    p_s, m_s = pyr_s["points"][0], pyr_s["masks"][0]
    p_t, m_t = pyr_t["points"][0], pyr_t["masks"][0]
    f_s, f_t = out_s["feats_h"], out_t["feats_h"]
    d_st = -jnp.einsum("nc,mc->nm", f_s, f_t)
    d_st = jnp.where(m_t[None, :], d_st, jnp.inf)
    nn_t = jnp.argmin(d_st, -1)
    nn_s = jnp.argmin(jnp.where(m_s[:, None], d_st, jnp.inf), 0)
    mutual = (nn_s[nn_t] == jnp.arange(p_s.shape[0])) & m_s
    aligned = se3.transform(p_s, jnp.asarray(T_gt[:3, :3]),
                            jnp.asarray(T_gt[:3, 3]))
    d = jnp.linalg.norm(aligned - p_t[nn_t], axis=-1)
    n_mut = jnp.maximum(jnp.sum(mutual), 1)
    return jnp.sum((d < radius) & mutual) / n_mut


def main():
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/ngenet_real"
    pkl = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/data/RANSACTraincropped_real.pickle"
    out_json = sys.argv[3] if len(sys.argv) > 3 else \
        "artifacts/accuracy_r03.json"

    cfg = calibrated_cfg(pkl)
    state = ng.create_train_state(jax.random.PRNGKey(0), cfg)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    assert state is not None, f"no checkpoint in {ckpt_dir}"
    print(f"restored step {int(state.step)}", flush=True)

    test = NgeNetPairs(pkl, "test", max_points=N_POINTS)
    print(f"test pairs: {len(test)}", flush=True)

    ccfg = c2p.C2PConfig()
    rows = []
    for i in range(len(test)):
        it = test[i]
        src, sm = ng._pad_cloud(it["src_points"], N_POINTS)
        tgt, tm = ng._pad_cloud(it["tgt_points"], N_POINTS)
        src, sm = jnp.asarray(src), jnp.asarray(sm)
        tgt, tm = jnp.asarray(tgt), jnp.asarray(tm)
        T = np.asarray(it["transf"], np.float32)
        R_gt, t_gt = jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3])
        key = jax.random.PRNGKey(100 + i)

        # unregistered chamfer — the validationScript.py:335-341 "CD
        # non-registered" column the registered numbers are judged against
        cd_unreg = float(jnp.mean(knn_ops.chamfer(src, tgt, sm, tm,
                                                  sqrt=True)))

        # learned C2P (trained NgeNet -> vote -> RANSAC -> ICP -> NDP)
        t0 = time.perf_counter()
        learned = c2p.register_pair_learned(state, key, src, tgt, sm, tm,
                                            ngenet_cfg=cfg)
        cd_l = float(learned["chamfer_nonrigid"])   # host sync
        wall_l = time.perf_counter() - t0

        # classical C2P on the same pair
        t0 = time.perf_counter()
        classical = c2p.register_pair(key, src, tgt, sm, tm, ccfg)
        cd_c = float(classical["chamfer_nonrigid"])
        wall_c = time.perf_counter() - t0

        row = {
            "chamfer_unregistered": cd_unreg,
            "ndp_improved_learned": float(learned["ndp_improved"]),
            "ndp_improved_classical": float(classical["ndp_improved"]),
            "rre_learned": float(metrics.isotropic_R_error(
                learned["R"], R_gt)),
            "rte_learned": float(metrics.isotropic_t_error(
                learned["t"], t_gt)),
            "chamfer_learned": cd_l,
            "chamfer_rigid_learned": float(jnp.mean(
                knn_ops.chamfer(se3.transform(src, learned["R"],
                                              learned["t"]),
                                tgt, sm, tm, sqrt=True))),
            "wall_learned_s": wall_l,
            "rre_classical": float(metrics.isotropic_R_error(
                classical["R"], R_gt)),
            "rte_classical": float(metrics.isotropic_t_error(
                classical["t"], t_gt)),
            "chamfer_classical": cd_c,
            "chamfer_rigid_classical": float(classical["chamfer_rigid"]),
            "wall_classical_s": wall_c,
            "feat_inlier_ratio": float(feature_inliers(state, cfg, src,
                                                       tgt, sm, tm,
                                                       jnp.asarray(T))),
        }
        rows.append(row)
        print(json.dumps({"pair": i, **{k: round(v, 4)
                                        for k, v in row.items()}}),
              flush=True)

    def agg(k):
        v = np.asarray([r[k] for r in rows])
        return {"mean": round(float(v.mean()), 4),
                "median": round(float(np.median(v)), 4),
                "max": round(float(v.max()), 4)}

    ir = np.asarray([r["feat_inlier_ratio"] for r in rows])
    rre_l = np.asarray([r["rre_learned"] for r in rows])
    rre_c = np.asarray([r["rre_classical"] for r in rows])

    def ndp_stats(path):
        """Did the non-rigid stage earn its place on this corpus?"""
        rig = np.asarray([r[f"chamfer_rigid_{path}"] for r in rows])
        non = np.asarray([r[f"chamfer_{path}"] for r in rows])
        gain = (rig - non) / np.maximum(rig, 1e-9)
        return {
            "improved_frac": round(float(np.asarray(
                [r[f"ndp_improved_{path}"] for r in rows]).mean()), 4),
            "mean_rel_chamfer_gain": round(float(gain.mean()), 4),
            "median_rel_chamfer_gain": round(float(np.median(gain)), 4),
        }

    summary = {
        "n_pairs": len(rows),
        "ckpt_step": int(state.step),
        "chamfer_unregistered": agg("chamfer_unregistered"),
        "ndp_learned": ndp_stats("learned"),
        "ndp_classical": ndp_stats("classical"),
        "learned": {k.replace("_learned", ""): agg(k) for k in
                    ("rre_learned", "rte_learned", "chamfer_learned",
                     "chamfer_rigid_learned", "wall_learned_s")},
        "classical": {k.replace("_classical", ""): agg(k) for k in
                      ("rre_classical", "rte_classical",
                       "chamfer_classical", "chamfer_rigid_classical",
                       "wall_classical_s")},
        "fmr_at_0.05": round(float((ir > 0.05).mean()), 4),
        "mean_feat_inlier_ratio": round(float(ir.mean()), 4),
        "registration_recall_re15_learned":
            round(float((rre_l < 15.0).mean()), 4),
        "registration_recall_re15_classical":
            round(float((rre_c < 15.0).mean()), 4),
    }
    with open(out_json, "w") as f:
        json.dump({"summary": summary, "pairs": rows}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
