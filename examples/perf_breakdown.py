"""Per-stage timing of the classical C2P pipeline on one TPU chip.

Produces the PERF.md breakdown: FPFH features, RANSAC, ICP, and NDP timed
separately (each as its own jitted program, synchronized by host readback),
at both the fast NDP config (C2PConfig default) and the reference-parity NDP
config (m=9, width=128, iters<=40, k0=-8 — c2p-net/config/NDP.yaml:8-24).

Run: python examples/perf_breakdown.py [batch] [n_points]
Prints one JSON document.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models import ndp as ndp_mod
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import ransac as ransac_mod
from pointcloudregistration_tpu.pipelines import c2p

# True reference parity: untruncated data term (trunc=1e9 — the reference's
# effective setting, registration.py:236 via NDP.yaml which sets no
# truncation) on the FULL inlier set (data_cap=None), pyramid shape m=9 /
# width=128 / iters<=40 / k0=-8 per c2p-net/config/NDP.yaml:8-24.
PARITY_NDP = ndp_mod.NDPConfig(m=9, k0=-8, depth=3, width=128, iters=40,
                               lr=0.01, w_reg=0.005, trunc=1e9,
                               data_cap=None)


def timed(fn, args, n_rep=5, sync=None):
    out = fn(*args)
    if sync is None:
        sync = lambda o: float(jnp.sum(jax.tree.leaves(o)[0]))
    sync(out)                       # compile + first run
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / n_rep, out


def learned_breakdown(ckpt_dir: str, pkl: str, batch: int):
    """Stage timing of the learned C2P path (pyramid build, NgeNet forward,
    vote, RANSAC-on-corrs, ICP, NDP) on real-phantom test pairs. The
    reference hot path this profiles: ngenet/models/KPConv/blocks.py:73-128
    (encoder gathers) + testScript.py:126-206 (inference chain)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_accuracy import calibrated_cfg, N_POINTS
    from pointcloudregistration_tpu.data.mri import NgeNetPairs
    from pointcloudregistration_tpu.models.ngenet import vote
    from pointcloudregistration_tpu.pipelines import ngenet as ng
    from pointcloudregistration_tpu.train.checkpoint import CheckpointManager

    cfg = calibrated_cfg(pkl)
    state = ng.create_train_state(jax.random.PRNGKey(0), cfg)
    state = CheckpointManager(ckpt_dir).restore(state)
    if state is None:
        return {"error": f"no checkpoint in {ckpt_dir}"}

    ds = NgeNetPairs(pkl, "test", max_points=cfg.n_points)
    n = min(batch, len(ds))
    import numpy as np
    src = jnp.asarray(np.stack(
        [ng._pad_cloud(ds[i]["src_points"], N_POINTS)[0] for i in range(n)]))
    sm = jnp.asarray(np.stack(
        [ng._pad_cloud(ds[i]["src_points"], N_POINTS)[1] for i in range(n)]))
    tgt = jnp.asarray(np.stack(
        [ng._pad_cloud(ds[i]["tgt_points"], N_POINTS)[0] for i in range(n)]))
    tm = jnp.asarray(np.stack(
        [ng._pad_cloud(ds[i]["tgt_points"], N_POINTS)[1] for i in range(n)]))
    out = {"batch": n, "n_points": N_POINTS, "stages_ms_per_pair": {}}

    def per_pair(dt):
        return round(dt / n * 1e3, 3)

    pyr = jax.jit(jax.vmap(
        lambda p, m: ng._pyramid_with_normals(p, m, cfg.pyramid,
                                              cfg.model.dense)))
    dt, (pyr_s, n_s) = timed(pyr, (src, sm),
                             sync=lambda o: float(jnp.sum(o[1])))
    out["stages_ms_per_pair"]["pyramid_per_cloud"] = per_pair(dt)
    pyr_t, n_t = pyr(tgt, tm)

    fwd = jax.jit(jax.vmap(lambda ps, pt, a, b: state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        ps, pt, a, b, train=False)))
    dt, (out_s, out_t) = timed(
        fwd, (pyr_s, pyr_t, n_s, n_t),
        sync=lambda o: float(jnp.sum(o[0]["feats_h"][..., 0])))
    out["stages_ms_per_pair"]["ngenet_forward_pair"] = per_pair(dt)

    votef = jax.jit(jax.vmap(lambda ps, pt, a, b, ms, mt: vote(
        ps["points"][0], pt["points"][0], a, b, cfg.pyramid.first_voxel,
        ms, mt)))
    dt, (sel, corr_idx, feats_h) = timed(
        votef, (pyr_s, pyr_t, out_s, out_t,
                jax.tree.map(lambda x: x, pyr_s["masks"][0]),
                pyr_t["masks"][0]),
        sync=lambda o: float(jnp.sum(o[1])))
    out["stages_ms_per_pair"]["vote"] = per_pair(dt)

    from pointcloudregistration_tpu.ops import icp as icp_mod2
    from pointcloudregistration_tpu.ops import ransac as ransac_mod2
    thresh = cfg.pyramid.first_voxel * 2.0
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    ransf = jax.jit(jax.vmap(lambda k, ps, ptc, s: \
        ransac_mod2.ransac_correspondences(
            k, ps, ptc, threshold=thresh, num_hypotheses=8192, corr_mask=s)))
    p0_s = pyr_s["points"][0]
    p0_t = pyr_t["points"][0]
    ptc = jnp.take_along_axis(p0_t, corr_idx[..., None], axis=-2)
    dt, (R0, t0_, rinfo) = timed(
        ransf, (keys, p0_s, ptc, sel),
        sync=lambda o: float(jnp.sum(o[0])))
    out["stages_ms_per_pair"]["ransac_corr"] = per_pair(dt)

    icpf = jax.jit(jax.vmap(lambda s, t, r0, tt0, ms, mt: icp_mod2.icp(
        s, t, thresh, iters=20, R0=r0, t0=tt0, src_mask=ms, tgt_mask=mt,
        max_dist_final=cfg.pyramid.first_voxel)))
    dt, _ = timed(icpf, (p0_s, p0_t, R0, t0_,
                         pyr_s["masks"][0], pyr_t["masks"][0]),
                  sync=lambda o: float(jnp.sum(o[0])))
    out["stages_ms_per_pair"]["icp"] = per_pair(dt)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    cfg = c2p.C2PConfig()
    key = jax.random.PRNGKey(0)
    data = synthetic.make_batch(key, batch, n_points=n_points,
                                max_angle_deg=45.0, max_trans=0.5,
                                deform_amp=0.05)
    S, T = data["source"], data["target"]
    SM, TM = data["source_mask"], data["target_mask"]
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    report = {"batch": batch, "n_points": n_points, "stages_ms_per_pair": {}}

    def per_pair(dt):
        return round(dt / batch * 1e3, 3)

    # --- stage 1: FPFH features (normals + histograms) ---
    feats = jax.jit(jax.vmap(lambda p, m: c2p._features(p, m, cfg)))
    dt, f_src = timed(feats, (S, SM),
                      sync=lambda o: float(jnp.sum(o[..., 0, 0])))
    report["stages_ms_per_pair"]["fpfh_per_cloud"] = per_pair(dt)
    f_tgt = feats(T, TM)

    # --- stage 2: RANSAC on feature matches ---
    rans = jax.jit(jax.vmap(
        lambda k, s, t, fs, ft, sm, tm: ransac_mod.ransac_feature_matching(
            k, s, t, fs, ft, threshold=cfg.ransac_thresh,
            num_hypotheses=cfg.ransac_hypotheses, mutual=cfg.mutual,
            src_mask=sm, tgt_mask=tm)))
    dt, (R0, t0_, rinfo) = timed(
        rans, (keys, S, T, f_src, f_tgt, SM, TM),
        sync=lambda o: float(jnp.sum(o[0]) + jnp.sum(o[1])))
    report["stages_ms_per_pair"]["ransac"] = per_pair(dt)

    # --- stage 3: ICP polish ---
    icpf = jax.jit(jax.vmap(
        lambda s, t, r0, tt0, sm, tm: icp_mod.icp(
            s, t, cfg.icp_dist, iters=cfg.icp_iters, R0=r0, t0=tt0,
            src_mask=sm, tgt_mask=tm, max_dist_final=cfg.icp_dist_final)))
    dt, (R, t, iinfo) = timed(
        icpf, (S, T, R0, t0_, SM, TM),
        sync=lambda o: float(jnp.sum(o[0]) + jnp.sum(o[1])))
    report["stages_ms_per_pair"]["icp"] = per_pair(dt)

    aligned = jax.jit(jax.vmap(
        lambda s, r, tt: s @ r.swapaxes(-1, -2) + tt))(S, R, t)

    # --- stage 4: NDP at fast and parity configs ---
    for name, ncfg in (("ndp_fast", cfg.ndp), ("ndp_parity", PARITY_NDP)):
        ndpf = jax.jit(lambda k, s, t, dm, tm, _c=ncfg: ndp_mod.fit_batch(
            k, s, t, _c, data_mask=dm, tgt_mask=tm))
        dm = jnp.asarray(rinfo["inliers"]) & SM
        dt, (warped, aux) = timed(
            ndpf, (jax.random.PRNGKey(2), aligned, T, dm, TM),
            sync=lambda o: float(jnp.sum(o[0][..., 0, 0])))
        cd = float(jnp.mean(jax.vmap(
            lambda w, tt, sm, tm: knn_ops.chamfer(w, tt, sm, tm, sqrt=True))(
            warped, T, SM, TM)))
        steps = jnp.sum(aux["level_steps"], -1) if "level_steps" in aux \
            else None
        report["stages_ms_per_pair"][name] = per_pair(dt)
        report[name] = {
            "chamfer": round(cd, 6),
            "mean_total_adam_steps": (None if steps is None
                                      else float(jnp.mean(steps))),
            "config": {"m": ncfg.m, "width": ncfg.width,
                       "iters": ncfg.iters, "k0": ncfg.k0,
                       "data_cap": ncfg.data_cap,
                       "max_break_count": ncfg.max_break_count},
        }
        # early-stop off, for the early-stop win measurement
        ncfg_off = ncfg._replace(max_break_count=0)
        ndpf_off = jax.jit(lambda k, s, t, dm_, tm, _c=ncfg_off:
                           ndp_mod.fit_batch(k, s, t, _c, data_mask=dm_,
                                             tgt_mask=tm))
        dt_off, _ = timed(ndpf_off,
                          (jax.random.PRNGKey(2), aligned, T, dm, TM),
                          sync=lambda o: float(jnp.sum(o[0][..., 0, 0])))
        report[name]["ms_per_pair_no_earlystop"] = per_pair(dt_off)

    # --- learned-path stage breakdown (VERDICT r03 item 4) ---
    import os
    ckpt_dir = os.environ.get("NGENET_CKPT", "artifacts/ngenet_real_v3")
    pkl = os.environ.get("NGENET_PKL",
                         "artifacts/data/RANSACTraincropped_real_v3.pickle")
    if os.path.isdir(ckpt_dir) and os.path.exists(pkl):
        report["learned"] = learned_breakdown(ckpt_dir, pkl, batch)

    # --- end-to-end at both NDP configs ---
    for name, ncfg in (("e2e_fast", cfg.ndp), ("e2e_parity", PARITY_NDP)):
        ccfg = cfg._replace(ndp=ncfg)
        step = jax.jit(lambda k, s, t, sm, tm, _c=ccfg: c2p.register_batch(
            k, s, t, sm, tm, _c))
        dt, out = timed(step, (jax.random.PRNGKey(3), S, T, SM, TM),
                        sync=lambda o: float(jnp.sum(o["chamfer_nonrigid"])
                                             + jnp.sum(o["R"])))
        report[name] = {
            "ms_per_pair": per_pair(dt),
            "pairs_per_sec": round(batch / dt, 3),
            "chamfer_nonrigid": round(
                float(jnp.mean(out["chamfer_nonrigid"])), 6),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
