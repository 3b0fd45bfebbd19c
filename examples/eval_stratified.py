"""Stratified learned-vs-classical evaluation on KNOWN-ground-truth pairs.

VERDICT r04 item 3: the v2 corpus eval could not distinguish learned from
classical because its ground truth was itself produced by FPFH+RANSAC —
circular in classical's favor, and gated to poses FPFH can solve. Here
ground truth is the generating transform by construction (no RANSAC
ground-truthing, no symmetric-pose gate), so strata can include exactly
the regimes where FPFH's fitness collapses:

  moderate      per-axis <=90 deg rotations (the corpus regime)
  full_so3      uniform SO(3) — the vessel tree's near-symmetries bite
  low_overlap   moderate pose + half-space crops on both clouds
  so3_low_ovl   both stressors

Methods: classical FPFH->RANSAC->ICP (pipelines.c2p), learned NgeNet
features->vote->RANSAC->ICP (pipelines.ngenet.register, trained dense
checkpoint), and DIP descriptors->RANSAC (pipelines.dip, trained
checkpoint) — the reference's three rigid methods (testScript.py:126-206,
demo.py:37-202, RANSAC.py:66-132).

Usage: python examples/eval_stratified.py [n_per_stratum] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu import metrics
from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import augment, synthetic
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu.pipelines import dataprep
from pointcloudregistration_tpu.pipelines import dip
from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.checkpoint import CheckpointManager

_OBJ = ("/root/reference/DataPreparation/OriginalData/"
        "PCMRI_ww25_Cow_v4_final.obj")
N_POINTS = 2048


def make_stratum_pair(key, base, stratum: str):
    """One known-GT pair. Returns (src, sm, tgt, tm, R_gt, t_gt):
    transform(src, R_gt, t_gt) aligns src onto tgt's frame."""
    kv, kr, kt, kc1, kc2 = jax.random.split(key, 5)
    views = synthetic.modality_views(kv, N_POINTS, base=base,
                                    deform_amp=0.05)
    tof, pc, pc_mask = views["tof"], views["pc"], views["pc_mask"]
    if stratum.startswith("full_so3") or stratum == "so3_low_ovl":
        R = se3.random_uniform_rotation(kr)
        t = jax.random.uniform(kt, (3,), minval=-0.5, maxval=0.5)
    else:
        R, t = se3.random_se3(kr, (), max_angle_deg=90.0, max_trans=0.5)
    Ri, ti = se3.invert(R, t)
    src = se3.transform(tof, Ri, ti)
    sm = jnp.ones(src.shape[:-1], bool)
    tm = pc_mask
    if stratum in ("low_overlap", "so3_low_ovl"):
        sm = sm & augment.crop_halfspace(kc1, src, keep_ratio=0.6)
        tm = tm & augment.crop_halfspace(kc2, pc, keep_ratio=0.7)
    return src, sm, pc, tm, R, t


def main():
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    out_json = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/stratified_eval.json"

    base = dataprep.phantom_from_obj(jax.random.PRNGKey(0), _OBJ,
                                     n_points=N_POINTS, sample_frac=0.5)

    # learned NgeNet (dense checkpoint)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_accuracy import calibrated_cfg
    pkl = os.environ.get("NGENET_PKL",
                         "artifacts/data/RANSACTraincropped_real_v3.pickle")
    ckpt = os.environ.get("NGENET_CKPT", "artifacts/ngenet_real_v3")
    ncfg = calibrated_cfg(pkl)
    nstate = ng.create_train_state(jax.random.PRNGKey(0), ncfg)
    nstate = CheckpointManager(ckpt).restore(nstate)
    assert nstate is not None, f"no NgeNet checkpoint in {ckpt}"

    # DIP (trained checkpoint)
    dcfg = dip.DIPConfig(n_points=N_POINTS)
    dstate = CheckpointManager(
        os.environ.get("DIP_CKPT", "artifacts/dip_real")).restore(
        dip.create_train_state(jax.random.PRNGKey(1), dcfg))

    ccfg = c2p.C2PConfig(run_ndp=False)
    strata = ["moderate", "full_so3", "low_overlap", "so3_low_ovl"]
    table, rows = {}, []
    for stratum in strata:
        errs = {"classical": [], "learned": [], "dip": []}
        rtes = {"classical": [], "learned": [], "dip": []}
        for i in range(n_per):
            key = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(31), hash(stratum) % (2**30)), i)
            src, sm, tgt, tm, R_gt, t_gt = make_stratum_pair(
                jax.random.fold_in(key, 0), base, stratum)
            kc, kl, kd = jax.random.split(jax.random.fold_in(key, 1), 3)

            out_c = c2p.register_pair(kc, src, tgt, sm, tm, ccfg)
            errs["classical"].append(float(metrics.isotropic_R_error(
                out_c["R"], R_gt)))
            rtes["classical"].append(float(metrics.isotropic_t_error(
                out_c["t"], t_gt)))

            out_l = ng.register(nstate, kl, src, tgt, sm, tm, ncfg)
            errs["learned"].append(float(metrics.isotropic_R_error(
                out_l["R"], R_gt)))
            rtes["learned"].append(float(metrics.isotropic_t_error(
                out_l["t"], t_gt)))

            if dstate is not None:
                R_d, t_d, _ = dip.register(dstate, kd, src, tgt, dcfg,
                                           source_mask=sm, target_mask=tm)
                errs["dip"].append(float(metrics.isotropic_R_error(
                    R_d, R_gt)))
                rtes["dip"].append(float(metrics.isotropic_t_error(
                    t_d, t_gt)))
            rows.append({"stratum": stratum, "pair": i,
                         **{f"rre_{m}": errs[m][-1] for m in errs
                            if errs[m]},
                         **{f"rte_{m}": rtes[m][-1] for m in rtes
                            if rtes[m]}})
            print(json.dumps({k: (round(v, 3) if isinstance(v, float)
                                  else v) for k, v in rows[-1].items()}),
                  flush=True)
        table[stratum] = {}
        for m in errs:
            if not errs[m]:
                continue
            e = np.asarray(errs[m])
            table[stratum][m] = {
                "median_rre_deg": round(float(np.median(e)), 3),
                "recall_re15": round(float((e < 15.0).mean()), 4),
                "median_rte": round(float(np.median(rtes[m])), 4),
            }
        print(json.dumps({stratum: table[stratum]}), flush=True)

    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as f:
        json.dump({"n_per_stratum": n_per, "table": table, "pairs": rows},
                  f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
