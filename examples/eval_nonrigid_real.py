"""Where does the non-rigid stage earn its place on REAL phantom data?

VERDICT r04 item 2 follow-through. The v3 corpus carries deform_amp=0.05,
and the 234-pair eval shows NDP improving only ~10% of pairs there: at
amp 0.05 the truncated-chamfer metric is dominated by the sampling/noise
floor (~0.02 for 2048-pt unit-cube clouds with pc jitter 0.010), so the
no-harm guard correctly keeps the rigid result. This study sweeps the
modality-disagreement amplitude on the REAL phantom mesh and reports the
validationScript.py:335-341 metric set per amplitude — CD unregistered /
rigid-registered / NDP-registered, the per-pair improvement fraction,
and the relative chamfer gain — locating the regime where the
deformation signal rises above the floor and NDP becomes load-bearing.

Pairs are generated exactly like the corpus (modality_views on the
phantom_from_obj base, known SE(3) disorientation) and registered with
the full classical C2P (FPFH -> RANSAC -> ICP -> NDP); the NDP stage is
identical in the learned path.

Usage: python examples/eval_nonrigid_real.py [n_pairs_per_amp] [out]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu.pipelines import dataprep

_OBJ = ("/root/reference/DataPreparation/OriginalData/"
        "PCMRI_ww25_Cow_v4_final.obj")
N_POINTS = 2048
AMPS = (0.0, 0.05, 0.10, 0.15, 0.20)


def main():
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out_json = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/nonrigid_real_sweep.json"
    base = dataprep.phantom_from_obj(jax.random.PRNGKey(0), _OBJ,
                                     n_points=N_POINTS, sample_frac=0.5)
    ccfg = c2p.C2PConfig()
    table, rows = {}, []
    for amp in AMPS:
        cd_u, cd_r, cd_n, imp = [], [], [], []
        for i in range(n_per):
            key = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(97), int(amp * 1000)), i)
            kv, kr, kreg = jax.random.split(key, 3)
            views = synthetic.modality_views(kv, N_POINTS, base=base,
                                             deform_amp=amp)
            R, t = se3.random_se3(kr, (), max_angle_deg=90.0,
                                  max_trans=0.5)
            Ri, ti = se3.invert(R, t)
            src = se3.transform(views["tof"], Ri, ti)
            sm = jnp.ones(src.shape[:-1], bool)
            tgt, tm = views["pc"], views["pc_mask"]
            out = c2p.register_pair(kreg, src, tgt, sm, tm, ccfg)
            cd_u.append(float(jnp.mean(knn_ops.chamfer(src, tgt, sm, tm,
                                                       sqrt=True))))
            cd_r.append(float(out["chamfer_rigid"]))
            cd_n.append(float(out["chamfer_nonrigid"]))
            imp.append(float(out["ndp_improved"]))
            rows.append({"amp": amp, "pair": i, "cd_unreg": cd_u[-1],
                         "cd_rigid": cd_r[-1], "cd_ndp": cd_n[-1],
                         "ndp_improved": imp[-1]})
        r, n = np.asarray(cd_r), np.asarray(cd_n)
        table[str(amp)] = {
            "cd_unregistered_median": round(float(np.median(cd_u)), 4),
            "cd_rigid_median": round(float(np.median(r)), 4),
            "cd_ndp_median": round(float(np.median(n)), 4),
            "ndp_improved_frac": round(float(np.mean(imp)), 4),
            "median_rel_gain": round(float(np.median(
                (r - n) / np.maximum(r, 1e-9))), 4),
        }
        print(json.dumps({str(amp): table[str(amp)]}), flush=True)
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as f:
        json.dump({"n_per_amp": n_per, "table": table, "pairs": rows}, f,
                  indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
