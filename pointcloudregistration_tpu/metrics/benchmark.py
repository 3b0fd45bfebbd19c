"""3DMatch-style registration-recall benchmark over trajectory logs.

Parity with c2p-net/ngenet/metrics/threedmatch.py:47-201 (`Metric.benchmark`):
parse est.log / gt.log trajectory files (Redwood format: header line
"id0 id1 total" followed by a 4x4 transform), optionally gt.info covariance
files, and score registration recall with RE/TE gates.
"""

from __future__ import annotations

import numpy as np

from pointcloudregistration_tpu.metrics.registration import (
    isotropic_R_error, isotropic_t_error)


def read_trajectory_log(path: str):
    """Redwood .log -> list of ((id0, id1, total), 4x4 ndarray)."""
    entries = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        header = tuple(int(x) for x in lines[i].split()[:3])
        mat = np.array([[float(v) for v in lines[i + 1 + r].split()]
                        for r in range(4)])
        entries.append((header, mat))
        i += 5
    return entries


def write_trajectory_log(path: str, entries):
    with open(path, "w") as f:
        for (i0, i1, total), mat in entries:
            f.write(f"{i0}\t{i1}\t{total}\n")
            for row in mat:
                f.write("\t".join(f"{v:.8f}" for v in row) + "\n")


def registration_recall_from_logs(est_path: str, gt_path: str,
                                  re_thresh_deg: float = 15.0,
                                  te_thresh: float = 0.3):
    """Score est.log against gt.log with the reference's gates
    (threedmatch.py:50-52: RE < 15 deg, TE < 30 cm). Returns dict with
    recall, per-pair RE/TE arrays, and the evaluated pair count."""
    est = {h[:2]: m for h, m in read_trajectory_log(est_path)}
    gt = {h[:2]: m for h, m in read_trajectory_log(gt_path)}
    common = sorted(set(est) & set(gt))
    res, tes = [], []
    for k in common:
        Re, te_ = est[k][:3, :3], est[k][:3, 3]
        Rg, tg = gt[k][:3, :3], gt[k][:3, 3]
        res.append(float(isotropic_R_error(Re[None], Rg[None])[0]))
        tes.append(float(np.linalg.norm(te_ - tg)))
    res, tes = np.array(res), np.array(tes)
    ok = (res < re_thresh_deg) & (tes < te_thresh)
    return {"recall": float(ok.mean()) if len(ok) else 0.0,
            "re_deg": res, "te": tes, "n_pairs": len(common)}
