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


def read_trajectory_info(path: str):
    """Parse a Redwood gt.info file: per pair, a header line
    "id0 id1 n_fragments" followed by a 6x6 information (inverse-covariance)
    matrix (reference: threedmatch.py:186-201 `read_trajectory_info`).
    Returns (n_fragments, dict {(id0, id1): (6,6) ndarray})."""
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    assert len(lines) % 7 == 0, f"malformed info file {path}"
    infos, n_frag = {}, 0
    for i in range(0, len(lines), 7):
        i0, i1, n_frag = (int(x) for x in lines[i].split()[:3])
        mat = np.array([[float(v) for v in lines[i + 1 + r].split()]
                        for r in range(6)])
        infos[(i0, i1)] = mat
    return n_frag, infos


def _rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """(3,3) -> (w,x,y,z), numerically safe (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def transformation_error_info(trans: np.ndarray, info: np.ndarray) -> float:
    """Predator-style covariance-weighted squared pose error: the 6-vector
    [t, imag(quat)] of the relative transform, weighted by the pair's
    information matrix, normalized by info[0,0]
    (reference: threedmatch.py:145-152 `computeTransformationErr`)."""
    t = trans[:3, 3]
    q = _rotmat_to_quat_np(trans[:3, :3])
    er = np.concatenate([t, q[1:]])
    return float(er @ info @ er / info[0, 0])


def benchmark_scene(est_entries, gt_entries, gt_infos,
                    err2: float = 0.2 ** 2, re_thresh_deg: float = 15.0,
                    te_thresh_cm: float = 30.0):
    """Score one scene's est trajectory both ways the reference does
    (threedmatch.py:99-129 `evaluate_both_recall`):

    - predator-style: over non-consecutive pairs (|i-j| > 1) only,
      success = info-weighted pose error <= err2 (0.2^2);
    - DSC-style: over all pairs, success = RE < 15 deg and TE < 30 cm.

    est/gt_entries: list of ((id0, id1, total), 4x4); gt_infos:
    {(id0, id1): (6,6)}. Returns a dict of recalls, gated RE/TE means,
    and the full per-pair RE/TE arrays.
    """
    gt_map = {h[:2]: m for h, m in gt_entries}
    res, tes, pred_ok, dsc_ok, valid_mask = [], [], [], [], []
    for (i0, i1, _), est_T in est_entries:
        gt_T = gt_map[(i0, i1)]
        re = float(isotropic_R_error(est_T[None, :3, :3],
                                     gt_T[None, :3, :3])[0])
        te = float(np.linalg.norm(est_T[:3, 3] - gt_T[:3, 3]))
        res.append(re)
        tes.append(te)
        dsc_ok.append(re < re_thresh_deg and te * 100.0 < te_thresh_cm)
        nonconsec = abs(i1 - i0) > 1
        valid_mask.append(nonconsec)
        if nonconsec:
            rel = np.linalg.inv(gt_T) @ est_T
            p = transformation_error_info(rel, gt_infos[(i0, i1)])
            pred_ok.append(p <= err2)
    res, tes = np.array(res), np.array(tes)
    dsc_ok = np.array(dsc_ok)
    pred_ok = np.array(pred_ok, dtype=bool)
    valid = np.array(valid_mask)
    n_valid = int(valid.sum())
    pred_sel = valid.copy()
    pred_sel[valid] = pred_ok
    return {
        "predator_recall": float(pred_ok.mean()) if n_valid else 0.0,
        "dsc_recall": float(dsc_ok.mean()) if len(dsc_ok) else 0.0,
        "n_valid": n_valid, "n_total": len(est_entries),
        "re_deg_predator": res[pred_sel], "te_predator": tes[pred_sel],
        "re_deg_dsc": res[dsc_ok], "te_dsc": tes[dsc_ok],
        "re_deg_all": res, "te_all": tes,
    }


def benchmark(est_folder: str, gt_folder: str, err2: float = 0.2 ** 2,
              re_thresh_deg: float = 15.0, te_thresh_cm: float = 30.0):
    """Multi-scene 3DMatch-style benchmark (reference: threedmatch.py:54-97
    `Metric.benchmark`): each scene subdir of gt_folder holds gt.log +
    gt.info, each scene subdir of est_folder holds est.log. Returns
    per-scene dicts plus mean recalls."""
    import os

    scenes = sorted(d for d in os.listdir(gt_folder)
                    if os.path.isdir(os.path.join(gt_folder, d)))
    per_scene = {}
    for scene in scenes:
        est = read_trajectory_log(os.path.join(est_folder, scene, "est.log"))
        gt = read_trajectory_log(os.path.join(gt_folder, scene, "gt.log"))
        _, infos = read_trajectory_info(
            os.path.join(gt_folder, scene, "gt.info"))
        per_scene[scene] = benchmark_scene(
            est, gt, infos, err2, re_thresh_deg, te_thresh_cm)
    return {
        "scenes": per_scene,
        "predator_recall": float(np.mean(
            [s["predator_recall"] for s in per_scene.values()])),
        "dsc_recall": float(np.mean(
            [s["dsc_recall"] for s in per_scene.values()])),
    }
