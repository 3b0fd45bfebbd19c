"""Measured CPU baseline for the reference's classical registration path.

The reference's ground-truthing / classical pipeline is Open3D on CPU
(DataPreparation/RANSAC.py:12-132): normal estimation + FPFH features,
`registration_ransac_based_on_feature_matching` (max 100k iterations,
confidence 0.999, mutual_filter=True, edge-length 0.9 + distance checkers,
3-point samples), then point-to-point ICP refinement. Open3D is not
installable in this image, so this script re-implements that exact flow
with numpy + scipy cKDTree: hypothesis generation/scoring is vectorized in
numpy batches (so Python interpreter overhead does not dominate the way a
per-iteration loop would) and Open3D's adaptive early termination is kept
(iterations shrink as the best inlier ratio rises). The emitted number is
an *approximation* of the Open3D cost on this host — treat it as a
same-order estimate, not an exact Open3D measurement.

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


def _batch_kabsch(a, b):
    """Vectorized Kabsch over (H, 3, 3) triplet pairs -> (H,3,3), (H,3)."""
    cs, ct = a.mean(1, keepdims=True), b.mean(1, keepdims=True)
    H = np.einsum("hki,hkj->hij", a - cs, b - ct)
    U, _, Vt = np.linalg.svd(H)
    det = np.linalg.det(np.einsum("hij,hkj->hik",
                                  Vt.transpose(0, 2, 1), U))
    S = np.repeat(np.eye(3)[None], len(a), 0)
    S[:, 2, 2] = np.sign(det)
    R = np.einsum("hji,hjk,hlk->hil", Vt, S, U)
    t = ct[:, 0] - np.einsum("hij,hj->hi", R, cs[:, 0])
    return R, t


def ransac_feature_matching(src, tgt, f_src, f_tgt, threshold: float,
                            max_iter: int = 100000, confidence: float = 0.999,
                            edge_similarity: float = 0.9, hyp_batch: int = 512,
                            rng: np.random.Generator | None = None):
    """Open3D-style correspondence RANSAC: mutual-NN matches in feature
    space (mutual_filter=True, RANSAC.py:44), 3-point samples, edge-length
    + distance checkers, adaptive exit (RANSAC.py:35-53 parameters).

    Hypothesis generation and scoring run in numpy batches of `hyp_batch`
    so the measurement approximates Open3D's parallel C++ loop rather than
    Python per-iteration overhead; the adaptive exit is re-evaluated
    between batches (granularity favors the baseline slightly less than
    Open3D's per-iteration check, batches are small enough not to matter).
    """
    rng = rng or np.random.default_rng(0)
    ftree = cKDTree(f_tgt)
    _, match = ftree.query(f_src, k=1)            # (N,) src -> tgt
    # mutual_filter=True: keep src i only when tgt[match[i]]'s NN is i
    fstree = cKDTree(f_src)
    _, back = fstree.query(f_tgt, k=1)            # (M,) tgt -> src
    mutual = back[match] == np.arange(len(f_src))
    if mutual.sum() >= 3:
        corr_src, corr_tgt = src[mutual], tgt[match[mutual]]
    else:
        corr_src, corr_tgt = src, tgt[match]
    n = len(corr_src)
    best_fit, best_Rt, it_needed = 0.0, (np.eye(3), np.zeros(3)), max_iter
    it = 0
    while it < min(max_iter, it_needed):
        h = min(hyp_batch, min(max_iter, it_needed) - it)
        it += h
        sel = rng.integers(0, n, size=(h, 3))
        a, b = corr_src[sel], corr_tgt[sel]       # (h, 3, 3)
        # edge-length checker
        ea = np.linalg.norm(a - np.roll(a, 1, 1), axis=2)
        eb = np.linalg.norm(b - np.roll(b, 1, 1), axis=2)
        ok = np.all((ea > edge_similarity * eb)
                    & (eb > edge_similarity * ea), axis=1)
        ok &= (sel[:, 0] != sel[:, 1]) & (sel[:, 1] != sel[:, 2]) \
            & (sel[:, 0] != sel[:, 2])
        if not ok.any():
            continue
        R, t = _batch_kabsch(a[ok], b[ok])
        # distance checker on the sampled triplets
        res = np.linalg.norm(np.einsum("hij,hkj->hki", R, a[ok])
                             + t[:, None] - b[ok], axis=2)
        ok2 = np.all(res <= threshold, axis=1)
        if not ok2.any():
            continue
        R, t = R[ok2], t[ok2]
        # evaluate surviving hypotheses on the full correspondence set
        d = np.linalg.norm(np.einsum("hij,nj->hni", R, corr_src)
                           + t[:, None] - corr_tgt[None], axis=2)
        fits = (d < threshold).mean(1)
        j = int(np.argmax(fits))
        if fits[j] > best_fit:
            best_fit = float(fits[j])
            best_Rt = (R[j], t[j])
            it_needed = int(np.log(1 - confidence)
                            / np.log(1 - min(best_fit, 0.9999) ** 3)) + 1
    # final refit on inliers of the best model
    R, t = best_Rt
    d = np.linalg.norm(corr_src @ R.T + t - corr_tgt, axis=1)
    inl = d < threshold
    if inl.sum() >= 3:
        R, t = kabsch(corr_src[inl], corr_tgt[inl])
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
        # Documented deviation from the reference's thresholds: RANSAC.py:37
        # uses voxel_size*4 = 0.04 and ICP refine 0.02, but on near-rigid
        # pairs in an extent-2 cube. This workload (identical to bench.py's)
        # is an extent-1 cube WITH deform_amp=0.05 non-rigid deformation, so
        # rigid-inlier residuals are ~0.05 by construction; the reference's
        # scale-mapped 0.02/0.01 rejects genuine inliers (measured: mean RRE
        # blows past 70 deg). 0.05 matches C2PConfig.ransac_thresh so both
        # sides of the comparison solve the same problem.
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
