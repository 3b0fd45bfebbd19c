"""MRI TOF/PC pair datasets over the RANSACData pickle contract.

One parameterized dataset replaces the reference's 8 near-identical Dataset
classes (RANSAC / RigidCPD / NonRigidCPD / AffineCPD × Original / Cropped,
ROPNet/src/data/MRI.py:24-574) plus the C2P-side variant
(c2p-net/ngenet/data/MRI.py:12-95). Shared behavior (reference
ROPNet/src/data/MRI.py:51-88):

  * load the columnar pickle, deterministic train/test split
    (80/20 ROPNet-style; 60/20/20 ngenet-style),
  * apply the stored ground-truth-ish transformation (RANSAC+ICP or CPD
    alignment) to the source so pairs start registered,
  * disorient with a fresh random SE(3) whose inverse is the training label,
  * concatenate normals as channels 3:6, resample to a fixed npts, shuffle.

The ngenet flavor (`NgeNetSample` via ``ngenet_sample``) additionally caps at
3000 points, estimates normals, and extracts GT correspondences by radius
search (c2p-net/ngenet/data/MRI.py:57-95, utils/o3d.py:88-102).

Host-side numpy by design: this is the data layer feeding device pipelines
(clouds are small; the hot path is on-device).
"""

from __future__ import annotations

import numpy as np

from . import loaders

METHODS = ("ransac", "rigid_cpd", "nonrigid_cpd", "affine_cpd")
VARIANTS = ("original", "cropped")

# the reference's file stems, e.g. RANSACTrainoriginal.pickle,
# RigidCPDTraincropped.pickle (ROPNet/src/data/MRI.py:33,103,...)
_STEM = {"ransac": "RANSACTrain", "rigid_cpd": "RigidCPDTrain",
         "nonrigid_cpd": "NonRigidCPDTrain", "affine_cpd": "AffineCPDTrain"}


def pickle_name(method: str, variant: str) -> str:
    return f"{_STEM[method]}{variant}.pickle"


def _split_indices(n: int, split: str, scheme: str, seed: int = 42):
    """Deterministic index split. `ropnet` = 80/20 train/test
    (ROPNet/src/data/MRI.py:37); `ngenet` = 60/20/20 train/test/val
    (c2p-net/ngenet/data/MRI.py:32-33)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    if scheme == "ropnet":
        k = n - max(1, int(round(0.2 * n))) if n > 1 else n
        table = {"train": perm[:k], "test": perm[k:]}
    else:
        k1 = n - max(1, int(round(0.4 * n))) if n > 1 else n
        k2 = k1 + (n - k1) // 2
        table = {"train": perm[:k1], "test": perm[k1:k2], "val": perm[k2:]}
    if split not in table:
        raise ValueError(f"split {split!r} not in {sorted(table)}")
    return np.sort(table[split])


def _apply(points: np.ndarray, R: np.ndarray, t: np.ndarray | None = None):
    out = points @ R.T
    return out if t is None else out + t


def random_se3(rng: np.random.Generator, max_angle_deg: float = 45.0,
               max_trans: float = 0.5):
    """Per-axis Euler rotation + uniform translation, the reference's
    disorientation (ROPNet/src/utils/process.py:68-80)."""
    angles = np.deg2rad(rng.uniform(-max_angle_deg, max_angle_deg, 3))
    cx, cy, cz = np.cos(angles)
    sx, sy, sz = np.sin(angles)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = (Rz @ Ry @ Rx).astype(np.float32)
    t = rng.uniform(-max_trans, max_trans, 3).astype(np.float32)
    return R, t


def _resample(rng: np.random.Generator, arr: np.ndarray, m: int):
    """Fixed-size resample: without replacement when possible, else pad by
    resampling (ROPNet `random_select_points` semantics)."""
    n = len(arr)
    if n >= m:
        idx = rng.choice(n, m, replace=False)
    else:
        idx = np.concatenate([np.arange(n), rng.choice(n, m - n)])
    return arr[idx]


class MRIPairs:
    """ROPNet-style training pairs from a RANSACData pickle.

    Yields dicts with keys src (npts, 3 or 6), tgt (npts, 3 or 6),
    R_gt, t_gt such that ``tgt ≈ R_gt^T (src - t_gt)`` region-wise: the
    stored alignment is applied first, then the random disorientation
    (R_gt, t_gt) whose inverse the model must recover — matching
    RANSACOriginal.compose (ROPNet/src/data/MRI.py:51-88).
    """

    def __init__(self, path: str, split: str = "train", npts: int = 2048,
                 normal: bool = False, scheme: str = "ropnet",
                 max_angle_deg: float = 45.0, max_trans: float = 0.5,
                 seed: int = 42):
        self.samples = loaders.load_ransac_pickle(path)
        self.idx = _split_indices(len(self.samples), split, scheme, seed)
        self.npts = npts
        self.normal = normal
        self.max_angle_deg = max_angle_deg
        self.max_trans = max_trans
        self.rng = np.random.default_rng(seed + 1)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i: int) -> dict:
        s = self.samples[self.idx[i]]
        src = np.asarray(s["source"], np.float32)
        tgt = np.asarray(s["target"], np.float32)
        src_n = np.asarray(s["src_normals"], np.float32)
        tgt_n = np.asarray(s["tgt_normals"], np.float32)
        T = np.asarray(s["transformation"], np.float32)

        # stored alignment first: source into the target frame
        src = _apply(src, T[:3, :3], T[:3, 3])
        src_n = _apply(src_n, T[:3, :3])

        # fresh disorientation = the label
        R, t = random_se3(self.rng, self.max_angle_deg, self.max_trans)
        src = _apply(src, R, t)
        src_n = _apply(src_n, R)

        src = np.concatenate([src, src_n], -1)
        tgt = np.concatenate([tgt, tgt_n], -1)
        src = self.rng.permutation(_resample(self.rng, src, self.npts))
        tgt = self.rng.permutation(_resample(self.rng, tgt, self.npts))
        if not self.normal:
            src, tgt = src[:, :3], tgt[:, :3]
        return {"src": src, "tgt": tgt, "R_gt": R, "t_gt": t}


def radius_correspondences(src: np.ndarray, tgt: np.ndarray, T: np.ndarray,
                           radius: float, cap: int | None = None):
    """GT correspondence pairs: indices (i, j) with |T·src_i − tgt_j| < r
    (c2p-net/ngenet/utils/o3d.py:88-102 radius-search pairs)."""
    warped = _apply(src, T[:3, :3], T[:3, 3])
    d2 = (np.sum(warped**2, 1)[:, None] + np.sum(tgt**2, 1)[None]
          - 2.0 * warped @ tgt.T)
    ii, jj = np.nonzero(d2 < radius * radius)
    coors = np.stack([ii, jj], -1).astype(np.int32)
    if cap is not None and len(coors) > cap:
        coors = coors[np.random.default_rng(0).choice(len(coors), cap,
                                                      replace=False)]
    return coors


def _numpy_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Covariance-eig normals, host-side (stand-in for Open3D
    estimate_normals in c2p-net/ngenet/utils/o3d.py:55)."""
    d2 = (np.sum(points**2, 1)[:, None] + np.sum(points**2, 1)[None]
          - 2.0 * points @ points.T)
    idx = np.argpartition(d2, min(k, len(points) - 1), axis=1)[:, :k]
    nbrs = points[idx]                                  # (N, k, 3)
    c = nbrs - nbrs.mean(1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", c, c)
    _, vecs = np.linalg.eigh(cov)
    return np.ascontiguousarray(vecs[:, :, 0]).astype(np.float32)


class NgeNetPairs:
    """C2P/ngenet-style samples: 3000-pt cap, unit features, normals, GT
    correspondences by radius search (c2p-net/ngenet/data/MRI.py:57-95)."""

    def __init__(self, path: str, split: str = "train",
                 overlap_radius: float = 0.0375, max_points: int = 3000,
                 seed: int = 42):
        self.samples = loaders.load_ransac_pickle(path)
        self.idx = _split_indices(len(self.samples), split, "ngenet", seed)
        self.overlap_radius = overlap_radius
        self.max_points = max_points
        self.rng = np.random.default_rng(seed + 1)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i: int) -> dict:
        s = self.samples[self.idx[i]]
        src = np.asarray(s["source"], np.float32)
        tgt = np.asarray(s["target"], np.float32)
        T = np.asarray(s["transformation"], np.float32)
        if len(src) > self.max_points:
            src = src[self.rng.permutation(len(src))[:self.max_points]]
        if len(tgt) > self.max_points:
            tgt = tgt[self.rng.permutation(len(tgt))[:self.max_points]]
        return {
            "src_points": src, "tgt_points": tgt,
            "src_feats": np.ones_like(src[:, :1]),
            "tgt_feats": np.ones_like(tgt[:, :1]),
            "src_normals": _numpy_normals(src),
            "tgt_normals": _numpy_normals(tgt),
            "transf": T,
            "coors": radius_correspondences(src, tgt, T,
                                            self.overlap_radius),
        }
