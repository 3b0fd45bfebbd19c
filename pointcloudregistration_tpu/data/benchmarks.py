"""Upstream benchmark dataset loaders (NgeNet/C2P-Net surface).

Equivalents of the reference's benchmark Dataset classes — part of its
capability surface even though the MRI flow doesn't use them:

  * Kitti odometry pairs      (c2p-net/ngenet/data/Kitti.py:18-193)
  * MVP-RG h5 partial pairs   (c2p-net/ngenet/data/MVP_RG.py:37-150)
  * Ear pre/intra-op pairs    (c2p-net/ngenet/data/ear_registration.py:37-251)
  * Shape (primitive) pairs   (c2p-net/ngenet/data/shape_registration.py:12-93)

All return the ngenet-style pair dict {src_points, tgt_points, src_feats,
tgt_feats, src_normals, tgt_normals, transf, coors} (see data/mri.py); all
are host-side numpy feeding the on-device pipelines. vtk/trimesh-dependent
artifacting in the ear loader is replaced by a numpy centroid-dropout with
the same role (random partial-surface removal).
"""

from __future__ import annotations

import os
import pickle
from glob import glob

import numpy as np

from .mri import _numpy_normals, radius_correspondences, random_se3


def _pair_dict(src, tgt, T, overlap_radius, with_normals=True):
    src = np.asarray(src, np.float32)
    tgt = np.asarray(tgt, np.float32)
    T = np.asarray(T, np.float32)
    d = {"src_points": src, "tgt_points": tgt,
         "src_feats": np.ones_like(src[:, :1]),
         "tgt_feats": np.ones_like(tgt[:, :1]),
         "transf": T,
         "coors": radius_correspondences(src, tgt, T, overlap_radius)}
    if with_normals:
        d["src_normals"] = _numpy_normals(src)
        d["tgt_normals"] = _numpy_normals(tgt)
    return d


def _cap(rng, pts, max_points):
    if len(pts) > max_points:
        pts = pts[rng.permutation(len(pts))[:max_points]]
    return pts


class KittiPairs:
    """KITTI-odometry style pairs: per-sequence pose files + velodyne scans;
    candidate pairs are frames >10 m apart (Kitti.py:62-76 `prepare_pairs`).

    Layout: root/poses/<seq>.txt (n, 12 flattened 3x4) and
    root/sequences/<seq>/velodyne/%06d.bin (float32 x,y,z,reflectance) or
    .npz with 'points'.
    """

    def __init__(self, root: str, seqs: list[str], min_dist: float = 10.0,
                 voxel_size: float = 0.3, max_points: int = 30000,
                 overlap_radius: float = 0.45, seed: int = 0):
        self.root = root
        self.voxel_size = voxel_size
        self.max_points = max_points
        self.overlap_radius = overlap_radius
        self.rng = np.random.default_rng(seed)
        self.pose_cache: dict[str, np.ndarray] = {}
        self.pairs: list[tuple[str, int, int]] = []
        for seq in seqs:
            poses = np.genfromtxt(os.path.join(root, "poses", f"{seq}.txt"))
            poses = poses.reshape(-1, 3, 4)
            eye = np.broadcast_to(np.eye(4), (len(poses), 4, 4)).copy()
            eye[:, :3, :4] = poses
            self.pose_cache[seq] = eye.astype(np.float32)
            Ts = eye[:, :3, 3]
            # greedy: next frame at least min_dist away (Kitti.py:66-76)
            i = 0
            while i < len(Ts) - 1:
                d = np.linalg.norm(Ts[i + 1:] - Ts[i], axis=1)
                far = np.nonzero(d > min_dist)[0]
                if len(far) == 0:
                    break
                j = i + 1 + int(far[0])
                self.pairs.append((seq, i, j))
                i = j

    def _scan(self, seq: str, frame: int) -> np.ndarray:
        base = os.path.join(self.root, "sequences", seq, "velodyne",
                            f"{frame:06d}")
        if os.path.exists(base + ".npz"):
            with np.load(base + ".npz") as z:
                return z["points"].astype(np.float32)[:, :3]
        pts = np.fromfile(base + ".bin", np.float32).reshape(-1, 4)[:, :3]
        return pts

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, item: int) -> dict:
        seq, i, j = self.pairs[item]
        src = _cap(self.rng, self._scan(seq, i), self.max_points)
        tgt = _cap(self.rng, self._scan(seq, j), self.max_points)
        # GT relative pose: velodyne_i -> velodyne_j via cam poses
        Ti, Tj = self.pose_cache[seq][i], self.pose_cache[seq][j]
        T = (np.linalg.inv(Tj) @ Ti).astype(np.float32)
        return _pair_dict(src, tgt, T, self.overlap_radius,
                          with_normals=False)


class MVPRGPairs:
    """MVP-RG: h5 files of partial source/target clouds + GT transforms
    (MVP_RG.py:52-66 train/val/test file map, 'src'/'tgt'/'transforms').
    For val/test the transform is stored; for train a random pose is drawn
    (MVP_RG.py:13-34 random_pose) and applied to the source.
    """

    FILES = {"train": "MVP_Train_RG.h5", "val": "MVP_Test_RG.h5",
             "test": "MVP_ExtraTest_RG.h5"}

    def __init__(self, root: str, split: str, rot_mag: float = 45.0,
                 trans_mag: float = 0.5, overlap_radius: float = 0.04,
                 seed: int = 0):
        import h5py
        self.split = split
        self.rot_mag, self.trans_mag = rot_mag, trans_mag
        self.overlap_radius = overlap_radius
        self.rng = np.random.default_rng(seed)
        with h5py.File(os.path.join(root, self.FILES[split]), "r") as f:
            self.src = np.asarray(f["src"], np.float32)
            self.tgt = np.asarray(f["tgt"], np.float32)
            if "transforms" in f:
                self.transforms = np.asarray(f["transforms"], np.float32)
            else:
                self.transforms = None
            self.labels = (np.asarray(f["cat_labels"], np.int32)
                           if "cat_labels" in f else None)

    def __len__(self):
        return len(self.src)

    def __getitem__(self, item: int) -> dict:
        src, tgt = self.src[item], self.tgt[item]
        if self.split == "train" or self.transforms is None:
            R, t = random_se3(self.rng, self.rot_mag, self.trans_mag)
            # disorient the source; GT maps it back onto tgt
            T = np.eye(4, dtype=np.float32)
            T[:3, :3], T[:3, 3] = R.T, -R.T @ t
            src = src @ R.T + t
        else:
            T = self.transforms[item]
        return _pair_dict(src, tgt, T, self.overlap_radius)


def centroid_dropout(rng: np.random.Generator, points: np.ndarray,
                     surface_amount: float) -> np.ndarray:
    """Numpy stand-in for the ear loader's vtk `artifacting`
    (ear_registration.py:17-35): remove points near random centroids until
    only `surface_amount` of the surface remains."""
    n = len(points)
    keep = np.ones(n, bool)
    target = int(surface_amount * n)
    while keep.sum() > target:
        c = points[rng.integers(n)]
        d = np.linalg.norm(points - c, axis=1)
        r = np.percentile(d, 10)
        keep &= d > r
    idx = np.nonzero(keep)[0]
    return points[idx] if len(idx) else points[:target]


class EarPairs:
    """Pre-op → intra-op ear surfaces with per-sample displacement field
    (ear_registration.py:37-134): metadata.pkl holds split lists and
    mean/std normalization; each sample dir has data_cached.pkl with
    points_pre, points_intra[(noisy)], displacement, faces, landmarks."""

    def __init__(self, root: str, split: str, noisy_intra: bool = False,
                 overlap_radius: float = 0.04,
                 surface_amount: float | None = None,
                 max_points: int = 30000, seed: int = 0):
        self.root = root
        self.noisy = noisy_intra
        self.overlap_radius = overlap_radius
        self.surface_amount = surface_amount
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)
        with open(os.path.join(root, "metadata.pkl"), "rb") as f:
            self.metadata = pickle.load(f)
        self.paths = [os.path.join(root, p.split("/")[-1])
                      for p in self.metadata[split]]

    def __len__(self):
        return len(self.paths)

    def _norm(self, arr):
        return (arr - self.metadata["mean"]) / self.metadata["std"]

    def __getitem__(self, item: int) -> dict:
        with open(os.path.join(self.paths[item], "data_cached.pkl"),
                  "rb") as f:
            data = pickle.load(f)
        src = self._norm(np.asarray(data["points_pre"], np.float32))
        tgt_raw = np.asarray(
            data["points_intra_noisy" if self.noisy else "points_intra"],
            np.float32)
        if self.surface_amount is not None:
            tgt_raw = centroid_dropout(self.rng, tgt_raw,
                                       self.surface_amount)
        tgt = self._norm(tgt_raw)
        displ = (np.asarray(data["displacement"], np.float32)
                 / self.metadata["std"])
        src = _cap(self.rng, src, self.max_points)
        tgt = _cap(self.rng, tgt, self.max_points)
        d = _pair_dict(src, tgt, np.eye(4, dtype=np.float32),
                       self.overlap_radius)
        d["displacement"] = displ
        for k in ("landmarks_pre", "landmarks_intra"):
            if k in data:
                d[k] = self._norm(np.asarray(data[k], np.float32))
        # non-rigid GT: correspondences from the displaced source
        d["coors"] = radius_correspondences(
            src[:len(displ)] + displ[:len(src)] if len(displ) >= len(src)
            else src, tgt, np.eye(4, dtype=np.float32), self.overlap_radius)
        return d


class ShapePairs:
    """Primitive-shape registration pairs (shape_registration.py:12-93):
    a unit mesh per shape + per-sample deformed/artifacted target .npy and
    a transf.pkl of GT poses keyed '<shape><num>'."""

    def __init__(self, root: str, shape: str, split: str,
                 overlap_radius: float = 0.04, max_points: int = 30000,
                 seed: int = 0):
        self.root = root
        self.shape = shape
        self.overlap_radius = overlap_radius
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)
        self.paths = sorted(glob(os.path.join(root, shape, f"{split}*")))
        with open(os.path.join(root, "transf.pkl"), "rb") as f:
            self.transf = pickle.load(f)
        unit_path = os.path.join(root, f"{shape}.npz")
        with np.load(unit_path) as z:
            self.unit_points = z["points"].astype(np.float32)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, item: int) -> dict:
        path = self.paths[item]
        num = os.path.splitext(os.path.basename(path))[0].split("_")[-1]
        T = np.asarray(self.transf[self.shape + num], np.float32)
        if path.endswith(".npz"):
            with np.load(path) as z:
                tgt = z["points"].astype(np.float32)
        else:
            tgt = np.load(path).astype(np.float32)
        src = _cap(self.rng, self.unit_points, self.max_points)
        tgt = _cap(self.rng, tgt, self.max_points)
        return _pair_dict(src, tgt, T, self.overlap_radius)
