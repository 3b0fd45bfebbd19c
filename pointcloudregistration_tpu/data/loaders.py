"""File-format loaders: PLY/OBJ point IO, the reference's pickle contract,
and benchmark-style directory datasets.

Parity targets: the reference's on-disk interchange —
  * RANSACData/RANSACTrain*.pickle dicts with keys {source, target,
    src_normals, tgt_normals, transformation, inlier_rmse, inlier_ratio,
    correspondence} (DataPreparation/RANSAC.py:128-132), consumed by dip,
    ROPNet and C2P (SURVEY.md §1 cross-project contract);
  * PLY cloud IO (Open3D read/write in DataPreparation/run.py, ngenet
    utils/o3d.py:24-52 npy/pcd converters);
  * 3DMatch/4DMatch-style directory loaders
    (ngenet/data/ThreeDMatch.py, correspondence/datasets/_4dmatch.py) —
    generalized to npz/ply directories with pose files.
"""

from __future__ import annotations

import os
import pickle
import struct

import numpy as np


# ---------------------------------------------------------------------------
# PLY / OBJ point IO (dependency-free)
# ---------------------------------------------------------------------------

def read_ply_points(path: str) -> np.ndarray:
    """Minimal PLY reader (ascii + binary_little_endian, x/y/z floats)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        n = int(next(l for l in header
                     if l.startswith("element vertex")).split()[-1])
        props = [l.split()[-1] for l in header if l.startswith("property")]
        xyz_idx = [props.index(c) for c in ("x", "y", "z")]
        if fmt == "ascii":
            rows = []
            for _ in range(n):
                vals = f.readline().split()
                rows.append([float(vals[i]) for i in xyz_idx])
            return np.asarray(rows, np.float32)
        assert fmt == "binary_little_endian", fmt
        # assume all properties are float32 (true for the reference's files)
        data = np.frombuffer(f.read(n * 4 * len(props)), "<f4",
                             count=n * len(props)).reshape(n, len(props))
        return np.ascontiguousarray(data[:, xyz_idx]).astype(np.float32)


def write_ply_points(path: str, points: np.ndarray,
                     normals: np.ndarray | None = None) -> None:
    points = np.asarray(points, np.float32)
    props = ["x", "y", "z"] + (["nx", "ny", "nz"] if normals is not None
                               else [])
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(points)}"]
        hdr += [f"property float {p}" for p in props]
        hdr.append("end_header")
        f.write(("\n".join(hdr) + "\n").encode("ascii"))
        data = points if normals is None else np.concatenate(
            [points, np.asarray(normals, np.float32)], -1)
        f.write(np.ascontiguousarray(data, "<f4").tobytes())


def read_obj_vertices(path: str) -> np.ndarray:
    """OBJ vertex positions (the reference's phantom meshes are .obj,
    DataPreparation/run.py:78-79)."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(v) for v in line.split()[1:4]])
    return np.asarray(verts, np.float32)


def read_obj_mesh(path: str) -> tuple[np.ndarray, np.ndarray]:
    """OBJ triangle mesh: (verts (V, 3) f32, faces (F, 3) i32, 0-based).

    Handles the `f v/vt/vn` index style of the reference's phantom mesh
    (DataPreparation/OriginalData/PCMRI_ww25_Cow_v4_final.obj); polygons
    with more than 3 vertices are fan-triangulated.
    """
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(v) for v in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32))


# ---------------------------------------------------------------------------
# pickle contract (RANSACData)
# ---------------------------------------------------------------------------

_CONTRACT_KEYS = ("source", "target", "src_normals", "tgt_normals",
                  "transformation", "inlier_rmse", "inlier_ratio",
                  "correspondence")


def load_ransac_pickle(path: str) -> list[dict]:
    """Load the reference's training pickle and return a list of row dicts.

    The on-disk contract is COLUMNAR: a dict whose keys are the contract
    names and whose values are per-sample lists
    (``{'source': [arr, ...], 'target': [...], ...}``,
    DataPreparation/RANSAC.py:127-131). Row-major lists of dicts are also
    accepted for convenience.
    """
    with open(path, "rb") as f:
        raw = pickle.load(f)
    if isinstance(raw, dict):
        n = len(raw[next(iter(raw))])
        return [{k: (np.asarray(raw[k][i]) if k in raw else None)
                 for k in _CONTRACT_KEYS} for i in range(n)]
    return [{k: (np.asarray(s[k]) if k in s else None)
             for k in _CONTRACT_KEYS} for s in raw]


def save_ransac_pickle_columnar(path: str, samples: list[dict]) -> None:
    """Write rows back out in the reference's columnar layout so artifacts
    are interchangeable with the reference's consumers
    (dip/preprocess_correspondences.py:23-25, ROPNet/src/data/MRI.py:33,
    c2p-net/ngenet/data/MRI.py:27)."""
    data = {k: [s[k] for s in samples] for k in _CONTRACT_KEYS}
    with open(path, "wb") as f:
        pickle.dump(data, f)


def save_ransac_pickle(path: str, samples: list[dict]) -> None:
    with open(path, "wb") as f:
        pickle.dump(samples, f)


def load_npz_dataset(path: str) -> dict:
    """Load a dataprep-generated npz archive (pipelines/dataprep.py)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# directory datasets (3DMatch / 4DMatch style)
# ---------------------------------------------------------------------------

class PairDataset:
    """Directory of fragment clouds + a pose/pairs table.

    Layout (3DMatch-style, ngenet/data/ThreeDMatch.py analogue):
      root/fragments/*.ply (or .npz with 'points')
      root/pairs.txt lines: "i j" fragment index pairs
      root/poses.npy (F, 4, 4) optional ground-truth poses
    """

    def __init__(self, root: str, n_points: int | None = None,
                 seed: int = 0):
        self.root = root
        frag_dir = os.path.join(root, "fragments")
        self.files = sorted(
            os.path.join(frag_dir, f) for f in os.listdir(frag_dir)
            if f.endswith((".ply", ".npz")))
        pairs_path = os.path.join(root, "pairs.txt")
        with open(pairs_path) as f:
            self.pairs = [tuple(int(v) for v in ln.split()[:2])
                          for ln in f if ln.strip()]
        poses_path = os.path.join(root, "poses.npy")
        self.poses = (np.load(poses_path) if os.path.exists(poses_path)
                      else None)
        self.n_points = n_points
        self.rng = np.random.default_rng(seed)

    def _load(self, idx: int) -> np.ndarray:
        path = self.files[idx]
        if path.endswith(".npz"):
            with np.load(path) as z:
                pts = z["points"]
        else:
            pts = read_ply_points(path)
        if self.n_points is not None and len(pts) > self.n_points:
            sel = self.rng.choice(len(pts), self.n_points, replace=False)
            pts = pts[sel]
        return pts.astype(np.float32)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> dict:
        a, b = self.pairs[i]
        item = {"source": self._load(a), "target": self._load(b),
                "src_id": a, "tgt_id": b}
        if self.poses is not None:
            # relative GT: T_b^-1 T_a maps fragment a into fragment b
            Ta, Tb = self.poses[a], self.poses[b]
            rel = np.linalg.inv(Tb) @ Ta
            item["R_gt"] = rel[:3, :3].astype(np.float32)
            item["t_gt"] = rel[:3, 3].astype(np.float32)
        return item
