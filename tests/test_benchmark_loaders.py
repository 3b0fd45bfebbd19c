"""Benchmark dataset loaders (Kitti / MVP-RG / ear / shape equivalents,
reference c2p-net/ngenet/data/*.py)."""
import os
import pickle

import numpy as np
import pytest

from pointcloudregistration_tpu.data import benchmarks


def test_kitti_pairs(tmp_path):
    root = str(tmp_path)
    n_frames, seq = 6, "00"
    os.makedirs(os.path.join(root, "poses"))
    vdir = os.path.join(root, "sequences", seq, "velodyne")
    os.makedirs(vdir)
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [12.0 * i, 0, 0]          # frames 12 m apart
        poses.append(T[:3].reshape(-1))
        pts = rng.normal(size=(500, 4)).astype(np.float32)
        pts.tofile(os.path.join(vdir, f"{i:06d}.bin"))
    np.savetxt(os.path.join(root, "poses", f"{seq}.txt"),
               np.stack(poses))
    ds = benchmarks.KittiPairs(root, ["00"], min_dist=10.0,
                               overlap_radius=0.5)
    assert len(ds) == n_frames - 1           # every consecutive frame >10m
    item = ds[0]
    assert item["src_points"].shape == (500, 3)
    # GT maps frame-0 velodyne into frame-1: translation magnitude ~12
    assert abs(np.linalg.norm(item["transf"][:3, 3]) - 12.0) < 1e-4


def test_mvp_rg_pairs(tmp_path):
    h5py = pytest.importorskip("h5py")
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    src = rng.normal(size=(4, 256, 3)).astype(np.float32)
    R, t = benchmarks.random_se3(rng, 30.0, 0.3)
    tgt = src @ R.T + t
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (4, 4, 4)).copy()
    T[:, :3, :3], T[:, :3, 3] = R, t
    with h5py.File(os.path.join(root, "MVP_Test_RG.h5"), "w") as f:
        f["src"], f["tgt"], f["transforms"] = src, tgt, T
    ds = benchmarks.MVPRGPairs(root, "val", overlap_radius=1e-3)
    item = ds[1]
    assert item["src_points"].shape == (256, 3)
    # essentially every point has its exact match within the radius
    # (float32 roundoff can push a stray pair just past it)
    assert len(item["coors"]) >= 250
    # train split: random disorientation, GT undoes it exactly
    with h5py.File(os.path.join(root, "MVP_Train_RG.h5"), "w") as f:
        f["src"], f["tgt"] = src, src
    tr = benchmarks.MVPRGPairs(root, "train", overlap_radius=1e-3)
    it = tr[0]
    back = it["src_points"] @ it["transf"][:3, :3].T + it["transf"][:3, 3]
    assert np.abs(back - it["tgt_points"]).max() < 1e-4


def test_ear_pairs(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    displ = 0.01 * rng.normal(size=(300, 3)).astype(np.float32)
    sdir = os.path.join(root, "case0")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "data_cached.pkl"), "wb") as f:
        pickle.dump({"points_pre": pts, "points_intra": pts + displ,
                     "points_intra_noisy": pts + displ,
                     "displacement": displ,
                     "faces": np.zeros((1, 3), np.int64),
                     "landmarks_pre": pts[:5],
                     "landmarks_intra": pts[:5] + displ[:5]}, f)
    with open(os.path.join(root, "metadata.pkl"), "wb") as f:
        pickle.dump({"train": ["case0"], "mean": 0.0, "std": 1.0}, f)
    ds = benchmarks.EarPairs(root, "train", overlap_radius=0.05)
    item = ds[0]
    assert item["src_points"].shape == (300, 3)
    assert "displacement" in item and "landmarks_pre" in item
    assert len(item["coors"]) > 0


def test_centroid_dropout():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    out = benchmarks.centroid_dropout(rng, pts, 0.5)
    assert len(out) <= 500 and len(out) > 0


def test_shape_pairs(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    unit = rng.normal(size=(200, 3)).astype(np.float32)
    np.savez(os.path.join(root, "box.npz"), points=unit)
    os.makedirs(os.path.join(root, "box"))
    R, t = benchmarks.random_se3(rng, 20.0, 0.2)
    np.save(os.path.join(root, "box", "train_0.npy"), unit @ R.T + t)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    with open(os.path.join(root, "transf.pkl"), "wb") as f:
        pickle.dump({"box0": T}, f)
    ds = benchmarks.ShapePairs(root, "box", "train", overlap_radius=1e-3)
    item = ds[0]
    assert item["tgt_points"].shape == (200, 3)
    assert len(item["coors"]) >= 200
