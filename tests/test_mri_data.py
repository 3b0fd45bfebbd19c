"""MRI dataset family over the columnar RANSACData pickle contract
(reference ROPNet/src/data/MRI.py, c2p-net/ngenet/data/MRI.py)."""
import numpy as np

from pointcloudregistration_tpu.data import loaders, mri


def _make_pickle(tmp_path, n_samples=6, n_pts=128, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_samples):
        src = rng.normal(size=(n_pts, 3)).astype(np.float32)
        R, t = mri.random_se3(rng, 30.0, 0.3)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        tgt = src @ R.T + t                      # exactly the aligned source
        rows.append({
            "source": src, "target": tgt,
            "src_normals": rng.normal(size=(n_pts, 3)).astype(np.float32),
            "tgt_normals": rng.normal(size=(n_pts, 3)).astype(np.float32),
            "transformation": T, "inlier_rmse": 0.0, "inlier_ratio": 1.0,
            "correspondence": np.stack([np.arange(n_pts)] * 2, -1),
        })
    path = str(tmp_path / mri.pickle_name("ransac", "cropped"))
    loaders.save_ransac_pickle_columnar(path, rows)
    return path


def test_columnar_pickle_roundtrip(tmp_path):
    path = _make_pickle(tmp_path, n_samples=3)
    back = loaders.load_ransac_pickle(path)
    assert len(back) == 3
    assert back[0]["source"].shape == (128, 3)
    assert back[0]["transformation"].shape == (4, 4)


def test_splits_disjoint_and_deterministic(tmp_path):
    path = _make_pickle(tmp_path, n_samples=10)
    tr = mri.MRIPairs(path, "train")
    te = mri.MRIPairs(path, "test")
    assert set(tr.idx).isdisjoint(te.idx)
    assert len(tr) + len(te) == 10
    assert np.array_equal(tr.idx, mri.MRIPairs(path, "train").idx)
    # ngenet scheme: train/test/val partition
    parts = [mri._split_indices(10, s, "ngenet") for s in
             ("train", "test", "val")]
    assert sorted(np.concatenate(parts).tolist()) == list(range(10))


def test_compose_label_inverse(tmp_path):
    """Undoing the disorientation label must re-align src with tgt."""
    path = _make_pickle(tmp_path, n_pts=256)
    # npts == n_pts: the without-replacement resample keeps every point, so
    # each undone source point still has its exact partner in tgt
    ds = mri.MRIPairs(path, "train", npts=256, normal=True)
    item = ds[0]
    src, tgt = item["src"], item["tgt"]
    assert src.shape == (256, 6) and tgt.shape == (256, 6)
    undone = (src[:, :3] - item["t_gt"]) @ item["R_gt"]
    d2 = (np.sum(undone**2, 1)[:, None] + np.sum(tgt[:, :3]**2, 1)[None]
          - 2.0 * undone @ tgt[:, :3].T)
    # every undone source point must coincide with some target point
    assert float(np.min(d2, 1).max()) < 1e-6
    # without normals: 3 channels
    assert mri.MRIPairs(path, "train", npts=64)[0]["src"].shape == (64, 3)


def test_ngenet_pairs_correspondences(tmp_path):
    path = _make_pickle(tmp_path, n_pts=200)
    ds = mri.NgeNetPairs(path, "train", overlap_radius=1e-3, max_points=150)
    item = ds[0]
    assert item["src_points"].shape == (150, 3)
    assert item["src_normals"].shape == (150, 3)
    assert np.allclose(np.linalg.norm(item["src_normals"], axis=1), 1.0,
                       atol=1e-4)
    coors = item["coors"]
    assert len(coors) > 0
    # verify every reported pair really is within the radius under T
    T = item["transf"]
    warped = item["src_points"] @ T[:3, :3].T + T[:3, 3]
    d = np.linalg.norm(warped[coors[:, 0]] - item["tgt_points"][coors[:, 1]],
                       axis=1)
    assert float(d.max()) < 1e-3


def test_resample_pads_small_clouds():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(10, 3))
    out = mri._resample(rng, arr, 32)
    assert out.shape == (32, 3)
