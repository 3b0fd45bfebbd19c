"""Surface-completion tests: loaders, benchmark scorer, scene-flow metrics,
renderer, ROPNet eval harness."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.data import loaders, synthetic
from pointcloudregistration_tpu.metrics import benchmark, sceneflow
from pointcloudregistration_tpu.ops import render
from pointcloudregistration_tpu.core import se3


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    loaders.write_ply_points(p, pts)
    back = loaders.read_ply_points(p)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_obj_reader(tmp_path):
    p = str(tmp_path / "m.obj")
    with open(p, "w") as f:
        f.write("# comment\nv 1 2 3\nv 4 5 6\nf 1 2 1\n")
    v = loaders.read_obj_vertices(p)
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6]])


def test_ransac_pickle_roundtrip(tmp_path):
    sample = {
        "source": np.zeros((10, 3), np.float32),
        "target": np.ones((12, 3), np.float32),
        "src_normals": np.zeros((10, 3), np.float32),
        "tgt_normals": np.zeros((12, 3), np.float32),
        "transformation": np.eye(4, dtype=np.float32),
        "inlier_rmse": 0.01, "inlier_ratio": 0.9,
        "correspondence": np.zeros((10,), np.int32),
    }
    p = str(tmp_path / "d.pickle")
    loaders.save_ransac_pickle(p, [sample])
    back = loaders.load_ransac_pickle(p)
    assert len(back) == 1
    np.testing.assert_allclose(back[0]["target"], sample["target"])


def test_pair_dataset(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "fragments"))
    rng = np.random.default_rng(1)
    for i in range(3):
        loaders.write_ply_points(
            os.path.join(root, "fragments", f"frag_{i}.ply"),
            rng.normal(size=(50, 3)).astype(np.float32))
    with open(os.path.join(root, "pairs.txt"), "w") as f:
        f.write("0 1\n1 2\n")
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[1, :3, 3] = [1, 0, 0]
    np.save(os.path.join(root, "poses.npy"), poses)
    ds = loaders.PairDataset(root, n_points=32)
    assert len(ds) == 2
    item = ds[0]
    assert item["source"].shape == (32, 3)
    np.testing.assert_allclose(item["t_gt"], [-1, 0, 0], atol=1e-6)


def test_trajectory_log_and_recall(tmp_path):
    rng = np.random.default_rng(2)
    gt_entries, est_entries = [], []
    for i in range(10):
        T = np.eye(4)
        T[:3, :3] = np.asarray(se3.random_uniform_rotation(
            jax.random.PRNGKey(i)))
        T[:3, 3] = rng.normal(3) * 0.1
        gt_entries.append(((i, i + 1, 11), T))
        Te = T.copy()
        if i < 7:                      # 7 accurate, 3 badly wrong
            est_entries.append(((i, i + 1, 11), Te))
        else:
            bad = np.eye(4)
            est_entries.append(((i, i + 1, 11), bad))
    gt_p, est_p = str(tmp_path / "gt.log"), str(tmp_path / "est.log")
    benchmark.write_trajectory_log(gt_p, gt_entries)
    benchmark.write_trajectory_log(est_p, est_entries)
    out = benchmark.registration_recall_from_logs(est_p, gt_p)
    assert out["n_pairs"] == 10
    assert 0.6 <= out["recall"] <= 0.8


def test_scene_flow_metrics():
    gt = jnp.ones((2, 100, 3)) * 0.5
    pred = gt.at[:, :50].add(0.02)       # small error half, exact half
    m = sceneflow.scene_flow_metrics(pred - 0.0, gt)
    assert m["EPE"].shape == (2,)
    assert float(m["AccS"].min()) > 0.9
    th, curve = sceneflow.fmr_curve(jnp.asarray([0.01, 0.1, 0.2]))
    assert curve.shape == th.shape
    assert float(curve[0]) == 1.0


def test_silhouette_render_and_cost():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(3), 400)
    cam = pts + jnp.asarray([0.0, 0.0, 2.0])      # push in front of camera
    img = render.splat_silhouette(cam, 60, 80, 60.0, 60.0, 40.0, 30.0)
    assert img.shape == (60, 80)
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    assert float(img.max()) > 0.5                  # something rendered
    # identical clouds -> zero cost; shifted -> positive, differentiable
    c0 = render.silhouette_cost(cam, cam, 60, 80, 60.0, 60.0, 40.0, 30.0)
    c1 = render.silhouette_cost(cam + jnp.asarray([0.3, 0.0, 0.0]), cam,
                                60, 80, 60.0, 60.0, 40.0, 30.0)
    assert float(c0) < 1e-8 < float(c1)
    g = jax.grad(lambda p: render.silhouette_cost(
        p, cam, 60, 80, 60.0, 60.0, 40.0, 30.0))(cam + 0.1)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
