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


def test_perspective_render_zorder_and_alpha():
    """PCDRender-parity rasterizer: shapes, z-ordered occlusion, zbuf
    (point_render.py:82-105: rasterize -> weights 1-d2/r2 -> alpha
    compositing)."""
    cam = render.PerspectiveCamera(fx=60.0, fy=60.0, cx=40.0, cy=30.0,
                                   height=60, width=80)
    # two points projecting to the same pixel at different depths: the
    # near one must dominate the composited color and the zbuf
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
    feats = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    img, alpha, zbuf = render.render_points(pts, feats, cam,
                                            radius_px=2.0, k=2)
    assert img.shape == (60, 80, 2) and alpha.shape == (60, 80)
    cy, cx = 30, 40
    assert float(img[cy, cx, 0]) > float(img[cy, cx, 1])   # near wins
    np.testing.assert_allclose(float(zbuf[cy, cx]), 1.0, atol=1e-5)
    assert float(alpha[cy, cx]) > 0.9
    # extrinsics: camera translated back renders the world-frame cloud
    world = synthetic.vessel_phantom(jax.random.PRNGKey(4), 300)
    cam2 = cam.with_extrinsics(np.eye(3), [0.0, 0.0, 2.0])
    ones = jnp.ones((300, 1))
    _, a2, _ = render.render_points(world, ones, cam2, radius_px=2.0, k=4)
    assert float(a2.max()) > 0.5


def test_perspective_silhouette_optimization_converges():
    """Gradient descent on a translation through the perspective
    silhouette cost recovers the offset (the VERDICT-mandated check that
    the perspective path serves the silhouette objective)."""
    world = synthetic.vessel_phantom(jax.random.PRNGKey(5), 256)
    cam = render.PerspectiveCamera(fx=60.0, fy=60.0, cx=40.0, cy=30.0,
                                   height=60, width=80).with_extrinsics(
        np.eye(3), [0.0, 0.0, 2.0])
    offset0 = jnp.asarray([0.15, -0.1, 0.0])

    cost = jax.jit(lambda off: render.perspective_silhouette_cost(
        world + off, world, cam, radius_px=2.0, k=4))
    g = jax.jit(jax.grad(cost))
    off = offset0
    c_start = float(cost(off))
    for _ in range(60):
        off = off - 0.5 * g(off)
    c_end = float(cost(off))
    assert c_end < c_start * 0.5, (c_start, c_end)
    # x/y are what a silhouette observes (z trades off against scale);
    # the in-plane offset must shrink substantially
    assert float(jnp.linalg.norm(off[:2])) \
        < 0.5 * float(jnp.linalg.norm(offset0[:2]))
