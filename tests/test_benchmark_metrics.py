"""3DMatch-style benchmark scorer + MVP-RG/mutual-inlier metric tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.metrics import benchmark as bm
from pointcloudregistration_tpu.metrics import registration as reg


def _random_T(rng):
    R = np.asarray(se3.random_uniform_rotation(
        jax.random.PRNGKey(rng.integers(1 << 30))))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3)
    return T


def _write_scene(root, scene, gt_entries, infos, est_entries):
    os.makedirs(os.path.join(root, "gt", scene), exist_ok=True)
    os.makedirs(os.path.join(root, "est", scene), exist_ok=True)
    bm.write_trajectory_log(os.path.join(root, "gt", scene, "gt.log"),
                            gt_entries)
    bm.write_trajectory_log(os.path.join(root, "est", scene, "est.log"),
                            est_entries)
    with open(os.path.join(root, "gt", scene, "gt.info"), "w") as f:
        for (i0, i1, n), info in infos:
            f.write(f"{i0}\t{i1}\t{n}\n")
            for row in info:
                f.write("\t".join(f"{v:.6f}" for v in row) + "\n")


def test_benchmark_perfect_and_broken_estimates(tmp_path):
    rng = np.random.default_rng(0)
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    gt_entries, infos = [], []
    for i0, i1 in pairs:
        gt_entries.append(((i0, i1, 4), _random_T(rng)))
        infos.append(((i0, i1, 4), np.eye(6) * 100.0))
    # perfect estimates -> both recalls 1
    est = [((i0, i1, 4), T.copy()) for (i0, i1, _), T in gt_entries]
    _write_scene(str(tmp_path), "sceneA", gt_entries, infos, est)
    out = bm.benchmark(str(tmp_path / "est"), str(tmp_path / "gt"))
    assert out["predator_recall"] == 1.0
    assert out["dsc_recall"] == 1.0
    sc = out["scenes"]["sceneA"]
    # only |i-j|>1 pairs count for predator style
    assert sc["n_valid"] == 2 and sc["n_total"] == 4
    assert np.allclose(sc["re_deg_all"], 0.0, atol=0.1)  # fp32 arccos noise

    # badly wrong estimates -> recall 0
    est_bad = [((i0, i1, 4), _random_T(rng)) for (i0, i1, _), _ in gt_entries]
    _write_scene(str(tmp_path), "sceneA", gt_entries, infos, est_bad)
    out = bm.benchmark(str(tmp_path / "est"), str(tmp_path / "gt"))
    assert out["dsc_recall"] < 0.9  # random rotations essentially never pass


def test_transformation_error_info_zero_for_identity():
    info = np.eye(6) * 50.0
    assert bm.transformation_error_info(np.eye(4), info) == 0.0
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.0, 0.0]
    # info[0,0]-normalized quadratic form: 0.1^2 * 50 / 50 = 0.01
    assert abs(bm.transformation_error_info(T, info) - 0.01) < 1e-9


def test_rotmat_to_quat_np_matches_se3():
    rng = np.random.default_rng(1)
    for i in range(10):
        R = np.asarray(se3.random_uniform_rotation(jax.random.PRNGKey(i)))
        q = bm._rotmat_to_quat_np(R)
        R2 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_transform_rmse_golden():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    R = jnp.tile(jnp.eye(3), (2, 1, 1))
    t_gt = jnp.zeros((2, 3))
    t_pred = jnp.asarray([[0.3, 0.0, 0.0], [0.0, 0.4, 0.0]])
    rmse = np.asarray(reg.transform_rmse(src, R, R, t_pred, t_gt))
    np.testing.assert_allclose(rmse, [0.3, 0.4], atol=1e-6)


def test_correspondence_rmse_zero_when_exact():
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    R = se3.random_uniform_rotation(jax.random.PRNGKey(5))
    t = jnp.asarray([0.1, -0.2, 0.05])
    tgt = se3.transform(src, R, t)
    idx = jnp.arange(50)
    rmse = float(reg.correspondence_rmse(src, tgt, idx, idx, R, t))
    assert rmse < 1e-5


def test_mutual_inlier_ratio():
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    tgt = src + 0.001
    row = jnp.arange(40)        # perfect mutual matches
    col = jnp.arange(40)
    ir, mir = reg.mutual_inlier_ratio(src, tgt, row, col,
                                      jnp.eye(3), jnp.zeros(3),
                                      threshold=0.1)
    assert float(ir) == 1.0 and float(mir) == 1.0
    # break mutuality for half the points
    col_broken = col.at[:20].set(39)
    ir2, mir2 = reg.mutual_inlier_ratio(src, tgt, row, col_broken,
                                        jnp.eye(3), jnp.zeros(3), 0.1)
    assert float(ir2) == 1.0
    assert float(mir2) == 1.0  # surviving mutual pairs are still inliers
