"""Tests for ICP, RANSAC, FPFH, CPD, and metrics — the classical stack."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.ops import icp, ransac, fpfh, cpd
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu import metrics
from pointcloudregistration_tpu.core.geometry import estimate_normals
import pytest


def _shape_cloud(n=800, seed=0):
    """Blobby closed surface (deformed sphere) — structured, not gaussian."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = np.arccos(rng.uniform(-1, 1, n))
    r = 1.0 + 0.3 * np.sin(3 * u) * np.sin(2 * v)
    pts = np.stack([r * np.sin(v) * np.cos(u),
                    r * np.sin(v) * np.sin(u),
                    r * np.cos(v)], -1)
    return pts.astype(np.float32)


def test_icp_converges_small_perturbation():
    src = jnp.asarray(_shape_cloud(600))
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(0), (),
                                max_angle_deg=10.0, max_trans=0.1)
    tgt = se3.transform(src, R_gt, t_gt)
    R, t, info = icp.icp(src, tgt, max_dist=0.5, iters=30)
    assert float(metrics.isotropic_R_error(R, R_gt)) < 0.5
    assert float(metrics.isotropic_t_error(t, t_gt)) < 0.01
    assert float(info["fitness"]) > 0.99


def test_icp_partial_overlap():
    full = _shape_cloud(800)
    src = jnp.asarray(full[:600])          # subset
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(1), (),
                                max_angle_deg=5.0, max_trans=0.05)
    tgt = se3.transform(jnp.asarray(full), R_gt, t_gt)
    R, t, info = icp.icp(src, tgt, max_dist=0.3, iters=30)
    assert float(metrics.isotropic_R_error(R, R_gt)) < 1.0


def test_ransac_with_outlier_correspondences():
    src = jnp.asarray(_shape_cloud(500, seed=2))
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(2), (),
                                max_angle_deg=80.0, max_trans=1.0)
    tgt = se3.transform(src, R_gt, t_gt)
    # corrupt 60% of correspondences
    rng = np.random.default_rng(3)
    bad = rng.permutation(500)[:300]
    tgt_np = np.array(tgt)  # writable copy
    tgt_np[bad] = rng.normal(size=(300, 3)).astype(np.float32) * 2.0
    R, t, info = ransac.ransac_correspondences(
        jax.random.PRNGKey(4), src, jnp.asarray(tgt_np), threshold=0.05,
        num_hypotheses=2048)
    assert float(metrics.isotropic_R_error(R, R_gt)) < 1.0
    assert float(metrics.isotropic_t_error(t, t_gt)) < 0.05
    assert float(info["fitness"]) > 0.35


def test_fpfh_rotation_invariance():
    pts = _shape_cloud(400, seed=5)
    ptsj = jnp.asarray(pts)
    _, nidx = knn_ops.knn(ptsj, ptsj, 16)
    normals = estimate_normals(ptsj, nidx)
    f1 = fpfh.fpfh(ptsj, normals, radius=0.5, k=32)
    R, t = se3.random_se3(jax.random.PRNGKey(6), (), max_angle_deg=90.0)
    pts_r = se3.transform(ptsj, R, t)
    normals_r = jnp.einsum("ij,nj->ni", R, normals)
    f2 = fpfh.fpfh(pts_r, normals_r, radius=0.5, k=32)
    # descriptors must be (nearly) invariant under rigid motion
    err = float(jnp.abs(f1 - f2).max())
    assert err < 0.05, err


@pytest.mark.slow
def test_fpfh_ransac_global_registration():
    """The DataPreparation headline flow: FPFH + RANSAC + ICP refine."""
    pts = _shape_cloud(700, seed=7)
    src = jnp.asarray(pts)
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(8), (),
                                max_angle_deg=60.0, max_trans=0.8)
    tgt = se3.transform(src, R_gt, t_gt)
    _, nidx = knn_ops.knn(src, src, 16)
    n_src = estimate_normals(src, nidx)
    _, nidx_t = knn_ops.knn(tgt, tgt, 16)
    n_tgt = estimate_normals(tgt, nidx_t)
    f_src = fpfh.fpfh(src, n_src, radius=0.4, k=32)
    f_tgt = fpfh.fpfh(tgt, n_tgt, radius=0.4, k=32)
    R, t, info = ransac.ransac_feature_matching(
        jax.random.PRNGKey(9), src, tgt, f_src, f_tgt,
        threshold=0.1, num_hypotheses=4096, mutual=True)
    # refine with ICP
    R2, t2, _ = icp.icp(src, tgt, max_dist=0.2, iters=20, R0=R, t0=t)
    assert float(metrics.isotropic_R_error(R2, R_gt)) < 1.0
    assert float(metrics.isotropic_t_error(t2, t_gt)) < 0.02


def test_cpd_rigid():
    src = jnp.asarray(_shape_cloud(300, seed=10))
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(11), (),
                                max_angle_deg=30.0, max_trans=0.3)
    tgt = se3.transform(src, R_gt, t_gt)
    # CPD aligns y (source) onto x (target)
    s, R, t, sigma2 = cpd.cpd_rigid(tgt, src, iters=60)
    assert abs(float(s) - 1.0) < 0.02
    assert float(metrics.isotropic_R_error(R, R_gt)) < 2.0
    assert float(sigma2) < 1e-4


def test_cpd_affine():
    src = jnp.asarray(_shape_cloud(300, seed=12))
    B_gt = jnp.asarray(np.diag([1.2, 0.9, 1.05]).astype(np.float32))
    t_gt = jnp.asarray([0.2, -0.1, 0.05])
    tgt = src @ B_gt.T + t_gt
    B, t, sigma2 = cpd.cpd_affine(tgt, src, iters=60)
    np.testing.assert_allclose(B, B_gt, atol=0.05)
    np.testing.assert_allclose(t, t_gt, atol=0.05)


def test_cpd_nonrigid_reduces_distance():
    src_np = _shape_cloud(250, seed=13)
    # smooth deformation
    tgt_np = src_np + 0.15 * np.sin(src_np[:, :1] * 2.0) * np.array([[0, 1.0, 0]])
    src, tgt = jnp.asarray(src_np), jnp.asarray(tgt_np.astype(np.float32))
    before = float(knn_ops.chamfer(src, tgt))
    warped, _, _ = cpd.cpd_nonrigid(tgt, src, beta=1.0, lam=1.0, iters=30)
    after = float(knn_ops.chamfer(warped, tgt))
    assert after < before * 0.2, (before, after)


def test_metrics_basic():
    R = se3.random_uniform_rotation(jax.random.PRNGKey(14), (8,))
    # fp32 arccos floor: arccos(1-eps) ~ sqrt(2 eps) ~ 0.06 deg
    assert float(jnp.max(metrics.isotropic_R_error(R, R))) < 0.1
    # 10-degree known error
    R10 = se3.euler_to_rotmat(jnp.asarray([np.deg2rad(10.0), 0, 0]))
    err = metrics.isotropic_R_error(R10[None], jnp.eye(3)[None])
    np.testing.assert_allclose(float(err[0]), 10.0, atol=1e-3)
    # recall gates
    rre = jnp.asarray([5.0, 20.0, 10.0])
    rte = jnp.asarray([0.1, 0.1, 0.5])
    np.testing.assert_allclose(float(metrics.registration_recall(rre, rte)),
                               1.0 / 3.0, rtol=1e-6)
    # inlier ratio / FMR
    src = jax.random.normal(jax.random.PRNGKey(15), (100, 3))
    ir = metrics.inlier_ratio(src, src, jnp.eye(3), jnp.zeros(3), 0.1)
    assert float(ir) == 1.0
