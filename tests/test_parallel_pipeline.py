"""Pipeline-level sharded drivers on the 8-virtual-device CPU mesh:
DP-sharded batch registration and distributed block-ICP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.parallel import mesh as mesh_mod, pipeline


@pytest.fixture(scope="module")
def pairs_mesh():
    return mesh_mod.make_mesh(n_pairs=4, n_blocks=2)


@pytest.mark.slow
def test_register_batch_sharded_matches_unsharded(pairs_mesh):
    from pointcloudregistration_tpu.pipelines import c2p
    cfg = c2p.C2PConfig(
        ransac_hypotheses=1024, icp_iters=8, run_ndp=False)
    key = jax.random.PRNGKey(0)
    data = synthetic.make_batch(key, 4, n_points=512, deform_amp=0.0)
    args = (data["source"], data["target"], data["source_mask"],
            data["target_mask"])
    sharded = pipeline.register_batch_sharded(pairs_mesh, key, *args,
                                              cfg=cfg)
    dense = c2p.register_batch(key, *args, cfg=cfg)
    # same program, same keys: results must agree to float tolerance
    np.testing.assert_allclose(np.asarray(sharded["R"]),
                               np.asarray(dense["R"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded["chamfer_rigid"]),
                               np.asarray(dense["chamfer_rigid"]),
                               atol=1e-5)


def test_sharded_icp_recovers_se3():
    m = mesh_mod.make_mesh(n_pairs=1, n_blocks=8)
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1024, 3)).astype(np.float32)
    ang = np.deg2rad(8.0)
    R_gt = np.array([[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0],
                     [0, 0, 1]], np.float32)
    t_gt = np.array([0.05, -0.02, 0.03], np.float32)
    tgt = src @ R_gt.T + t_gt
    # shuffle target so blocks don't align with source blocks
    tgt = tgt[rng.permutation(len(tgt))]
    R, t, info = pipeline.sharded_icp(m, jnp.asarray(src), jnp.asarray(tgt),
                                      max_dist=0.5, iters=15,
                                      max_dist_final=0.05)
    assert float(jnp.abs(jnp.asarray(R) - R_gt).max()) < 1e-3
    assert float(jnp.abs(jnp.asarray(t) - t_gt).max()) < 1e-3
    assert float(info["fitness"]) > 0.99
    # matches the dense single-device ICP
    Rd, td, _ = icp_mod.icp(jnp.asarray(src), jnp.asarray(tgt), 0.5,
                            iters=15, max_dist_final=0.05)
    np.testing.assert_allclose(np.asarray(R), np.asarray(Rd), atol=1e-3)


def test_sharded_icp_masked():
    m = mesh_mod.make_mesh(n_pairs=1, n_blocks=8)
    rng = np.random.default_rng(1)
    src = rng.normal(size=(512, 3)).astype(np.float32)
    src_mask = np.ones(512, bool)
    src_mask[400:] = False                       # padded tail
    src[400:] = 50.0                             # far-away padding
    tgt = np.concatenate([src[:400], rng.normal(size=(112, 3)) + 5.0]
                         ).astype(np.float32)
    tgt_mask = np.ones(512, bool)
    tgt_mask[400:] = False
    R, t, info = pipeline.sharded_icp(
        m, jnp.asarray(src), jnp.asarray(tgt), max_dist=0.2, iters=8,
        src_mask=jnp.asarray(src_mask), tgt_mask=jnp.asarray(tgt_mask))
    # identical (masked) clouds: identity recovery
    assert float(jnp.abs(jnp.asarray(R) - np.eye(3)).max()) < 1e-4
    assert float(jnp.abs(jnp.asarray(t)).max()) < 1e-4
