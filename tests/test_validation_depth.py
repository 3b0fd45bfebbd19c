"""Validation harness + depth geometry + distributed helper tests."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.ops import depth as depth_mod
from pointcloudregistration_tpu.parallel import distributed
from pointcloudregistration_tpu.pipelines import validation, c2p
from pointcloudregistration_tpu.models import ndp
import pytest


def test_backproject_roundtrip():
    d = jnp.ones((20, 30)) * 2.0
    pts, valid = depth_mod.backproject_depth(d, 10.0, 10.0, 15.0, 10.0)
    assert pts.shape == (600, 3) and bool(valid.all())
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0)
    # center pixel maps to the optical axis
    center = np.asarray(pts.reshape(20, 30, 3)[10, 15])
    np.testing.assert_allclose(center[:2], 0.0, atol=1e-5)


def test_depth_to_mesh():
    d = np.ones((10, 12), np.float32)
    d[:, 6:] = 5.0          # depth discontinuity -> culled faces
    d[0, 0] = 0.0           # invalid pixel
    verts, faces, mask = depth_mod.depth_to_mesh(jnp.asarray(d),
                                                 20.0, 20.0, 6.0, 5.0,
                                                 max_edge=0.5)
    assert verts.shape == (120, 3)
    assert faces.shape == (2 * 9 * 11, 3)
    m = np.asarray(mask)
    assert 0 < m.sum() < len(m)           # some culled, some kept
    # faces touching the invalid pixel are culled
    bad_faces = np.any(np.asarray(faces) == 0, -1)
    assert not m[bad_faces].any()


@pytest.mark.slow
def test_validation_harness():
    cfg = c2p.C2PConfig(
        ransac_hypotheses=2048, icp_iters=10,
        ndp=ndp.NDPConfig(m=3, k0=-2, depth=2, width=16, iters=6,
                          nn_backend="jnp"))
    res = validation.validate(jax.random.PRNGKey(0), n_pairs=2,
                              n_points=400, cfg=cfg)
    assert len(res["per_pair"]) == 2
    for row in res["per_pair"]:
        assert np.isfinite(row["cd_registered"])
        assert row["wall_time_s"] > 0
    assert set(res["mean"]) == set(res["per_pair"][0])


def test_local_pair_range_single_host():
    start, end = distributed.local_pair_range(100)
    assert (start, end) == (0, 100)


def test_global_mesh_blocks():
    m = distributed.global_mesh(n_blocks=4)
    assert m.shape["blocks"] == 4
    assert m.shape["pairs"] * 4 == len(jax.devices())


@pytest.mark.slow
def test_validation_export_dir(tmp_path):
    import os
    import numpy as np
    import jax
    from pointcloudregistration_tpu.pipelines import c2p, validation
    cfg = c2p.C2PConfig(ransac_hypotheses=512, icp_iters=5,
                        ndp=c2p.C2PConfig().ndp._replace(m=2, iters=3,
                                                         width=16))
    d = str(tmp_path / "exports")
    validation.validate(jax.random.PRNGKey(0), n_pairs=1, n_points=256,
                        cfg=cfg, export_dir=d)
    files = sorted(os.listdir(d))
    assert "pair000_warped.ply" in files and "pair000_history.npz" in files
    from pointcloudregistration_tpu.data import loaders
    pts = loaders.read_ply_points(os.path.join(d, "pair000_warped.ply"))
    assert pts.shape == (256, 3)
    with np.load(os.path.join(d, "pair000_history.npz")) as z:
        assert z["R"].shape == (3, 3) and "ndp_losses" in z
