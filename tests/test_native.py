"""Native C++ host-kernel tests: build, correctness vs scipy/jnp ops."""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from pointcloudregistration_tpu import native


def test_native_builds():
    assert native.get_lib() is not None, native._build_error


def test_native_nn_search():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 3)).astype(np.float32)
    y = rng.normal(size=(700, 3)).astype(np.float32)
    d2, idx = native.nn_search(x, y)
    d_ref, i_ref = cKDTree(y).query(x, k=1)
    np.testing.assert_array_equal(idx, i_ref)
    np.testing.assert_allclose(d2, d_ref ** 2, rtol=1e-4, atol=1e-6)


def test_native_radius_knn():
    rng = np.random.default_rng(1)
    q = rng.uniform(size=(200, 3)).astype(np.float32)
    s = rng.uniform(size=(800, 3)).astype(np.float32)
    idx, mask = native.radius_knn(q, s, radius=0.15, k=16)
    tree = cKDTree(s)
    for i in range(0, 200, 17):
        ref = sorted(tree.query_ball_point(q[i], 0.15),
                     key=lambda j: ((q[i] - s[j]) ** 2).sum())[:16]
        got = list(idx[i][mask[i]])
        assert got == ref, (i, got, ref)


def test_native_grid_subsample_matches_jax_op():
    import jax
    import jax.numpy as jnp
    from pointcloudregistration_tpu.ops import subsample
    rng = np.random.default_rng(2)
    pts = rng.uniform(size=(1000, 3)).astype(np.float32)
    out_c, mask_c = native.grid_subsample(pts, 0.2, 256)
    out_j, mask_j = subsample.grid_subsample(jnp.asarray(pts), 0.2, 256)
    nc, nj = int(mask_c.sum()), int(np.asarray(mask_j).sum())
    assert nc == nj
    np.testing.assert_allclose(out_c[:nc], np.asarray(out_j)[:nj], atol=1e-5)


def test_native_fps():
    rng = np.random.default_rng(3)
    pts = np.concatenate([rng.normal(size=(100, 3)) * 0.1,
                          rng.normal(size=(100, 3)) * 0.1 + 10]).astype(
        np.float32)
    idx = native.fps(pts, 16)
    assert len(np.unique(idx)) == 16
    assert (idx < 100).any() and (idx >= 100).any()
