import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from pointcloudregistration_tpu.ops import knn, fps, ball_query, subsample
from pointcloudregistration_tpu.ops import nnd_pallas


def _clouds(n=500, m=700, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(m, 3)).astype(np.float32))


def test_nn_search_vs_kdtree():
    x, y = _clouds()
    d, i = knn.nn_search(jnp.asarray(x), jnp.asarray(y), block=256)
    tree = cKDTree(y)
    d_ref, i_ref = tree.query(x, k=1)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref**2, rtol=1e-4, atol=1e-5)


def test_nn_search_masked():
    x, y = _clouds(100, 200)
    ymask = np.ones(200, bool)
    ymask[50:] = False
    d, i = knn.nn_search(jnp.asarray(x), jnp.asarray(y),
                         ref_mask=jnp.asarray(ymask), block=64)
    tree = cKDTree(y[:50])
    d_ref, i_ref = tree.query(x, k=1)
    np.testing.assert_array_equal(np.asarray(i), i_ref)


def test_knn_vs_kdtree():
    x, y = _clouds(300, 900)
    for block in (900, 256):
        d, i = knn.knn(jnp.asarray(x), jnp.asarray(y), 8, block=block)
        tree = cKDTree(y)
        d_ref, i_ref = tree.query(x, k=8)
        np.testing.assert_allclose(np.sort(np.asarray(d), -1),
                                   np.sort(d_ref**2, -1), rtol=1e-3, atol=1e-5)
        # sets of indices must match (ordering may differ on ties)
        assert (np.sort(np.asarray(i), -1) == np.sort(i_ref, -1)).mean() > 0.999


def test_chamfer_symmetric_and_zero():
    x, _ = _clouds(400, 400)
    xj = jnp.asarray(x)
    assert float(knn.chamfer(xj, xj)) < 1e-6
    _, y = _clouds(400, 300, seed=3)
    yj = jnp.asarray(y)
    np.testing.assert_allclose(float(knn.chamfer(xj, yj)),
                               float(knn.chamfer(yj, xj)), rtol=1e-5)


def test_truncated_chamfer_drops_outliers():
    x, _ = _clouds(200, 200)
    xj = jnp.asarray(x)
    y = np.concatenate([x[:150], x[150:] + 100.0])  # 50 far outliers
    yj = jnp.asarray(y)
    full = knn.chamfer(xj, yj)
    trunc = knn.truncated_chamfer(xj, yj, trunc=1.0)
    assert float(trunc) < float(full)
    # exact numpy reference of the NDP semantics (loss.py:60-218): per
    # direction, mean over the terms below the truncation threshold
    tree_y = cKDTree(y); tree_x = cKDTree(x)
    d1 = tree_y.query(x, k=1)[0] ** 2
    d2 = tree_x.query(y, k=1)[0] ** 2
    ref = d1[d1 < 1.0].mean() + d2[d2 < 1.0].mean()
    np.testing.assert_allclose(float(trunc), ref, rtol=1e-4)


def test_nnd_gradients():
    x, y = _clouds(50, 60)
    g = jax.grad(lambda a, b: jnp.sum(knn.nn_distance(a, b)[0]))(
        jnp.asarray(x), jnp.asarray(y))
    # numerical check on one coordinate
    eps = 1e-3
    x2 = x.copy(); x2[7, 1] += eps
    f0 = float(jnp.sum(knn.nn_distance(jnp.asarray(x), jnp.asarray(y))[0]))
    f1 = float(jnp.sum(knn.nn_distance(jnp.asarray(x2), jnp.asarray(y))[0]))
    np.testing.assert_allclose(float(g[7, 1]), (f1 - f0) / eps, atol=1e-2)


def test_pallas_nnd_matches_reference():
    x, y = _clouds(777, 1333, seed=5)   # deliberately non-tile-aligned
    d_ref, i_ref = knn.nn_search(jnp.asarray(x), jnp.asarray(y))
    d_p, i_p = nnd_pallas.nn_search(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_nnd_batched_and_grad():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 200, 3)).astype(np.float32)
    y = rng.normal(size=(2, 300, 3)).astype(np.float32)
    d1, i1, d2, i2 = nnd_pallas.nn_distance(jnp.asarray(x), jnp.asarray(y))
    assert d1.shape == (2, 200) and d2.shape == (2, 300)
    g = jax.grad(lambda a: jnp.sum(nnd_pallas.nn_distance(a, jnp.asarray(y))[0]))(
        jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_pallas_bidir_kernel_matches_jnp():
    """Fused bidirectional kernel vs the jnp reference, asymmetric sizes
    crossing tile boundaries both sides."""
    from pointcloudregistration_tpu.ops import knn as knn_ops
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1500, 3)).astype(np.float32)
    y = rng.normal(size=(2100, 3)).astype(np.float32)
    d1, i1, d2, i2 = nnd_pallas.nn_distance_T(
        jnp.asarray(x.T), jnp.asarray(y.T), interpret=True)
    r1, j1, r2, j2 = knn_ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(j2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)


def test_fps_spreads():
    rng = np.random.default_rng(1)
    # two well-separated clusters: FPS must pick from both
    pts = np.concatenate([rng.normal(size=(100, 3)) * 0.1,
                          rng.normal(size=(100, 3)) * 0.1 + 10.0]).astype(np.float32)
    idx = fps.fps(jnp.asarray(pts), 16)
    sel = np.asarray(idx)
    assert len(np.unique(sel)) == 16
    assert (sel < 100).any() and (sel >= 100).any()


def test_fps_masked():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool); mask[:40] = True
    idx = np.asarray(fps.fps(jnp.asarray(pts), 10, jnp.asarray(mask)))
    assert (idx < 40).all()


def test_ball_query():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    centers = pts[:32]
    r, k = 0.4, 16
    idx, valid = ball_query.ball_query(jnp.asarray(centers), jnp.asarray(pts), r, k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    d = np.linalg.norm(centers[:, None] - pts[idx], axis=-1)
    assert (d[valid] <= r + 1e-5).all()
    # center itself is always its own nearest in-ball neighbor
    assert (idx[:, 0] == np.arange(32)).all()
    # valid count matches brute force (capped at k)
    d_all = np.linalg.norm(centers[:, None] - pts[None], axis=-1)
    cnt_ref = np.minimum((d_all <= r).sum(-1), k)
    np.testing.assert_array_equal(valid.sum(-1), cnt_ref)


def test_grid_subsample():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    sub, live = subsample.grid_subsample(jnp.asarray(pts), 0.25, 128)
    sub, live = np.asarray(sub), np.asarray(live)
    # occupied-cell count matches numpy reference
    # same cell convention as the op: origin at the per-axis min corner
    cells = np.floor((pts - pts.min(0)) / 0.25).astype(int)
    ids = cells[:, 0] + cells[:, 1] * 1024 + cells[:, 2] * 1024**2
    uniq = np.unique(ids)
    assert live.sum() == len(uniq)
    # barycenters match per-cell means
    order = np.argsort(ids, kind="stable")
    ref = {}
    for i in order:
        ref.setdefault(ids[i], []).append(pts[i])
    ref_bary = np.stack([np.mean(ref[u], 0) for u in uniq])
    np.testing.assert_allclose(sub[live], ref_bary, atol=1e-5)
    # voxel property: each barycenter within its own voxel diagonal
    assert ((sub[live].max(0) <= 1.0 + 1e-5).all()
            and (sub[live].min(0) >= -1e-5).all())


def test_grid_subsample_masked_and_capacity():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    mask = np.zeros(500, bool); mask[:250] = True
    sub, live = subsample.grid_subsample(jnp.asarray(pts), 0.5, 64,
                                         jnp.asarray(mask))
    cells = np.floor(pts[:250] / 0.5).astype(int)
    # all barycenters derive only from unmasked points (coords within hull)
    assert np.asarray(live).sum() <= 8
    # tiny capacity: never crashes, keeps <= capacity rows
    sub2, live2 = subsample.grid_subsample(jnp.asarray(pts), 0.1, 16)
    assert np.asarray(live2).sum() <= 16


def test_pallas_truncated_chamfer_masked_matches_jnp():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(150, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32))
    xm = jnp.asarray(rng.uniform(size=150) > 0.3)
    ym = jnp.asarray(rng.uniform(size=200) > 0.3)
    ref = knn.truncated_chamfer(x, y, 0.5, x_mask=xm, y_mask=ym)
    got = nnd_pallas.truncated_chamfer(x, y, 0.5, x_mask=xm, y_mask=ym)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
    # untruncated masked variant too (NDP default trunc)
    ref2 = knn.truncated_chamfer(x, y, 1e9, x_mask=xm, y_mask=ym)
    got2 = nnd_pallas.truncated_chamfer(x, y, 1e9, x_mask=xm, y_mask=ym)
    np.testing.assert_allclose(float(got2), float(ref2), rtol=1e-4)
