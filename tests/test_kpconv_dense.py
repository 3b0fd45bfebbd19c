"""Dense-radius KPConv (ops/kpconv_pallas.py) vs the gather/table path.

Equivalence contract: on a cloud where no point has more in-cutoff
neighbors than the table cap K_n, the dense path (no tables) must
reproduce the gather path exactly — dense radius semantics are the
uncapped limit of the table semantics
(reference: c2p-net/ngenet/models/KPConv/blocks.py:73-128 conv,
pool-table max_pool shortcut; dataloader.py:12-25 radius tables).

These run on the CPU backend (conftest), exercising the jnp reference
branch of kpconv_dense; the Pallas branch is golden-tested against the
same reference on real TPU (examples/kpconv_dense_tpu_check.py, PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudregistration_tpu.models.kpconv import (
    KPConv, ResnetBottleneckBlock, kernel_points)
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops.kpconv_pallas import (dense_maxpool,
                                                          kpconv_dense)

RADIUS = 0.3
K_CAP = 24


def _cloud(n, rng, spread=4.0):
    """Random cloud spread enough that in-RADIUS neighborhoods stay well
    under K_CAP (so the table cap never truncates)."""
    return jnp.asarray(rng.uniform(-spread / 2, spread / 2,
                                   (n, 3)).astype(np.float32))


def _table(q, s, s_mask, cutoff):
    d2, idx = knn_ops.knn(q, s, K_CAP, ref_mask=s_mask)
    nm = d2 <= cutoff * cutoff
    # no truncation allowed in the equivalence fixture: the K_CAP'th
    # neighbor must be outside the cutoff for every query
    assert bool(jnp.all(d2[:, -1] > cutoff * cutoff))
    return jnp.where(nm, idx, 0), nm


def test_kpconv_dense_matches_gather(rng):
    q = _cloud(96, rng)
    feats = jnp.asarray(rng.normal(size=(96, 16)).astype(np.float32))
    nb, nbm = _table(q, q, None, RADIUS)
    m = KPConv(out_dim=24, radius=RADIUS)
    md = KPConv(out_dim=24, radius=RADIUS, dense=True)
    params = m.init(jax.random.PRNGKey(0), q, q, feats, nb, nbm)
    ref = m.apply(params, q, q, feats, nb, nbm)
    out = md.apply(params, q, q, feats)          # same param tree
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_kpconv_dense_masks(rng):
    """Masked supports contribute nothing; masked queries output 0."""
    q = _cloud(64, rng)
    feats = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    s_mask = jnp.asarray(rng.random(64) > 0.3)
    q_mask = jnp.asarray(rng.random(64) > 0.3)
    kp = jnp.asarray(kernel_points(15, RADIUS))
    W = jnp.asarray(rng.normal(size=(15, 8, 12)).astype(np.float32)) * 0.1
    out = kpconv_dense(q, q, feats, s_mask, q_mask, kp, W,
                       cutoff=RADIUS, extent=RADIUS * 0.8)
    assert np.allclose(np.asarray(out)[~np.asarray(q_mask)], 0.0)
    # dropping a masked support's features changes nothing
    feats2 = jnp.where(s_mask[:, None], feats, 77.0)
    out2 = kpconv_dense(q, q, feats2, s_mask, q_mask, kp, W,
                        cutoff=RADIUS, extent=RADIUS * 0.8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_resnet_block_dense_matches_gather_strided(rng):
    """Strided bottleneck: dense conv at the 2x pool cutoff + dense
    max-pool shortcut == pool-table path when the cap doesn't bind."""
    s = _cloud(96, rng)
    q = s[:32] + 0.01                    # coarse level
    feats = jnp.asarray(rng.normal(size=(96, 16)).astype(np.float32))
    pool, poolm = _table(q, s, None, 2 * RADIUS)
    blk = ResnetBottleneckBlock(out_dim=32, radius=RADIUS, strided=True)
    blkd = ResnetBottleneckBlock(out_dim=32, radius=RADIUS, strided=True,
                                 dense=True)
    params = blk.init(jax.random.PRNGKey(1), q, s, feats, pool, poolm,
                      False)
    ref = blk.apply(params, q, s, feats, pool, poolm, False)
    out = blkd.apply(params, q, s, feats, None, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_dense_maxpool_matches_table(rng):
    s = _cloud(96, rng)
    q = s[:24]
    feats = jnp.asarray(rng.normal(size=(96, 8)).astype(np.float32))
    s_mask = jnp.asarray(rng.random(96) > 0.2)
    pool, poolm = _table(q, s, s_mask, 2 * RADIUS)
    ref = jnp.where(poolm[..., None],
                    feats[pool], -jnp.inf).max(axis=-2)
    ref = jnp.where(jnp.isfinite(ref), ref, 0.0)
    out = dense_maxpool(q, s, feats, s_mask, cutoff=2 * RADIUS, chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_kpconv_dense_grads_finite_and_match(rng):
    """CPU branch autodiff: d/dfeats and d/dW of the dense conv equal the
    finite-difference direction (smoke-level) and are finite."""
    q = _cloud(48, rng)
    feats = jnp.asarray(rng.normal(size=(48, 8)).astype(np.float32))
    kp = jnp.asarray(kernel_points(15, RADIUS))
    W = jnp.asarray(rng.normal(size=(15, 8, 8)).astype(np.float32)) * 0.1
    ones = jnp.ones(48, bool)

    def loss(f, w):
        out = kpconv_dense(q, q, f, ones, ones, kp, w,
                           cutoff=RADIUS, extent=RADIUS * 0.8)
        return jnp.sum(out ** 2)

    df, dw = jax.grad(loss, argnums=(0, 1))(feats, W)
    assert bool(jnp.isfinite(df).all()) and bool(jnp.isfinite(dw).all())
    # directional finite difference
    v = jnp.asarray(rng.normal(size=feats.shape).astype(np.float32))
    eps = 1e-3
    fd = (loss(feats + eps * v, W) - loss(feats - eps * v, W)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(df, v)), float(fd),
                               rtol=2e-2)


def test_ngenet_dense_forward_shapes(rng):
    """Full NgeNet with dense=True on light pyramids: shapes + finiteness
    + param-tree identity with the gather model (checkpoint interop)."""
    from pointcloudregistration_tpu.models.ngenet import (NgeNet,
                                                          NgeNetConfig)
    from pointcloudregistration_tpu.ops.pyramid import (PyramidConfig,
                                                        build_pyramid)
    from pointcloudregistration_tpu.pipelines import ngenet as ng

    pcfg = PyramidConfig(capacities=(128, 64, 32, 16),
                         neighbor_caps=(8, 8, 8, 8))
    cfg = NgeNetConfig(first_feats_dim=16, gnn_feats_dim=16,
                       final_feats_dim=8, ppf_k=8, dense=True)
    pts = _cloud(128, rng, spread=1.0)
    tcfg = ng.NgeNetTrainConfig(model=cfg, pyramid=pcfg, n_points=128)
    pyr, n3 = ng._pyramid_with_normals(pts, None, pcfg, dense=True)
    assert pyr["neighbors"] == [] and pyr["pools"] == []
    model = NgeNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pyr, pyr, n3, n3,
                           train=False)
    out_s, out_t = model.apply(variables, pyr, pyr, n3, n3, train=False)
    assert out_s["feats_h"].shape == (128, 8)
    assert bool(jnp.isfinite(out_s["feats_h"]).all())
    # param tree matches the gather model exactly (interchangeable ckpts)
    pyr_g, _ = ng._pyramid_with_normals(pts, None, pcfg, dense=False)
    gather_model = NgeNet(cfg._replace(dense=False))
    vg = gather_model.init(jax.random.PRNGKey(0), pyr_g, pyr_g, n3, n3,
                           train=False)
    paths = lambda v: set(map(str, jax.tree_util.tree_leaves_with_path(
        jax.tree.map(lambda x: x.shape, v))))
    assert paths(vg) == paths(variables)
