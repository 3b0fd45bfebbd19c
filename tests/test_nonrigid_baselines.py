"""Sinkhorn / ED / NSFP baselines + dispatcher tests."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models import ndp
from pointcloudregistration_tpu.ops import sinkhorn, deformation_graph as dg
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.pipelines import nonrigid
import pytest


def _deformed_pair(n=400, amp=0.08, seed=0):
    views = synthetic.modality_views(jax.random.PRNGKey(seed), n,
                                     deform_amp=amp)
    return views["tof"], views["pc"], views["pc_mask"]


def test_log_optimal_transport_doubly_stochastic():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(20, 30)).astype(np.float32))
    Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(1.0), iters=200)
    P = np.exp(np.asarray(Z))
    # marginals: each row of the augmented matrix sums to its target measure
    np.testing.assert_allclose(P[:-1].sum(1), np.full(20, 1.0), atol=1e-3)
    np.testing.assert_allclose(P[:, :-1].sum(0), np.full(30, 1.0), atol=1e-3)


def test_sinkhorn_coupling_identity():
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(50, 3)).astype(np.float32))
    P = sinkhorn.sinkhorn_coupling(x, x, epsilon=1e-3, iters=200)
    # strongest mass on the diagonal
    assert (np.argmax(np.asarray(P), -1) == np.arange(50)).mean() > 0.95


def test_sinkhorn_warp_reduces_chamfer():
    src, tgt, tmask = _deformed_pair()
    before = float(knn_ops.chamfer(src, tgt, y_mask=tmask))
    warped = sinkhorn.sinkhorn_warp(src, tgt, epsilon=0.005, iters=100,
                                    y_mask=tmask)
    after = float(knn_ops.chamfer(warped, tgt, y_mask=tmask))
    assert after < before


def test_deformation_graph_structure():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(2), 500)
    g = dg.build_graph(pts, n_nodes=32, n_edges=4, n_anchors=4)
    assert g["nodes"].shape == (32, 3)
    assert g["edges"].shape == (32, 4)
    assert g["anchors"].shape == (500, 4)
    np.testing.assert_allclose(np.asarray(g["weights"]).sum(-1), 1.0,
                               atol=1e-5)
    # identity node transforms -> identity warp
    warped = dg.ed_warp(pts, g, jnp.tile(jnp.eye(3), (32, 1, 1)),
                        jnp.zeros((32, 3)))
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts),
                               atol=1e-5)
    # uniform translation of all nodes translates every point
    warped = dg.ed_warp(pts, g, jnp.tile(jnp.eye(3), (32, 1, 1)),
                        jnp.ones((32, 3)) * 0.5)
    np.testing.assert_allclose(np.asarray(warped - pts), 0.5, atol=1e-5)


def test_arap_zero_for_rigid():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(3), 300)
    g = dg.build_graph(pts, n_nodes=16)
    # identity => zero; uniform translation => zero
    c0 = dg.arap_cost(g, jnp.tile(jnp.eye(3), (16, 1, 1)),
                      jnp.zeros((16, 3)))
    c1 = dg.arap_cost(g, jnp.tile(jnp.eye(3), (16, 1, 1)),
                      jnp.ones((16, 3)))
    assert float(c0) < 1e-10 and float(c1) < 1e-10
    # random rotations per node => positive
    import jax as _jax
    from pointcloudregistration_tpu.core import se3
    R = se3.random_uniform_rotation(_jax.random.PRNGKey(4), (16,))
    assert float(dg.arap_cost(g, R, jnp.zeros((16, 3)))) > 1e-4


def test_ed_registration_reduces_chamfer():
    src, tgt, tmask = _deformed_pair(300)
    warped, aux = dg.nicp_register(jax.random.PRNGKey(5), src, tgt,
                                   iters=60, n_nodes=48, w_arap=1.0,
                                   tgt_mask=tmask)
    assert float(aux["losses"][-1]) < float(aux["losses"][0])
    before = float(knn_ops.chamfer(src, tgt, y_mask=tmask))
    after = float(knn_ops.chamfer(warped, tgt, y_mask=tmask))
    assert after < before


def test_nsfp_reduces_chamfer():
    src, tgt, tmask = _deformed_pair(300)
    warped, aux = dg.nsfp_register(jax.random.PRNGKey(6), src, tgt,
                                   iters=100, width=64, depth=3,
                                   tgt_mask=tmask)
    before = float(knn_ops.chamfer(src, tgt, y_mask=tmask))
    after = float(knn_ops.chamfer(warped, tgt, y_mask=tmask))
    assert after < before


@pytest.mark.slow
def test_dispatcher_all_models():
    src, tgt, tmask = _deformed_pair(250)
    tiny_ndp = ndp.NDPConfig(m=3, k0=-2, depth=2, width=16, iters=8)
    for model in ("NDP", "Sinkhorn", "ED", "NSFP", "Nerfies"):
        cfg = nonrigid.NonRigidConfig(model=model, ndp=tiny_ndp,
                                      ed_iters=20, nsfp_iters=30,
                                      nerfies_iters=20, ed_nodes=32)
        warped, aux = nonrigid.register(jax.random.PRNGKey(7), src, tgt,
                                        cfg, tgt_mask=tmask)
        assert warped.shape == src.shape
        assert np.isfinite(float(aux["chamfer_after"]))


def test_geodesic_distances_respect_topology():
    """Two parallel line segments: geodesic distance between them is huge
    even though euclidean distance is small."""
    t = np.linspace(0, 1, 50, dtype=np.float32)
    line1 = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
    line2 = np.stack([t, np.full_like(t, 0.5), np.zeros_like(t)], -1)
    pts = jnp.asarray(np.concatenate([line1, line2]))
    gd = dg.geodesic_distances(pts, jnp.asarray([0]), k=3, relax_iters=64)
    gd = np.asarray(gd)[0]
    # along line1: finite, roughly arc length
    assert gd[49] < 1.5
    # line2 unreachable through the 3-NN graph
    assert gd[50:].min() > 1e8


def test_build_graph_geodesic():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(20), 400)
    g = dg.build_graph_geodesic(pts, n_nodes=24, n_edges=4, n_anchors=4)
    assert g["edges"].shape == (24, 4)
    np.testing.assert_allclose(np.asarray(g["weights"]).sum(-1), 1.0,
                               atol=1e-4)
    # warp with identity is identity
    warped = dg.ed_warp(pts, g, jnp.tile(jnp.eye(3), (24, 1, 1)),
                        jnp.zeros((24, 3)))
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts),
                               atol=1e-5)


@pytest.mark.slow
def test_nerfies_reduces_chamfer():
    src, tgt, tmask = _deformed_pair(300)
    warped, aux = dg.nerfies_register(jax.random.PRNGKey(8), src, tgt,
                                      iters=120, width=64, depth=3,
                                      tgt_mask=tmask)
    before = float(knn_ops.chamfer(src, tgt, y_mask=tmask))
    after = float(knn_ops.chamfer(warped, tgt, y_mask=tmask))
    assert after < before
    assert np.all(np.isfinite(np.asarray(aux["losses"])))


def test_nerfies_regularization_identity_warp_is_zero():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)),
                      jnp.float32)
    reg_id = float(dg.nerfies_regularization_from_points(lambda x: x, pts))
    assert abs(reg_id) < 1e-8
    # a uniform scale s has all singular values = s -> reg = log(s)^2
    s = 2.0
    reg_scale = float(dg.nerfies_regularization_from_points(
        lambda x: s * x, pts))
    assert abs(reg_scale - np.log(s) ** 2) < 1e-5
