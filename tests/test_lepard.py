"""Lepard landmark-stage tests: rotary PE, transformer, matching, OR net."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models import lepard, ndp
from pointcloudregistration_tpu.ops import knn as knn_ops

_CFG = lepard.LepardConfig(feat_dim=48, nhead=4,
                           layers=("self", "cross", "positioning",
                                   "self", "cross"))


def test_rotary_encoding_shapes_and_distinct():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(0), 100)
    pe = lepard.volumetric_rotary_encoding(pts, 48)
    assert pe.shape == (100, 48)
    # nearby points similar, far points different
    assert float(jnp.linalg.norm(pe[0] - pe[1])) != 0.0


def test_embed_rotary_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(1), (50, 48))
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(2), 50)
    pe = lepard.volumetric_rotary_encoding(pts, 48)
    # cos/sin pairs are unit rotations -> per-pair norms preserved
    out = lepard.embed_rotary(x, pe)
    n_in = jnp.linalg.norm(x.reshape(50, 24, 2), axis=-1)
    n_out = jnp.linalg.norm(out.reshape(50, 24, 2), axis=-1)
    np.testing.assert_allclose(np.asarray(n_out), np.asarray(n_in),
                               rtol=1e-4, atol=1e-5)


def test_dual_softmax_and_match_extraction():
    f = jax.random.normal(jax.random.PRNGKey(3), (40, 16))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    conf = lepard.dual_softmax_confidence(f, f, temperature=0.01)
    idx, ok = lepard.extract_matches(conf, threshold=0.05)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(40))
    assert bool(ok.all())


def test_landmark_model_forward():
    key = jax.random.PRNGKey(4)
    views = synthetic.modality_views(key, 200, deform_amp=0.03)
    src, tgt = views["tof"], views["pc"]
    f = jax.random.normal(jax.random.PRNGKey(5), (200, 32))
    model = lepard.LandmarkModel(_CFG)
    variables = model.init(jax.random.PRNGKey(6), src, tgt, f, f)
    out = model.apply(variables, src, tgt, f, f)
    assert out["confidence"].shape == (200, 200)
    assert out["ldmk_src"].shape == (200, 3)
    assert out["inlier_confidence"].shape == (200,)
    assert bool(jnp.isfinite(out["R"]).all())
    from pointcloudregistration_tpu.core.eig3 import det3
    np.testing.assert_allclose(float(det3(out["R"])), 1.0, atol=1e-3)


def test_outlier_rejection_separates():
    """OR net with random init still masks by spatial compatibility: feed a
    rigidly consistent set + outliers, check the structure is usable."""
    key = jax.random.PRNGKey(7)
    src = jax.random.normal(key, (64, 3))
    R, t = se3.random_se3(jax.random.PRNGKey(8), ())
    tgt = se3.transform(src, R, t)
    tgt = tgt.at[48:].set(jax.random.normal(jax.random.PRNGKey(9),
                                            (16, 3)) * 3)
    net = lepard.OutlierRejection(feat_dim=32, n_blocks=2)
    variables = net.init(jax.random.PRNGKey(10), src, tgt)
    conf = net.apply(variables, src, tgt)
    assert conf.shape == (64,)
    assert bool(jnp.isfinite(conf).all())


def test_lndp_landmark_guided_fit():
    """NDP with landmark pairs pulls the landmarks onto their targets."""
    views = synthetic.modality_views(jax.random.PRNGKey(11), 300,
                                     deform_amp=0.06)
    src, tgt = views["tof"], views["pc"]
    # perfect landmarks from the generator (aligned clouds)
    _, nn_idx = knn_ops.nn_search(src, tgt)
    ldmk_idx = jnp.arange(0, 300, 10)
    ldmk_tgt = tgt[nn_idx[ldmk_idx]]
    cfg = ndp.NDPConfig(m=4, k0=-2, depth=2, width=24, iters=15,
                        w_reg=0.001, trunc=0.1)
    warped, _ = ndp.fit(jax.random.PRNGKey(12), src, tgt, cfg,
                        ldmk_idx=ldmk_idx, ldmk_tgt=ldmk_tgt, w_ldmk=5.0)
    before = float(jnp.mean(jnp.sum((src[ldmk_idx] - ldmk_tgt) ** 2, -1)))
    after = float(jnp.mean(jnp.sum((warped[ldmk_idx] - ldmk_tgt) ** 2, -1)))
    assert after < before * 0.8, (before, after)
