"""Lepard landmark-stage tests: rotary PE, transformer, matching, OR net."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models import lepard, ndp
from pointcloudregistration_tpu.ops import knn as knn_ops
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_lndp_beats_plain_ndp_on_large_deformation():
    """Landmark-guided NDP beats plain NDP on a large-deformation pair
    (the LNDP capability, c2p-net/config/LNDP.yaml)."""
    views = synthetic.modality_views(jax.random.PRNGKey(20), 300,
                                     deform_amp=0.15)
    src, tgt = views["tof"], views["pc"]
    _, nn_idx = knn_ops.nn_search(src, tgt)
    ldmk_idx = jnp.arange(0, 300, 5)
    ldmk_tgt = tgt[nn_idx[ldmk_idx]]
    cfg = ndp.NDPConfig(m=4, k0=-2, depth=2, width=24, iters=20,
                        w_reg=0.001, trunc=0.1)
    w_plain, _ = ndp.fit(jax.random.PRNGKey(21), src, tgt, cfg)
    w_lndp, _ = ndp.fit(jax.random.PRNGKey(21), src, tgt, cfg,
                        ldmk_idx=ldmk_idx, ldmk_tgt=ldmk_tgt, w_ldmk=5.0,
                        ldmk_mask=jnp.ones(ldmk_idx.shape, bool))
    err_plain = float(jnp.mean(jnp.linalg.norm(
        w_plain[ldmk_idx] - ldmk_tgt, axis=-1)))
    err_lndp = float(jnp.mean(jnp.linalg.norm(
        w_lndp[ldmk_idx] - ldmk_tgt, axis=-1)))
    assert err_lndp < err_plain, (err_plain, err_lndp)


def test_sinusoidal_encoding_variant():
    pts = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    pe = lepard.volumetric_sinusoidal_encoding(pts, 48, 0.05)
    assert pe.shape == (32, 48)
    assert bool(jnp.isfinite(pe).all())
    # distinct points -> distinct encodings
    assert float(jnp.abs(pe[0] - pe[1]).max()) > 1e-3
    # the sinusoidal LandmarkModel variant runs end to end
    cfg = _CFG._replace(pe_type="sinusoidal")
    f = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    src = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    model = lepard.LandmarkModel(cfg)
    variables = model.init(jax.random.PRNGKey(3), src, src, f, f)
    out = model.apply(variables, src, src, f, f)
    assert bool(jnp.isfinite(out["confidence"]).all())


def test_deformable_kpconv():
    """Deformable KPConv (lepard/blocks.py deformable variants): zero-init
    offsets make it match rigid-KPConv shapes and run finite."""
    from pointcloudregistration_tpu.models.kpconv import KPConvDeformable
    key = jax.random.PRNGKey(4)
    pts = jax.random.normal(key, (40, 3)) * 0.1
    feats = jax.random.normal(jax.random.PRNGKey(5), (40, 8))
    nbrs = jnp.tile(jnp.arange(16)[None], (40, 1))
    nmask = jnp.ones((40, 16), bool)
    conv = KPConvDeformable(out_dim=12, radius=0.2)
    variables = conv.init(jax.random.PRNGKey(6), pts, pts, feats, nbrs,
                          nmask)
    out = conv.apply(variables, pts, pts, feats, nbrs, nmask)
    assert out.shape == (40, 12)
    assert bool(jnp.isfinite(out).all())


_TRAIN_CFG = None


def _train_cfg():
    global _TRAIN_CFG
    if _TRAIN_CFG is None:
        from pointcloudregistration_tpu.ops.pyramid import PyramidConfig
        from pointcloudregistration_tpu.pipelines import lepard as lp
        _TRAIN_CFG = lp.LepardTrainConfig(
            model=lepard.LepardConfig(feat_dim=32, nhead=4, voxel=0.16),
            pyramid=PyramidConfig(num_layers=4, first_voxel=0.04,
                                  capacities=(256, 128, 64, 32),
                                  neighbor_caps=(12, 12, 12, 12)),
            backbone_feats=16, n_points=256, deform_amp=0.05, lr=3e-4)
    return _TRAIN_CFG


@pytest.mark.slow
def test_lepard_train_step_decreases_loss():
    """The matcher loss trains (MatchMotionLoss + NeCo parity,
    correspondence/lepard/loss.py)."""
    from pointcloudregistration_tpu.pipelines import lepard as lp
    cfg = _train_cfg()
    state, hist = lp.train(jax.random.PRNGKey(0), cfg, steps=10,
                           log_every=1)
    losses = [h["loss"] for h in hist]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert "match_recall" in hist[-1] and "neco_accuracy" in hist[-1]


def test_motion_loss_zero_at_perfect_prediction():
    """sflow_pred == sflow_gt <=> zero loss (loss.py:110-129 semantics).
    A rigid-only prediction on a deformed pair must pay the deformation."""
    from pointcloudregistration_tpu.losses.lepard import motion_loss
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (64, 3))
    R, t = se3.random_se3(jax.random.PRNGKey(1), (), max_angle_deg=30.0)
    flow = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    # 3dmatch branch: rigid GT, rigid prediction == GT -> exactly zero
    assert float(motion_loss(R, t, s, R, t, flow_gt=None)) < 1e-6
    # 4dmatch branch: the same rigid prediction must pay ~|flow|
    l = float(motion_loss(R, t, s, R, t, flow_gt=flow))
    expected = float(jnp.mean(jnp.sum(jnp.abs(
        se3.transform(flow, R, jnp.zeros(3)) - se3.transform(
            jnp.zeros_like(flow), R, jnp.zeros(3))), -1)))
    assert l > 1e-3
    np.testing.assert_allclose(l, expected, rtol=1e-4)


def test_fourdmatch_contract_and_roundtrip(tmp_path):
    """Generator obeys the _4dmatch.py npz contract: rot@(s_pc+s2t_flow)
    +trans lands on the matched target points; loader round-trips."""
    from pointcloudregistration_tpu.data import fourdmatch as fdm
    cfg = fdm.FourDMatchConfig(n_points=128, deform_amp=0.06)
    pair = fdm.make_deformed_pair(jax.random.PRNGKey(0), cfg)
    warped = se3.transform(pair["s_pc"] + pair["s2t_flow"],
                           pair["rot"], pair["trans"])
    m = np.asarray(pair["corr_mask"])
    assert m.sum() > 10
    d = np.linalg.norm(
        np.asarray(warped)[m]
        - np.asarray(pair["t_pc"])[np.asarray(pair["corr_idx"])[m]], axis=1)
    assert d.max() < cfg.corr_radius + 1e-6
    counts = fdm.generate_fourdmatch(jax.random.PRNGKey(1), str(tmp_path),
                                     8, cfg)
    assert counts["train"] >= 4
    ds = fdm.FourDMatchPairs(str(tmp_path), "train")
    assert len(ds) == counts["train"]
    row = ds[0]
    for k in ("s_pc", "t_pc", "rot", "trans", "s2t_flow",
              "correspondences"):
        assert k in row, k
    assert row["correspondences"].ndim == 2
    assert row["correspondences"].shape[1] == 2
    # the reference loader's own glob pattern (split/*/*.npz) finds them
    import glob, os
    assert glob.glob(os.path.join(str(tmp_path), "train", "*", "*.npz"))


@pytest.mark.slow
def test_lepard_train_on_fourdmatch_dir(tmp_path):
    """Persisted 4DMatch-contract data streams through lepard.train with
    the full MatchMotionLoss (flow + positioning layers + fine NCE)."""
    from pointcloudregistration_tpu.data import fourdmatch as fdm
    from pointcloudregistration_tpu.pipelines import lepard as lp
    cfg = _train_cfg()
    fdm.generate_fourdmatch(
        jax.random.PRNGKey(5), str(tmp_path), 6,
        fdm.FourDMatchConfig(n_points=cfg.n_points,
                             deform_amp=cfg.deform_amp))
    state, hist = lp.train(jax.random.PRNGKey(0), cfg, steps=6,
                           log_every=1, data=str(tmp_path))
    assert np.isfinite([h["loss"] for h in hist]).all()
    for k in ("motion_loss", "fine_loss", "fine_recall", "match_recall"):
        assert k in hist[-1], k


@pytest.mark.slow
def test_estimate_landmarks_fine_refinement():
    """Fine refinement keeps landmarks among the fine_k nearest level-0
    target points of the coarse landmark (the coarse->fine split)."""
    from pointcloudregistration_tpu.pipelines import lepard as lp
    cfg = _train_cfg()
    state = lp.create_train_state(jax.random.PRNGKey(1), cfg)
    pair = synthetic.make_pair(jax.random.PRNGKey(2), n_points=256,
                               max_angle_deg=10.0, max_trans=0.1,
                               deform_amp=0.03)
    lm = lp.estimate_landmarks(state, pair["source"], pair["target"],
                               pair["source_mask"], pair["target_mask"],
                               cfg, fine_k=8)
    assert "coarse_ldmk_tgt" in lm
    # every fine target is within the 8-NN ball (among level-0 pyramid
    # points — the refinement's candidate set) of its coarse anchor
    from pointcloudregistration_tpu.ops.pyramid import build_pyramid
    pyr_t = build_pyramid(pair["target"], pair["target_mask"], cfg.pyramid)
    d_fine = jnp.linalg.norm(lm["ldmk_tgt"] - lm["coarse_ldmk_tgt"], axis=-1)
    d8, _ = knn_ops.knn(lm["coarse_ldmk_tgt"], pyr_t["points"][0], 8,
                        ref_mask=pyr_t["masks"][0])
    assert bool(jnp.all(d_fine ** 2 <= d8[:, -1] + 1e-5))


@pytest.mark.slow
def test_estimate_landmarks_min_keep_budget():
    """min_keep guarantees a landmark budget when the confidence gate
    starves (the OOD regime): kept landmarks are extracted matches."""
    from pointcloudregistration_tpu.pipelines import lepard as lp
    cfg = _train_cfg()
    state = lp.create_train_state(jax.random.PRNGKey(1), cfg)
    pair = synthetic.make_pair(jax.random.PRNGKey(2), n_points=256,
                               max_angle_deg=10.0, max_trans=0.1,
                               deform_amp=0.03)
    # random-init net: inlier_thr=0.99 starves the gate
    lm0 = lp.estimate_landmarks(state, pair["source"], pair["target"],
                                pair["source_mask"], pair["target_mask"],
                                cfg, inlier_thr=0.99)
    lm = lp.estimate_landmarks(state, pair["source"], pair["target"],
                               pair["source_mask"], pair["target_mask"],
                               cfg, inlier_thr=0.99, min_keep=8)
    n_matches = int(jnp.sum(lm["match_mask"]))
    assert int(jnp.sum(lm["ldmk_mask"])) >= min(
        8, max(n_matches, int(jnp.sum(lm0["ldmk_mask"]))))
    # budget never invents landmarks outside the extracted match set
    assert bool(jnp.all(~lm["ldmk_mask"] | lm["match_mask"]))


@pytest.mark.slow
def test_lepard_lndp_end_to_end():
    """estimate_landmarks + register_pair_lndp run the full LNDP loop."""
    from pointcloudregistration_tpu.pipelines import lepard as lp
    cfg = _train_cfg()
    state = lp.create_train_state(jax.random.PRNGKey(1), cfg)
    pair = synthetic.make_pair(jax.random.PRNGKey(2), n_points=256,
                               max_angle_deg=10.0, max_trans=0.1,
                               deform_amp=0.03)
    out = lp.register_pair_lndp(
        state, jax.random.PRNGKey(3), pair["source"], pair["target"],
        pair["source_mask"], pair["target_mask"], cfg,
        ndp_cfg=ndp.NDPConfig(m=3, k0=-2, depth=2, width=16, iters=8))
    assert out["warped"].shape == (256, 3)
    assert bool(jnp.isfinite(out["warped"]).all())
    assert bool(jnp.isfinite(out["chamfer_nonrigid"]))
    lm = out["landmarks"]
    assert lm["ldmk_src"].shape == lm["ldmk_tgt"].shape
    assert lm["src_idx"].shape == lm["ldmk_mask"].shape
