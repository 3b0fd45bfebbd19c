"""End-to-end slice tests: synthetic pairs + NDP non-rigid refinement."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic, augment
from pointcloudregistration_tpu.models import ndp
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu import metrics
import pytest


def test_phantom_generation():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(0), 2000)
    assert pts.shape == (2000, 3)
    assert bool(jnp.isfinite(pts).all())
    # unit-cube scaled
    ext = jnp.max(pts, 0) - jnp.min(pts, 0)
    assert float(jnp.max(ext)) <= 1.0 + 1e-5
    # structured, not a blob: nn distances much smaller than extent
    d2, _ = knn_ops.nn_search(pts, pts, block=2048)
    # self-search returns 0; use 2-NN
    d, _ = knn_ops.knn(pts, pts, 2)
    med = float(jnp.median(jnp.sqrt(d[:, 1])))
    assert med < 0.05


def test_make_pair_gt_consistent():
    pair = synthetic.make_pair(jax.random.PRNGKey(1), n_points=1500,
                               max_angle_deg=45.0)
    realigned = se3.transform(pair["source"], pair["R_gt"], pair["t_gt"])
    cd = knn_ops.chamfer(realigned, pair["target"],
                         y_mask=pair["target_mask"], sqrt=True)
    assert float(cd) < 0.05  # noise-level after GT realignment


def test_make_batch_shapes():
    batch = synthetic.make_batch(jax.random.PRNGKey(2), 4, n_points=512)
    assert batch["source"].shape == (4, 512, 3)
    assert batch["R_gt"].shape == (4, 3, 3)


def test_augment_roundtrip():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(3), 800)
    moved, R, t = augment.disorient(jax.random.PRNGKey(4), pts, 60.0, 1.0)
    back = se3.transform(moved, R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
    sub, m, idx = augment.subsample_fixed(jax.random.PRNGKey(5), pts, 256)
    assert sub.shape == (256, 3) and len(np.unique(np.asarray(idx))) == 256


_TINY = ndp.NDPConfig(m=6, k0=-2, depth=2, width=32, iters=25, lr=0.02,
                      w_reg=0.001, trunc=0.1)


@pytest.mark.slow
def test_ndp_reduces_chamfer_on_deformed_pair():
    key = jax.random.PRNGKey(6)
    views = synthetic.modality_views(key, 1000, deform_amp=0.08)
    src, tgt = views["tof"], views["pc"]
    before = float(knn_ops.chamfer(src, tgt, y_mask=views["pc_mask"]))
    warped, aux = ndp.fit(jax.random.PRNGKey(7), src, tgt, _TINY,
                          tgt_mask=views["pc_mask"])
    after = float(knn_ops.chamfer(warped, tgt, y_mask=views["pc_mask"]))
    assert np.isfinite(after)
    assert after < before * 0.7, (before, after)
    # losses decreased within levels
    losses = np.asarray(aux["losses"])
    assert losses.shape == (_TINY.m, _TINY.iters)


def test_ndp_identity_on_identical_clouds():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(8), 600)
    warped, _ = ndp.fit(jax.random.PRNGKey(9), pts, pts, _TINY)
    # warp must stay near identity when already aligned
    disp = float(jnp.abs(warped - pts).max())
    assert disp < 0.05, disp


@pytest.mark.slow
def test_ndp_batched():
    batch = synthetic.make_batch(jax.random.PRNGKey(10), 2, n_points=400,
                                 max_angle_deg=0.0, max_trans=0.0,
                                 deform_amp=0.05)
    warped, aux = ndp.fit_batch(jax.random.PRNGKey(11), batch["source"],
                                batch["target"], _TINY,
                                tgt_mask=batch["target_mask"])
    assert warped.shape == (2, 400, 3)
    assert bool(jnp.isfinite(warped).all())


@pytest.mark.slow
def test_ndp_tgt_cap_matches_full_target():
    # the y-side data-term subset (NDPConfig.tgt_cap) must not change the
    # registration outcome materially: same deformed pair, capped vs full
    key = jax.random.PRNGKey(12)
    views = synthetic.modality_views(key, 1000, deform_amp=0.08)
    src, tgt = views["tof"], views["pc"]
    tm = views["pc_mask"]
    before = float(knn_ops.chamfer(src, tgt, y_mask=tm))
    w_full, _ = ndp.fit(jax.random.PRNGKey(13), src, tgt, _TINY, tgt_mask=tm)
    w_cap, _ = ndp.fit(jax.random.PRNGKey(13), src, tgt,
                       _TINY._replace(tgt_cap=384), tgt_mask=tm)
    cd_full = float(knn_ops.chamfer(w_full, tgt, y_mask=tm))
    cd_cap = float(knn_ops.chamfer(w_cap, tgt, y_mask=tm))
    assert cd_cap < before * 0.7, (before, cd_cap)
    assert cd_cap < cd_full * 1.5, (cd_full, cd_cap)
