"""DIP descriptor stack tests: LRF, network, loss, training step."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.losses import hardest_contrastive
from pointcloudregistration_tpu.ops import lrf as lrf_mod
from pointcloudregistration_tpu.pipelines import dip
import pytest

_CFG = dip.DIPConfig(patch_size=64, lrf_k=48, n_anchors=32, n_points=600)


def test_lrf_rotation_invariance():
    """Patches extracted in the LRF must be invariant to rigid motion."""
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(0), 800)
    anchors = jnp.arange(16)
    p1 = lrf_mod.lrf_patches(jax.random.PRNGKey(1), pts, anchors, 0.2,
                             k=64, patch_size=64)
    R, t = se3.random_se3(jax.random.PRNGKey(2), (), max_angle_deg=90.0)
    pts_r = se3.transform(pts, R, t)
    p2 = lrf_mod.lrf_patches(jax.random.PRNGKey(1), pts_r, anchors, 0.2,
                             k=64, patch_size=64)
    # same key -> same subsampling; patches should match up to fp noise and
    # possible frame sign flips on near-symmetric neighborhoods
    d = np.abs(np.asarray(p1["patches"]) - np.asarray(p2["patches"]))
    frac_close = (d.max(axis=(1, 2)) < 1e-2).mean()
    assert frac_close > 0.8, frac_close


def test_lrf_frames_orthonormal():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(3), 500)
    out = lrf_mod.lrf_patches(jax.random.PRNGKey(4), pts, jnp.arange(32),
                              0.25, k=48, patch_size=32)
    F = np.asarray(out["frames"])
    eye = np.einsum("aji,ajk->aik", F, F)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=5e-4)
    # patches normalized into the unit ball (radius-normalized)
    p = np.asarray(out["patches"])
    assert np.linalg.norm(p, axis=-1).max() <= 1.0 + 1e-4


def test_hardest_contrastive_behavior():
    # perfectly matched distinct descriptors -> near-zero positive term
    f = jax.random.normal(jax.random.PRNGKey(5), (32, 64))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    loss, aux = hardest_contrastive(f, f)
    assert float(jnp.max(aux["pos_dists"])) < 1e-6
    # loss decreases when negatives are pushed apart
    f2 = jnp.concatenate([f[:16] * 0 + jnp.arange(16)[:, None] / 4.0,
                          f[16:]], 0)
    loss2, _ = hardest_contrastive(f2, f2)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))


@pytest.mark.slow
def test_dip_train_step_improves_matching():
    key = jax.random.PRNGKey(6)
    state = dip.create_train_state(key, _CFG)
    batch = dip.make_patch_pair_batch(jax.random.PRNGKey(7), _CFG)
    assert batch["patches1"].shape == (32, 64, 3)
    losses = []
    for i in range(12):
        b = dip.make_patch_pair_batch(jax.random.fold_in(key, 100 + i), _CFG)
        state, m = dip.train_step(state, jax.random.fold_in(key, 200 + i),
                                  b, _CFG)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]    # optimization is moving


def test_dip_describe_shapes():
    state = dip.create_train_state(jax.random.PRNGKey(8), _CFG)
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(9), 600)
    idx, desc, keep = dip.describe(state, jax.random.PRNGKey(10), pts, _CFG,
                                   n_sample=64)
    assert desc.shape == (64, _CFG.dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=-1),
                               1.0, atol=1e-4)
    assert 0 < int(keep.sum()) <= 64
