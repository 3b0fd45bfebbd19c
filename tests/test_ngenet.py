"""NgeNet stack tests: pyramid, KPConv, model forward, loss, train step."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.models.kpconv import kernel_points
from pointcloudregistration_tpu.models.ngenet import NgeNetConfig, vote
from pointcloudregistration_tpu.ops.pyramid import PyramidConfig, build_pyramid
from pointcloudregistration_tpu.pipelines import ngenet as ng
import pytest

_PCFG = PyramidConfig(num_layers=4, first_voxel=0.04,
                      capacities=(512, 256, 128, 64),
                      neighbor_caps=(16, 16, 16, 16))
_CFG = ng.NgeNetTrainConfig(
    model=NgeNetConfig(first_feats_dim=32, final_feats_dim=16,
                       gnn_feats_dim=64, first_subsampling_dl=0.04,
                       dgcnn_k=6, ppf_k=16),
    pyramid=_PCFG, n_points=768)


def test_kernel_points():
    kp = kernel_points(15)
    assert kp.shape == (15, 3)
    assert np.allclose(kp[0], 0)                  # pinned center
    r = np.linalg.norm(kp[1:], axis=-1)
    # volumetric Lloyd disposition inside the ball (kernel_points.py:66)
    assert float(r.max()) <= 1.0 and float(r.min()) > 0.1
    # cached: second call returns the identical array
    assert np.array_equal(kp, kernel_points(15))


def test_pyramid_structure():
    pts = synthetic.vessel_phantom(jax.random.PRNGKey(0), 768)
    pyr = build_pyramid(pts, None, _PCFG)
    assert len(pyr["points"]) == 4
    for l in range(4):
        assert pyr["points"][l].shape == (_PCFG.capacities[l], 3)
        # neighbor indices point at live rows
        live = np.asarray(pyr["masks"][l])
        nm = np.asarray(pyr["neighbor_masks"][l])
        idx = np.asarray(pyr["neighbors"][l])
        assert live.sum() > 0
        assert (live[idx[nm]]).all()
    # coarser levels have fewer live points
    counts = [int(pyr["masks"][l].sum()) for l in range(4)]
    assert counts[0] > counts[1] > counts[2] >= counts[3] - 1


@pytest.mark.slow
def test_ngenet_forward():
    sample = ng.make_sample(jax.random.PRNGKey(1), _CFG)
    state = ng.create_train_state(jax.random.PRNGKey(2), _CFG, sample)
    out_s, out_t = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        sample["pyr_src"], sample["pyr_tgt"],
        sample["normals_src"], sample["normals_tgt"], train=False)
    N0 = _PCFG.capacities[0]
    assert out_s["feats_h"].shape == (N0, _CFG.model.final_feats_dim)
    assert out_s["feats_m"].shape == (N0, _CFG.model.final_feats_dim)
    assert out_s["overlap"].shape == (N0,)
    for k in ("feats_h", "feats_m", "feats_l"):
        norms = np.linalg.norm(np.asarray(out_s[k]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert bool(jnp.isfinite(out_s["feats_h"]).all())
    assert (np.asarray(out_s["overlap"]) >= 0).all()
    assert (np.asarray(out_s["overlap"]) <= 1).all()


@pytest.mark.slow
def test_ngenet_train_step_decreases_loss():
    key = jax.random.PRNGKey(3)
    sample = ng.make_sample(jax.random.PRNGKey(4), _CFG)
    state = ng.create_train_state(jax.random.PRNGKey(5), _CFG, sample)
    losses = []
    for i in range(5):
        state, m = ng.train_step(state, jax.random.fold_in(key, i),
                                 sample, jnp.asarray(0.0), _CFG)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1]), losses
    assert losses[-1] < losses[0]     # same sample -> loss must drop


def test_vote_consistency():
    rng = np.random.default_rng(6)
    src = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    tgt = src + 0.001
    f = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    feats_s = {"feats_h": f, "feats_m": f, "feats_l": f}
    feats_t = {"feats_h": f, "feats_m": f, "feats_l": f}
    sel, idx, fh = vote(src, tgt, feats_s, feats_t, voxel_size=0.05)
    # identical features -> all scales agree -> everything selected
    assert bool(sel.all())
    np.testing.assert_array_equal(np.asarray(idx), np.arange(64))


def test_spherical_lloyd_disposition():
    import numpy as np
    from pointcloudregistration_tpu.models import kpconv
    kp = kpconv.spherical_lloyd(15, radius=1.0, n_samples=4000, n_iter=15)
    assert kp.shape == (15, 3)
    assert np.allclose(kp[0], 0.0)                   # pinned center
    r = np.linalg.norm(kp[1:], axis=1)
    assert float(r.max()) <= 1.0 and float(r.min()) > 0.1
    # points spread: pairwise min distance bounded away from zero
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    d[np.arange(15), np.arange(15)] = 10.0
    assert float(d.min()) > 0.2
    # deterministic
    kp2 = kpconv.spherical_lloyd(15, radius=1.0, n_samples=4000, n_iter=15)
    assert np.array_equal(kp, kp2)
