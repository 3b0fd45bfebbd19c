"""ROPNet model + loss + training tests (tiny configs for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.models.ropnet import ROPNet, ROPNetConfig
from pointcloudregistration_tpu.losses import ropnet as ropnet_loss
from pointcloudregistration_tpu.pipelines import ropnet as ropnet_pipe
from pointcloudregistration_tpu.core import se3
import pytest

_CFG = ROPNetConfig(N1=96, M1=128, top_prob=0.6, similarity_topk=3,
                    radius=0.3, num_neighbors=16, feat_dim=64, num_iter=2)
_TCFG = ropnet_pipe.ROPNetTrainConfig(model=_CFG, n_points=256, batch=2,
                                      lr=1e-4)


@pytest.mark.slow
def test_ropnet_forward_shapes():
    model = ROPNet(_CFG)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 6))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 6))
    variables = model.init({"params": jax.random.PRNGKey(2),
                            "dropout": jax.random.PRNGKey(3)},
                           src, tgt, train=False)
    out = model.apply(variables, src, tgt, train=False)
    assert len(out["pred_Ts"]) == _CFG.num_iter + 1
    R, t = out["pred_Ts"][-1]
    assert R.shape == (2, 3, 3) and t.shape == (2, 3)
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-3)
    assert out["x_ol"].shape == (2, 256, 2)
    assert out["src_ol1"].shape == (2, _CFG.N1, 3)
    # eval mode gates with test_top_prob (TFMR.py:176-181)
    assert out["src_ol2"].shape == (2, int(_CFG.test_top_prob * _CFG.N1), 3)
    assert bool(jnp.isfinite(out["pred_src"][-1]).all())


def test_ropnet_losses():
    gt = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 3))
    pred = [gt + 0.1, gt + 0.05, gt + 0.01]
    x_ol = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 2))
    y_ol = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 2))
    tgt = gt + 0.001
    loss, parts = ropnet_loss.total_loss(gt, pred, x_ol, y_ol, tgt)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(parts["init"]), 0.1, atol=1e-3)
    # refine = mae(0.05) + mae(0.01)
    np.testing.assert_allclose(float(parts["refine"]), 0.06, atol=1e-3)


@pytest.mark.slow
def test_ropnet_train_step_runs_and_improves():
    key = jax.random.PRNGKey(7)
    state = ropnet_pipe.create_train_state(key, _TCFG)
    losses = []
    for i in range(6):
        kd, kt = jax.random.split(jax.random.fold_in(key, i + 1))
        batch = ropnet_pipe.make_batch(kd, _TCFG)
        state, m = ropnet_pipe.train_step(state, kt, batch, _TCFG)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 1.5  # moving, not exploding


@pytest.mark.slow
def test_ropnet_eval_step():
    key = jax.random.PRNGKey(8)
    state = ropnet_pipe.create_train_state(key, _TCFG)
    batch = ropnet_pipe.make_batch(jax.random.PRNGKey(9), _TCFG)
    out = ropnet_pipe.eval_step(state, batch, _TCFG)
    assert out["rre"].shape == (2,)
    assert bool(jnp.isfinite(out["rre"]).all())


@pytest.mark.slow
def test_ropnet_vis_dump(tmp_path):
    import pickle
    key = jax.random.PRNGKey(10)
    state = ropnet_pipe.create_train_state(key, _TCFG)
    path = str(tmp_path / "Results.pickle")
    n = ropnet_pipe.vis_dump(state, key, path, _TCFG, n_batches=1)
    assert n == 2
    with open(path, "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"source", "target", "pred"}
    assert data["pred"][0].shape == (256, 3)
