"""Aux subsystem tests: config, checkpoint, timers, logging, dataprep, QC."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.utils import config as config_mod
from pointcloudregistration_tpu.utils.timers import Timers, device_sync
from pointcloudregistration_tpu.utils.logging import MetricLogger
from pointcloudregistration_tpu.train.checkpoint import CheckpointManager
from pointcloudregistration_tpu.models.ndp import NDPConfig
from pointcloudregistration_tpu.models.pointnet_qc import PointNetQC
from pointcloudregistration_tpu.pipelines import dataprep
from pointcloudregistration_tpu.pipelines.c2p import C2PConfig
import pytest


def test_config_yaml_roundtrip(tmp_path):
    cfg = C2PConfig(ransac_hypotheses=1234,
                    ndp=NDPConfig(m=5, width=64))
    p = str(tmp_path / "cfg.yaml")
    config_mod.save_yaml(cfg, p)
    cfg2 = config_mod.load_yaml(p, C2PConfig)
    assert cfg2.ransac_hypotheses == 1234
    assert cfg2.ndp.m == 5 and cfg2.ndp.width == 64
    assert isinstance(cfg2.ndp, NDPConfig)


def test_config_section_flatten(tmp_path):
    p = str(tmp_path / "ref_style.yaml")
    with open(p, "w") as f:
        f.write("model:\n  num_layers: 4\noptim:\n  lr: 0.005\n")
    flat = config_mod.load_yaml(p, flatten_sections=True)
    assert flat == {"num_layers": 4, "lr": 0.005}


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(10.0), "step": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metrics={"loss": 1.0, "recall": 0.2})
    mgr.save(2, jax.tree.map(lambda x: x * 2, state),
             metrics={"loss": 0.5, "recall": 0.1})
    assert mgr.latest_step == 2
    restored = mgr.restore(state)
    np.testing.assert_allclose(restored["w"], np.arange(10.0) * 2)
    # best tracking: loss is min-better (step 2), recall max-better (step 1)
    assert mgr.best_step("loss") == 2
    assert mgr.best_step("recall") == 1


def test_timers_and_sync():
    t = Timers()
    with t.section("op", sync_on=jnp.ones(4)):
        _ = jnp.sum(jnp.ones((100, 100)))
    s = t.summary()
    assert s["op"]["count"] == 1 and s["op"]["total_s"] > 0
    assert isinstance(t.report(), str)


@pytest.mark.slow
def test_metric_logger(tmp_path):
    lg = MetricLogger(str(tmp_path), "test")
    lg.log(0, loss=1.5)
    lg.log(1, loss=1.0)
    lg.close()
    lines = open(lg.path).read().strip().split("\n")
    assert len(lines) == 2


@pytest.mark.slow
def test_pointnet_qc_forward_and_learns():
    model = PointNetQC()
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(8, 128, 3)).astype(np.float32)         # class 0
    x1 = (rng.normal(size=(8, 128, 3)) * 0.2 + 2.0).astype(np.float32)
    x = jnp.asarray(np.concatenate([x0, x1]))
    y = jnp.asarray([0] * 8 + [1] * 8)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    import optax
    tx = optax.adam(1e-3)
    params = variables["params"]
    bs = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state, key):
        def loss_fn(p):
            logits, upd = model.apply({"params": p, "batch_stats": bs}, x,
                                      train=True, rngs={"dropout": key},
                                      mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.mean(ce), upd["batch_stats"]
        (loss, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), bs2, opt_state, loss

    losses = []
    for i in range(20):
        params, bs, opt_state, loss = step(params, bs, opt_state,
                                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


@pytest.mark.slow
def test_dataprep_generation(tmp_path):
    cfg = dataprep.DataPrepConfig(n_points=400, n_augment=4,
                                  min_correspondences=50)
    out = dataprep.generate_dataset(jax.random.PRNGKey(0), cfg,
                                    out_path=str(tmp_path / "ds.npz"))
    assert out["source"].shape == (4, 400, 3)
    assert out["transformation"].shape == (4, 4, 4)
    assert np.isfinite(out["qc_average"]).all()
    assert os.path.exists(tmp_path / "ds.npz")
    # GT sanity: alignment quality decent for at least some samples
    assert out["inlier_ratio"].max() > 0.5
