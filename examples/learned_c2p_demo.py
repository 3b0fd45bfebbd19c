"""Demo: learned C2P registration with the shipped NgeNet checkpoint.

The analogue of the reference's inference harnesses (dip/demo.py +
c2p-net/testScript.py): load pretrained weights, register unseen pairs, and
print the metric table. Runs on one TPU chip (or CPU, slowly).

    PYTHONPATH="/root/repo:$PYTHONPATH" python examples/learned_c2p_demo.py
    (append, don't replace: the TPU platform plugin also rides PYTHONPATH)
"""

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.checkpoint import CheckpointManager
from pointcloudregistration_tpu import metrics

CKPT = "artifacts/ngenet_ckpt"


def main():
    cfg = ng.NgeNetTrainConfig()
    sample = ng.make_sample(jax.random.PRNGKey(1), cfg)
    state = ng.create_train_state(jax.random.PRNGKey(2), cfg, sample)
    mgr = CheckpointManager(CKPT)
    restored = mgr.restore({"params": state.params,
                            "batch_stats": state.batch_stats})
    if restored is None:
        raise SystemExit(f"no checkpoint under {CKPT}; run training first")
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])
    print(f"restored step {mgr.latest_step}")

    for j in range(4):
        pair = synthetic.make_pair(jax.random.PRNGKey(100 + j),
                                   n_points=2048, max_angle_deg=45.0,
                                   max_trans=0.5)
        out = ng.register(state, jax.random.PRNGKey(200 + j),
                          pair["source"], pair["target"],
                          pair["source_mask"], pair["target_mask"], cfg)
        rre = float(metrics.isotropic_R_error(out["R"], pair["R_gt"]))
        rte = float(metrics.isotropic_t_error(out["t"], pair["t_gt"]))
        print(f"pair {j}: RRE {rre:6.2f} deg   RTE {rte:.4f}   "
              f"ransac fitness {float(out['ransac']['fitness']):.3f}")


if __name__ == "__main__":
    main()
