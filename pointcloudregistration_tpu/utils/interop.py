"""Interop: load the reference's pretrained torch checkpoints into flax.

The reference ships exactly one set of trained weights — the DIP descriptor
network (dip/chkpts/best_dip.pt, final_dip.pt; saved from the
nn.DataParallel-wrapped dip/network.py:50-119 PointNetFeature with dim=64).
Loading them into models/dip.py lets descriptor parity be measured against
the actual reference model instead of a re-trained one.

Layout mapping (torch -> flax, models/dip.py):

    stn3d.conv1/conv2/fc1 -> STN3d_0/MLPBlock_{0,1,2}   (Dense + BatchNorm)
    stn3d.fc2             -> STN3d_0/Dense_0
    conv1/conv2/fc1       -> MLPBlock_{0,1,2}
    fc2                   -> Dense_0

Torch Conv1d(k=1) weights (out, in, 1) and Linear weights (out, in) both
become channels-last Dense kernels (in, out); BatchNorm weight/bias ->
scale/bias with running_mean/var -> batch_stats (eps matches at 1e-5).

torch (CPU) is used only inside `load_torch_state_dict` and only to
deserialize; everything after is numpy/jax.
"""

from __future__ import annotations

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Deserialize a torch checkpoint to {name: np.ndarray} on host."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _dense(sd: dict, torch_name: str) -> dict:
    w = sd[f"{torch_name}.weight"]
    if w.ndim == 3:                       # Conv1d(k=1): (out, in, 1)
        w = w[:, :, 0]
    return {"kernel": np.ascontiguousarray(w.T),
            "bias": sd[f"{torch_name}.bias"]}


def _mlp_block(sd: dict, torch_name: str):
    """torch Sequential(conv/linear, Dropout, BatchNorm, ReLU) -> MLPBlock."""
    params = {
        "Dense_0": _dense(sd, f"{torch_name}.0"),
        "BatchNorm_0": {"scale": sd[f"{torch_name}.2.weight"],
                        "bias": sd[f"{torch_name}.2.bias"]},
    }
    stats = {"BatchNorm_0": {"mean": sd[f"{torch_name}.2.running_mean"],
                             "var": sd[f"{torch_name}.2.running_var"]}}
    return params, stats


def dip_variables_from_torch(path: str) -> dict:
    """Reference DIP checkpoint -> flax variables for PointNetFeature.

    Returns {"params": ..., "batch_stats": ...} (numpy leaves), directly
    usable as `model.apply(variables, patches, train=False)`.
    """
    sd = load_torch_state_dict(path)
    # strip the nn.DataParallel "module." prefix (dip/train.py:36-37)
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}

    params: dict = {"STN3d_0": {}}
    stats: dict = {"STN3d_0": {}}
    for scope, prefix in ((params["STN3d_0"], "stn3d."), (params, "")):
        st = stats["STN3d_0"] if prefix else stats
        for i, blk in enumerate(("conv1", "conv2", "fc1")):
            p, s = _mlp_block(sd, f"{prefix}{blk}")
            scope[f"MLPBlock_{i}"] = p
            st[f"MLPBlock_{i}"] = s
        scope["Dense_0"] = _dense(sd, f"{prefix}fc2.0")
    return {"params": params, "batch_stats": stats}


def dip_state_from_torch(path: str, cfg=None):
    """Reference DIP checkpoint -> a DIPTrainState usable by pipelines.dip
    (describe/register). The optimizer state is fresh/unused."""
    import jax.numpy as jnp
    import optax
    from pointcloudregistration_tpu.models.dip import PointNetFeature
    from pointcloudregistration_tpu.pipelines.dip import (DIPConfig,
                                                          DIPTrainState)
    variables = dip_variables_from_torch(path)
    # descriptor width comes from the checkpoint itself (best_dip.pt is
    # dim=64, final_dip.pt dim=32 — dip/network.py:52 default)
    dim = int(variables["params"]["Dense_0"]["kernel"].shape[-1])
    cfg = (cfg or DIPConfig())._replace(dim=dim)
    to_jnp = lambda t: jnp.asarray(np.asarray(t))  # noqa: E731
    model = PointNetFeature(dim=cfg.dim)
    import jax
    return DIPTrainState.create(
        apply_fn=model.apply,
        params=jax.tree.map(to_jnp, variables["params"]),
        tx=optax.identity(),
        batch_stats=jax.tree.map(to_jnp, variables["batch_stats"]))
