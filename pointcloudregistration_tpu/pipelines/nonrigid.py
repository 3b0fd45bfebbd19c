"""Non-rigid registration controller — model dispatch.

Parity with c2p-net/deformationpyramid/model/registration.py:45-146
(`Registration` class: load_pcds + register dispatching on
deformation_model in {NDP, Sinkhorn, ED, NSFP, Nerfies}).
Functional API: one call = one registered pair.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.models import ndp as ndp_mod
from pointcloudregistration_tpu.ops import deformation_graph as dg
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import sinkhorn as sinkhorn_mod


class NonRigidConfig(NamedTuple):
    model: str = "NDP"            # NDP | Sinkhorn | ED | NSFP
    ndp: ndp_mod.NDPConfig = ndp_mod.NDPConfig()
    sinkhorn_epsilon: float = 0.01
    sinkhorn_iters: int = 100
    ed_nodes: int = 128
    ed_iters: int = 100
    ed_w_arap: float = 10.0
    nsfp_iters: int = 300
    nerfies_iters: int = 300
    nerfies_w_reg: float = 1e-3
    trunc: float = 1e9


def register(key: jax.Array, src: jax.Array, tgt: jax.Array,
             cfg: NonRigidConfig = NonRigidConfig(),
             data_mask=None, src_mask=None, tgt_mask=None):
    """Warp src onto tgt with the configured deformation model.

    data_mask: subset of src driving the data term (NDP only — the
    reference's RANSAC-inlier `inds`, registration.py:236).
    Returns (warped_src, aux dict with before/after chamfer).
    """
    before = knn_ops.chamfer(src, tgt, src_mask, tgt_mask, sqrt=True)
    if cfg.model == "NDP":
        warped, aux = ndp_mod.fit(key, src, tgt, cfg.ndp,
                                  data_mask=data_mask, tgt_mask=tgt_mask)
    elif cfg.model == "Sinkhorn":
        warped = sinkhorn_mod.sinkhorn_warp(
            src, tgt, cfg.sinkhorn_epsilon, cfg.sinkhorn_iters,
            src_mask, tgt_mask)
        aux = {}
    elif cfg.model == "ED":
        warped, aux = dg.nicp_register(
            key, src, tgt, iters=cfg.ed_iters, n_nodes=cfg.ed_nodes,
            w_arap=cfg.ed_w_arap, trunc=cfg.trunc,
            src_mask=src_mask, tgt_mask=tgt_mask)
    elif cfg.model == "NSFP":
        warped, aux = dg.nsfp_register(
            key, src, tgt, iters=cfg.nsfp_iters, trunc=cfg.trunc,
            src_mask=src_mask, tgt_mask=tgt_mask)
    elif cfg.model == "Nerfies":
        warped, aux = dg.nerfies_register(
            key, src, tgt, iters=cfg.nerfies_iters, trunc=cfg.trunc,
            w_reg=cfg.nerfies_w_reg, src_mask=src_mask, tgt_mask=tgt_mask)
    else:
        raise ValueError(f"unknown deformation model {cfg.model!r}")
    after = knn_ops.chamfer(warped, tgt, src_mask, tgt_mask, sqrt=True)
    aux = dict(aux)
    aux["chamfer_before"] = before
    aux["chamfer_after"] = after
    return warped, aux
