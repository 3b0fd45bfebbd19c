"""Validation harness — the full-pipeline scoring pass.

Parity with c2p-net/validationScript.py:119-341: per pair, run the complete
two-stage registration and report truncated Chamfer registered/unregistered,
mean displacement error (vs the known deformation field when available),
landmark loss (min-distance of annotated landmark pairs), overlap score and
wall time; results exported as an npz bundle (the reference writes STL
meshes + pickles).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core.geometry import square_dists
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu import metrics


def registration_cd(src, tgt, trunc: float = 0.1, src_mask=None,
                    tgt_mask=None) -> float:
    """Truncated Chamfer score (validationScript.py:119-141)."""
    return float(jnp.mean(knn_ops.truncated_chamfer(
        src, tgt, trunc, x_mask=src_mask, y_mask=tgt_mask)))


def landmark_loss(ldmk_src, ldmk_tgt) -> float:
    """Min-distance landmark loss (validationScript.py:143-150: cdist min
    per landmark, averaged)."""
    d = jnp.sqrt(square_dists(ldmk_src, ldmk_tgt))
    return float(jnp.mean(jnp.min(d, -1)))


def mean_displacement_error(warped, gt_warped, mask=None) -> float:
    if mask is None:
        return float(jnp.mean(jnp.linalg.norm(warped - gt_warped, axis=-1)))
    d = jnp.linalg.norm(warped - gt_warped, axis=-1)
    return float(jnp.sum(jnp.where(mask, d, 0)) / jnp.maximum(
        jnp.sum(mask), 1))


def validate(key: jax.Array, n_pairs: int = 8, n_points: int = 3000,
             cfg: c2p.C2PConfig = c2p.C2PConfig(),
             register_fn: Callable | None = None,
             deform_amp: float = 0.05,
             out_path: str | None = None,
             export_dir: str | None = None) -> dict:
    """Run the registration pipeline over generated pairs and score it.

    register_fn(key, source, target, source_mask, target_mask) -> out dict;
    defaults to the classical c2p.register_pair with `cfg`.

    export_dir: when set, per-pair geometry artifacts are written there —
    warped/source/target clouds as PLY plus the NDP per-level loss history
    (the reference exports STL meshes, predicted correspondences and NDP
    history, validationScript.py:264-333).
    """
    if register_fn is None:
        def register_fn(k, s, t, sm, tm):
            return c2p.register_pair(k, s, t, sm, tm, cfg)

    rows = []
    for i in range(n_pairs):
        kd, kr = jax.random.split(jax.random.fold_in(key, i))
        pair = synthetic.make_pair(kd, n_points=n_points,
                                   deform_amp=deform_amp)
        t0 = time.perf_counter()
        out = register_fn(kr, pair["source"], pair["target"],
                          pair["source_mask"], pair["target_mask"])
        cd_after = float(jnp.asarray(out["chamfer_nonrigid"]
                                     if "chamfer_nonrigid" in out
                                     else out["chamfer_rigid"]))
        wall = time.perf_counter() - t0
        cd_before = registration_cd(pair["source"], pair["target"],
                                    tgt_mask=pair["target_mask"])
        rre = float(metrics.isotropic_R_error(out["R"], pair["R_gt"]))
        rte = float(metrics.isotropic_t_error(out["t"], pair["t_gt"]))
        # overlap score: fraction of warped points near the target
        warped = out.get("warped", out.get("rigid_aligned"))
        d2, _ = knn_ops.nn_search(warped, pair["target"],
                                  ref_mask=pair["target_mask"])
        overlap = float(jnp.mean((d2 < 0.05 ** 2).astype(jnp.float32)))
        rows.append({
            "cd_unregistered": cd_before,
            "cd_registered": cd_after,
            "rre_deg": rre, "rte": rte,
            "overlap": overlap,
            "wall_time_s": wall,
        })
        if export_dir is not None:
            import os

            from pointcloudregistration_tpu.data import loaders
            os.makedirs(export_dir, exist_ok=True)
            for name, pts in (("warped", warped),
                              ("source", pair["source"]),
                              ("target", pair["target"])):
                loaders.write_ply_points(
                    os.path.join(export_dir, f"pair{i:03d}_{name}.ply"),
                    np.asarray(pts))
            extra = {}
            if "ndp_losses" in out:
                extra["ndp_losses"] = np.asarray(out["ndp_losses"])
            if "inliers" in out:
                extra["inliers"] = np.asarray(out["inliers"])
            np.savez_compressed(
                os.path.join(export_dir, f"pair{i:03d}_history.npz"),
                R=np.asarray(out["R"]), t=np.asarray(out["t"]), **extra)
    agg = ({k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
           if rows else {})
    result = {"per_pair": rows, "mean": agg}
    if out_path is not None:
        np.savez_compressed(
            out_path, **{k: np.array([r[k] for r in rows])
                         for k in rows[0]})
    return result
