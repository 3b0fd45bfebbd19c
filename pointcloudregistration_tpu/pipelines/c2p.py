"""C2P-style two-stage registration pipeline: coarse rigid + non-rigid refine.

Mirrors the reference's inference harness (c2p-net/testScript.py:126-206):
  1. features on both clouds (NgeNet multi-scale features in the reference;
     FPFH here until the learned NgeNet lands — same RANSAC contract),
  2. RANSAC on feature matches -> rigid (R, t) + inlier set,
  3. ICP polish (the reference relies on RANSAC alone; ICP is strictly
     better and nearly free on TPU),
  4. NDP non-rigid refinement of the rigidly-aligned source, data term
     driven by the RANSAC inliers (testScript.py:183-192).

The whole pipeline is one jitted program per pair batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import estimate_normals
from pointcloudregistration_tpu.models import ndp as ndp_mod
from pointcloudregistration_tpu.ops import fpfh as fpfh_mod
from pointcloudregistration_tpu.ops import fpfh_pallas
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import ransac as ransac_mod


class C2PConfig(NamedTuple):
    fpfh_radius: float = 0.4
    fpfh_k: int = 32
    normal_k: int = 16
    # fused dense-radius FPFH (ops/fpfh_pallas.py) — the Open3D-style
    # radius semantics (RANSAC.py:12-22, normal radius = 4/7 of feature
    # radius); the gather path above is the CPU/test fallback
    normal_radius: float = 0.23
    fused_fpfh: bool = True
    ransac_thresh: float = 0.05      # ~ first_subsampling_dl mapping,
                                     # testScript.py:112-119
    # radius-FPFH mutual matches run ~50% inliers on the bench workload
    # (r04; the K-capped features ran ~6-8%), so 8k hypotheses are already
    # P(>=1 all-inlier triplet) ~ 1.0 there and ~99.97% even at 10%
    # fitness real pairs (the reference's Open3D loop uses 100k sequential
    # iterations; scoring here is one (H, N) matmul). Sweep r04: 32k -> 8k
    # costs zero accuracy (medRRE 2.77 vs 2.81) and buys ~11 pairs/s.
    ransac_hypotheses: int = 8192
    icp_dist: float = 0.1
    icp_dist_final: float = 0.02
    icp_iters: int = 25
    mutual: bool = True
    run_ndp: bool = True
    # iters=15: the bench-workload sweep (PERF.md) shows the last 15 Adam
    # steps per level buy nothing — chamfer 0.0277 at iters=15 vs 0.0282 at
    # iters=30 — while costing ~10 ms/pair; the no-harm guard in
    # register_pair bounds any per-pair regression at the rigid result
    ndp: ndp_mod.NDPConfig = ndp_mod.NDPConfig(
        m=7, k0=-4, depth=3, width=64, iters=15, lr=0.01,
        w_reg=0.005, trunc=0.1, data_cap=1024, tgt_cap=1024)


def _features(points, mask, cfg: C2PConfig):
    if cfg.fused_fpfh and jax.default_backend() == "tpu":
        # fused Pallas path: dense tiled radius neighborhoods, gather-free
        # (12.4 -> ~3.3 ms/pair at bench shapes, PERF.md r04)
        f, _ = fpfh_pallas.fpfh_dense(points, cfg.normal_radius,
                                      cfg.fpfh_radius, mask)
        return f
    # one k-NN table serves both normal estimation (nearest normal_k of it —
    # top_k output is distance-sorted) and the FPFH neighborhoods
    k = max(cfg.fpfh_k, cfg.normal_k)
    # approx top-k is fine for neighborhood features (a stray 33rd-nearest
    # neighbor doesn't move a 33-bin histogram) and much faster on TPU.
    # Precision.HIGH (3-pass, ~2e-6 relative) halves the MXU passes of the
    # distance matrix; only the ordering is consumed (spfh recomputes exact
    # distances). (measured dead end: bf16 — ~4e-3 quantization scrambles
    # the ordering, RANSAC fitness 0.11 -> 0.09, and the converts made it
    # SLOWER.)
    d2, nidx = knn_ops.knn(points, points, k, mask, mask, approx=True,
                           precision=jax.lax.Precision.HIGH)
    normals = estimate_normals(points, nidx[..., :cfg.normal_k])
    return fpfh_mod.fpfh(points, normals, cfg.fpfh_radius, cfg.fpfh_k, mask,
                         neighbors=(d2[..., :cfg.fpfh_k],
                                    nidx[..., :cfg.fpfh_k]))


@partial(jax.jit, static_argnames=("cfg",))
def register_pair(key: jax.Array, source: jax.Array, target: jax.Array,
                  source_mask: jax.Array | None = None,
                  target_mask: jax.Array | None = None,
                  cfg: C2PConfig = C2PConfig()):
    """Full rigid+non-rigid registration of one pair.

    Returns dict(R, t, warped, rigid_aligned, inliers, fitness, chamfer_*).
    """
    if source_mask is None:
        source_mask = jnp.ones(source.shape[:-1], bool)
    if target_mask is None:
        target_mask = jnp.ones(target.shape[:-1], bool)
    k_ransac, k_ndp = jax.random.split(key)

    f_src = _features(source, source_mask, cfg)
    f_tgt = _features(target, target_mask, cfg)
    R0, t0, rinfo = ransac_mod.ransac_feature_matching(
        k_ransac, source, target, f_src, f_tgt,
        threshold=cfg.ransac_thresh,
        num_hypotheses=cfg.ransac_hypotheses,
        mutual=cfg.mutual, src_mask=source_mask, tgt_mask=target_mask)
    R, t, iinfo = icp_mod.icp(source, target, cfg.icp_dist,
                              iters=cfg.icp_iters, R0=R0, t0=t0,
                              src_mask=source_mask, tgt_mask=target_mask,
                              max_dist_final=cfg.icp_dist_final)
    aligned = se3.transform(source, R, t)
    cd_rigid = knn_ops.chamfer(aligned, target, source_mask, target_mask,
                               sqrt=True)
    out = {
        "R": R, "t": t,
        "rigid_aligned": aligned,
        "inliers": rinfo["inliers"],
        "ransac_fitness": rinfo["fitness"],
        "icp_fitness": iinfo["fitness"],
        "chamfer_rigid": cd_rigid,
    }
    if cfg.run_ndp:
        # data term on RANSAC inliers, final warp on the whole cloud
        # (reference: registration.py:236 + 279-287)
        data_mask = rinfo["inliers"] & source_mask
        enough = jnp.sum(data_mask) > 32
        data_mask = jnp.where(enough, data_mask, source_mask)
        warped, aux = ndp_mod.fit(k_ndp, aligned, target, cfg.ndp,
                                  data_mask=data_mask, tgt_mask=target_mask)
        cd_warped = knn_ops.chamfer(warped, target, source_mask,
                                    target_mask, sqrt=True)
        # no-harm guard: a per-pair optimizer can occasionally diverge on an
        # already-well-aligned pair; keep the rigid result when it is better
        improved = cd_warped < cd_rigid
        out["warped"] = jnp.where(improved, warped, aligned)
        out["chamfer_nonrigid"] = jnp.minimum(cd_warped, cd_rigid)
        out["ndp_improved"] = improved
        out["ndp_losses"] = aux["losses"]
    return out


@partial(jax.jit, static_argnames=("ngenet_cfg", "ndp_cfg"))
def register_pair_learned(ngenet_state, key: jax.Array,
                          source: jax.Array, target: jax.Array,
                          source_mask=None, target_mask=None,
                          ngenet_cfg=None,
                          ndp_cfg: ndp_mod.NDPConfig | None = None):
    """Learned C2P: NgeNet features -> vote -> RANSAC -> ICP -> NDP.

    The faithful testScript.py:126-206 flow with the trained NgeNet standing
    where FPFH stands in the classical `register_pair`. The NDP data term is
    driven by the RANSAC inlier subset exactly as the reference does
    (testScript.py:183-192). One jitted program per (shapes, configs): the
    reference pays ~360 eager kernel rounds per pair here (SURVEY §3.5);
    this path pays one dispatch.
    """
    from pointcloudregistration_tpu.pipelines import ngenet as ngenet_pipe
    if ngenet_cfg is None:
        ngenet_cfg = ngenet_pipe.NgeNetTrainConfig()
    if ndp_cfg is None:
        ndp_cfg = C2PConfig().ndp
    k_rigid, k_ndp = jax.random.split(key)
    if source_mask is None:
        source_mask = jnp.ones(source.shape[:-1], bool)
    if target_mask is None:
        target_mask = jnp.ones(target.shape[:-1], bool)
    rigid = ngenet_pipe.register(ngenet_state, k_rigid, source, target,
                                 source_mask, target_mask, ngenet_cfg)
    R, t = rigid["R"], rigid["t"]
    aligned_sub = se3.transform(rigid["sub_source"], R, t)
    data_mask = rigid["inliers"] & rigid["sub_source_mask"]
    enough = jnp.sum(data_mask) > 32
    data_mask = jnp.where(enough, data_mask, rigid["sub_source_mask"])
    _, aux = ndp_mod.fit(k_ndp, aligned_sub, rigid["sub_target"], ndp_cfg,
                         data_mask=data_mask,
                         tgt_mask=rigid["sub_target_mask"])
    # final warp on the FULL cloud through the frozen pyramid + the same
    # no-harm guard as the classical path (registration.py:279-287: the
    # reference's final warp also sees the raw cloud, not the subset the
    # data term optimized) — chamfer is then comparable across paths
    aligned = se3.transform(source, R, t)
    warped = ndp_mod.apply_pyramid(aux["params"], aligned, ndp_cfg)
    cd_rigid = knn_ops.chamfer(aligned, target, source_mask, target_mask,
                               sqrt=True)
    cd_warped = knn_ops.chamfer(warped, target, source_mask, target_mask,
                                sqrt=True)
    improved = cd_warped < cd_rigid
    return {"R": R, "t": t,
            "warped": jnp.where(improved, warped, aligned),
            "chamfer_nonrigid": jnp.minimum(cd_warped, cd_rigid),
            "chamfer_rigid": cd_rigid, "ndp_improved": improved,
            "rigid": rigid, "ndp_losses": aux["losses"]}


def register_batch(key: jax.Array, source: jax.Array, target: jax.Array,
                   source_mask=None, target_mask=None,
                   cfg: C2PConfig = C2PConfig()):
    """vmapped batch registration: (B, N, 3) x (B, M, 3)."""
    B = source.shape[0]
    keys = jax.random.split(key, B)
    if source_mask is None:
        source_mask = jnp.ones(source.shape[:-1], bool)
    if target_mask is None:
        target_mask = jnp.ones(target.shape[:-1], bool)
    return jax.vmap(
        lambda k, s, t, sm, tm: register_pair(k, s, t, sm, tm, cfg))(
        keys, source, target, source_mask, target_mask)
