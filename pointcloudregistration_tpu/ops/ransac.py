"""Vectorized RANSAC for correspondence-based rigid registration.

TPU-first re-design of Open3D's sequential RANSAC
(registration_ransac_based_on_feature_matching with 100k iterations,
edge-length 0.9 + distance checkers — DataPreparation/RANSAC.py:35-53,
ngenet/utils/o3d.py:164-184, dip/demo.py:37-53): instead of a sequential
hypothesis loop with confidence-based early exit, sample ALL hypotheses at
once, fit them with a vmapped closed-form Kabsch, apply the same geometric
checkers as a mask, and score every hypothesis against every correspondence
in one (H, N) pass on the MXU. Deterministic given the PRNG key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3, procrustes
from pointcloudregistration_tpu.ops import knn as _knn


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size",
                                   "hypo_block"))
def ransac_correspondences(key: jax.Array,
                           src_corr: jax.Array, tgt_corr: jax.Array,
                           threshold: float,
                           num_hypotheses: int = 4096,
                           sample_size: int = 3,
                           corr_mask: jax.Array | None = None,
                           edge_length_ratio: float = 0.9,
                           hypo_block: int = 4096):
    """RANSAC over putative correspondences (src_corr[i] <-> tgt_corr[i]).

    Returns (R, t, info) with info = {inliers (N,) bool, fitness, rmse}.
    Checkers mirror Open3D's: hypotheses whose sampled triangles disagree in
    edge length by more than `edge_length_ratio` are discarded
    (RANSAC.py:46-49).

    Hypotheses are scored in `hypo_block`-sized blocks under a lax.scan with
    a running best carry, so peak memory is (hypo_block, N) regardless of
    num_hypotheses — large pair batches still compile.
    """
    N = src_corr.shape[0]
    if corr_mask is None:
        corr_mask = jnp.ones((N,), bool)
    hb = min(hypo_block, num_hypotheses)
    nblocks = -(-num_hypotheses // hb)
    # sample hypothesis index sets (with replacement across hypotheses);
    # bias sampling toward valid correspondences via gumbel trick on mask
    ks, kc = jax.random.split(key)
    logits = jnp.where(corr_mask, 0.0, -1e9)
    picks = jax.random.categorical(
        ks, logits, shape=(nblocks * hb, sample_size))    # (H, S)
    off = ~jnp.eye(sample_size, dtype=bool)

    def score_block(carry, j):
        best_score, best_R, best_t = carry
        pk = jax.lax.dynamic_slice_in_dim(picks, j * hb, hb, axis=0)
        s = src_corr[pk]                                  # (hb, S, 3)
        t_ = tgt_corr[pk]
        # edge-length checker (both directions), Open3D semantics
        ds = jnp.linalg.norm(s[:, :, None] - s[:, None, :], axis=-1)
        dt = jnp.linalg.norm(t_[:, :, None] - t_[:, None, :], axis=-1)
        ok_edge = ((ds > edge_length_ratio * dt)
                   & (dt > edge_length_ratio * ds) | ~off)
        valid_h = jnp.all(ok_edge, axis=(-2, -1))
        # also reject hypotheses that picked duplicate correspondences
        dup = jnp.any((pk[:, :, None] == pk[:, None, :]) & off, (-2, -1))
        valid_h = valid_h & ~dup
        # fit: triad frames (exact for exact triplets, ~20 ops) instead of
        # tiny SVDs; degenerate triangles are invalidated
        if sample_size == 3:
            R_h, t_h, ok_fit = procrustes.triad_fit(s, t_)
            valid_h = valid_h & ok_fit
        else:
            R_h, t_h = procrustes.kabsch(s, t_)
        # score: inlier count over all correspondences
        src_t = se3.transform(src_corr[None], R_h, t_h)   # (hb, N, 3)
        d2 = jnp.sum((src_t - tgt_corr[None]) ** 2, -1)
        inl = (d2 < threshold * threshold) & corr_mask[None]
        score = jnp.where(valid_h, jnp.sum(inl, -1), -1)
        bi = jnp.argmax(score)
        better = score[bi] > best_score
        return (jnp.where(better, score[bi], best_score),
                jnp.where(better, R_h[bi], best_R),
                jnp.where(better, t_h[bi], best_t)), None

    init = (jnp.asarray(-1, jnp.int32), jnp.eye(3, dtype=src_corr.dtype),
            jnp.zeros(3, src_corr.dtype))
    (best_score, R_b, t_b), _ = jax.lax.scan(
        score_block, init, jnp.arange(nblocks))
    # refine on the best hypothesis's inliers with full weighted Kabsch
    d_b = jnp.linalg.norm(se3.transform(src_corr, R_b, t_b) - tgt_corr,
                          axis=-1)
    inl_b = (d_b < threshold) & corr_mask
    w = inl_b.astype(src_corr.dtype)
    has = jnp.sum(w) > 3
    R_ref, t_ref = procrustes.kabsch(src_corr, tgt_corr, w)
    R = jnp.where(has, R_ref, R_b)
    t = jnp.where(has, t_ref, t_b)
    # final stats
    d_f = jnp.linalg.norm(se3.transform(src_corr, R, t) - tgt_corr, axis=-1)
    inl_f = (d_f < threshold) & corr_mask
    n = jnp.maximum(jnp.sum(corr_mask), 1)
    fitness = jnp.sum(inl_f) / n
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl_f, d_f**2, 0.0))
                    / jnp.maximum(jnp.sum(inl_f), 1))
    return R, t, {"inliers": inl_f, "fitness": fitness, "rmse": rmse,
                  "best_score": best_score}


def match_features(feat_src: jax.Array, feat_tgt: jax.Array,
                   mutual: bool = False,
                   src_mask=None, tgt_mask=None, block: int = 2048):
    """Nearest-neighbor feature matching -> (tgt index per src, valid mask).

    (reference putative-match construction inside Open3D RANSAC-on-features;
    mutual check as in deformationpyramid/utils/benchmark_utils.py:335)
    """
    _, idx = _knn.nn_search(feat_src, feat_tgt, src_mask, tgt_mask, block)
    valid = jnp.ones(idx.shape, bool) if src_mask is None else src_mask
    if mutual:
        _, idx_back = _knn.nn_search(feat_tgt, feat_src, tgt_mask, src_mask,
                                     block)
        back = jnp.take_along_axis(idx_back, idx, axis=-1)
        ar = jax.lax.broadcasted_iota(jnp.int32, idx.shape, idx.ndim - 1)
        valid = valid & (back == ar)
    return idx, valid


def ransac_feature_matching(key: jax.Array,
                            src: jax.Array, tgt: jax.Array,
                            feat_src: jax.Array, feat_tgt: jax.Array,
                            threshold: float,
                            num_hypotheses: int = 8192,
                            sample_size: int = 3,
                            mutual: bool = False,
                            src_mask=None, tgt_mask=None):
    """Full Open3D-style RANSAC on learned/FPFH features.

    (reference: execute_global_registration at DataPreparation/RANSAC.py:35-53
    and ngenet/utils/o3d.py:164-184)
    """
    idx, valid = match_features(feat_src, feat_tgt, mutual, src_mask, tgt_mask)
    tgt_corr = jnp.take_along_axis(tgt, idx[..., None], axis=-2)
    return ransac_correspondences(
        key, src, tgt_corr, threshold, num_hypotheses, sample_size,
        corr_mask=valid)
