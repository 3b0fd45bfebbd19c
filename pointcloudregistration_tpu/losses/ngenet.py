"""NgeNet training loss — circle losses at 3 scales + overlap/saliency BCE.

Parity with c2p-net/ngenet/losses/loss.py:102-202, re-expressed with static
shapes: the reference deduplicates correspondence indices with Python sets
and samples 256 pairs with numpy (loss.py:129-170); here correspondence
candidacy is a mask, and pair sampling is a keyed top-k — same statistics,
fully jittable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import square_dists
from pointcloudregistration_tpu.losses.circle import circle_loss, weighted_bce
from pointcloudregistration_tpu.ops import knn as knn_ops


class NgeNetLossConfig(NamedTuple):
    """Defaults per c2p-net/config/MRI.yaml loss section."""
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    log_scale: float = 16.0
    pos_radius: float = 0.0375
    safe_radius: float = 0.1
    overlap_radius: float = 0.0375
    matchability_radius: float = 0.05
    w_circle: float = 1.0
    w_overlap: float = 1.0
    max_points: int = 256


def _bce_probs(p, labels, mask):
    """Class-balanced BCE on probabilities (the reference's nn.BCELoss on
    sigmoid outputs with inverse-frequency weights, loss.py:54-84)."""
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    labels = labels.astype(p.dtype)
    m = mask.astype(p.dtype)
    n_pos = jnp.maximum(jnp.sum(labels * m), 1.0)
    n_neg = jnp.maximum(jnp.sum((1 - labels) * m), 1.0)
    n = n_pos + n_neg
    w = (labels * n / (2 * n_pos) + (1 - labels) * n / (2 * n_neg)) * m
    ce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(m), 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def ngenet_loss(key: jax.Array,
                coords_src, coords_tgt, out_src, out_tgt,
                R_gt, t_gt, src_mask, tgt_mask,
                w_saliency: float = 0.0,
                cfg: NgeNetLossConfig = NgeNetLossConfig()):
    """Full loss. coords_src/tgt are level-0 pyramid points (N0, 3)."""
    src_al = se3.transform(coords_src, R_gt, t_gt)

    # nearest counterpart distances -> overlap labels (get_correspondences,
    # ngenet/utils/o3d.py:88-102, radius = overlap_radius)
    d_s2t, i_s2t = knn_ops.nn_search(src_al, coords_tgt,
                                     src_mask, tgt_mask)
    d_t2s, _ = knn_ops.nn_search(coords_tgt, src_al, tgt_mask, src_mask)
    ol_gt_src = (d_s2t < cfg.overlap_radius ** 2) & src_mask
    ol_gt_tgt = (d_t2s < cfg.overlap_radius ** 2) & tgt_mask

    # 1. overlap loss
    overlap_l = 0.5 * _bce_probs(out_src["overlap"], ol_gt_src, src_mask) + \
        0.5 * _bce_probs(out_tgt["overlap"], ol_gt_tgt, tgt_mask)

    # 2. saliency loss: among overlap points, is the best feature match
    # geometrically close? (loss.py:143-155) — masked static version
    fs, ft = out_src["feats_h"], out_tgt["feats_h"]
    sim = jnp.einsum("nc,mc->nm", fs, ft,
                     precision=jax.lax.Precision.HIGHEST)
    sim_s = jnp.where((ol_gt_tgt)[None, :], sim, -1e9)
    best_t = jnp.argmax(sim_s, -1)
    dists1 = jnp.linalg.norm(src_al - coords_tgt[best_t], axis=-1)
    sim_t = jnp.where((ol_gt_src)[:, None], sim, -1e9)
    best_s = jnp.argmax(sim_t, -2)
    dists2 = jnp.linalg.norm(coords_tgt - src_al[best_s], axis=-1)
    sal_l = 0.5 * _bce_probs(out_src["saliency"],
                             dists1 < cfg.matchability_radius, ol_gt_src) + \
        0.5 * _bce_probs(out_tgt["saliency"],
                         dists2 < cfg.matchability_radius, ol_gt_tgt)

    # 3. circle losses on up-to-max_points sampled true correspondences
    cand = (d_s2t < (cfg.pos_radius - 1e-3) ** 2) & src_mask
    score = jax.random.uniform(key, cand.shape) + cand
    _, sel = jax.lax.top_k(score, cfg.max_points)
    sel_valid = jnp.take_along_axis(cand, sel, -1)
    cs = src_al[sel]
    ct = coords_tgt[i_s2t[sel]]
    coords_dist = jnp.sqrt(square_dists(cs, ct))

    def cl(feats_key):
        a = out_src[feats_key][sel]
        b = out_tgt[feats_key][i_s2t[sel]]
        feats_dist = jnp.sqrt(square_dists(a, b) + 1e-12)
        return circle_loss(coords_dist, feats_dist,
                           pos_radius=cfg.pos_radius,
                           safe_radius=cfg.safe_radius,
                           pos_margin=cfg.pos_margin,
                           neg_margin=cfg.neg_margin,
                           log_scale=cfg.log_scale,
                           row_mask=sel_valid, col_mask=sel_valid)

    circle_h = cl("feats_h")
    circle_m = cl("feats_m")
    circle_l = cl("feats_l")

    # recall on the sampled set (loss.py:86-100)
    fd = jnp.sqrt(square_dists(out_src["feats_h"][sel],
                               out_tgt["feats_h"][i_s2t[sel]]) + 1e-12)
    fd = jnp.where(sel_valid[None, :], fd, 1e9)
    nn_i = jnp.argmin(fd, -1)
    hit = jnp.take_along_axis(coords_dist, nn_i[:, None], -1)[:, 0] \
        < cfg.pos_radius
    recall = jnp.sum(hit & sel_valid) / jnp.maximum(jnp.sum(sel_valid), 1)

    total = (cfg.w_circle * (circle_h + circle_m + circle_l)
             + cfg.w_overlap * overlap_l + w_saliency * sal_l)
    return total, {
        "circle_h": circle_h, "circle_m": circle_m, "circle_l": circle_l,
        "overlap": overlap_l, "saliency": sal_l, "recall": recall,
    }
