"""Lepard-style correspondence module: repositioning transformer + matching
+ soft Procrustes, with the NeCo outlier-rejection head.

Capability parity with c2p-net/deformationpyramid/correspondence/*:
  * VolumetricPositionEncoding (lepard/position_encoding.py:5-87): voxelized
    sinusoidal and rotary (RoPE) 3-D encodings, `embed_rotary`;
  * RepositioningTransformer (lepard/transformer.py:10-280): interleaved
    self/cross GeometryAttentionLayers on rotary-encoded features, optional
    'positioning' steps that re-warp src by an intermediate soft-Procrustes
    fit;
  * Matching (lepard/matching.py:6-173): dual-softmax confidence or
    Sinkhorn-with-dustbin (ops/sinkhorn.log_optimal_transport), mutual-NN +
    threshold match extraction (as masks — static shapes);
  * SoftProcrustes (core/procrustes.soft_procrustes);
  * Outlier_Rejection (outlier_rejection/pipeline.py:9-119): 6-d
    correspondence attention net with spatial-compatibility weighting ->
    per-correspondence confidence.

The KPConv coarse backbone is shared with NgeNet (models/kpconv.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pointcloudregistration_tpu.core import procrustes, se3
from pointcloudregistration_tpu.core.geometry import square_dists
from pointcloudregistration_tpu.ops.sinkhorn import log_optimal_transport

_PREC = jax.lax.Precision.HIGHEST


class LepardConfig(NamedTuple):
    feat_dim: int = 128
    nhead: int = 4
    layers: tuple = ("self", "cross", "positioning", "self", "cross")
    vol_bnds_min: float = -1.0
    vol_bnds_max: float = 1.0
    voxel: float = 0.02
    pe_type: str = "rotary"            # or "sinusoidal"
    matching: str = "dual_softmax"     # or "sinkhorn"
    dustbin_alpha: float = 1.0
    confidence_threshold: float = 0.05
    sinkhorn_iters: int = 50


def volumetric_rotary_encoding(points: jax.Array, feat_dim: int,
                               voxel: float = 0.02) -> jax.Array:
    """RoPE-style 3-D encoding: per-axis (cos, sin) pairs
    (position_encoding.py:36-87). Returns (N, feat_dim) with feat_dim
    split across axes in (cos, sin) interleave."""
    d_axis = feat_dim // 6 * 2                      # per-axis pairs
    freqs = jnp.exp(jnp.arange(0, d_axis, 2) *
                    (-jnp.log(10000.0) / d_axis))
    vox = points / voxel
    enc = []
    for ax in range(3):
        angles = vox[..., ax:ax + 1] * freqs[None, :]
        # interleave (cos, sin) pairs — the layout embed_rotary consumes
        pair = jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1)
        enc.append(pair.reshape(points.shape[:-1] + (-1,)))
    e = jnp.concatenate(enc, -1)
    if e.shape[-1] < feat_dim:
        # pad with identity-rotation (cos=1, sin=0) pairs, not zeros
        pad = feat_dim - e.shape[-1]
        ident = jnp.tile(jnp.asarray([1.0, 0.0]), (pad + 1) // 2)[:pad]
        e = jnp.concatenate(
            [e, jnp.broadcast_to(ident, e.shape[:-1] + (pad,))], -1)
    return e[..., :feat_dim]


def volumetric_sinusoidal_encoding(points: jax.Array, feat_dim: int,
                                   voxel: float = 0.02) -> jax.Array:
    """Additive sinusoidal 3-D encoding (position_encoding.py:5-35, the
    'sinusoidal' branch): per-axis sin/cos of voxelized coordinates,
    concatenated across axes to feat_dim."""
    d_axis = max(feat_dim // 6 * 2, 2)
    freqs = jnp.exp(jnp.arange(0, d_axis, 2) * (-jnp.log(10000.0) / d_axis))
    vox = points / voxel
    enc = []
    for ax in range(3):
        angles = vox[..., ax:ax + 1] * freqs[None, :]
        enc.append(jnp.sin(angles))
        enc.append(jnp.cos(angles))
    e = jnp.concatenate(enc, -1)
    if e.shape[-1] < feat_dim:
        e = jnp.concatenate(
            [e, jnp.zeros(e.shape[:-1] + (feat_dim - e.shape[-1],))], -1)
    return e[..., :feat_dim]


def position_encoding(points: jax.Array, feat_dim: int, voxel: float,
                      pe_type: str) -> jax.Array:
    if pe_type == "rotary":
        return volumetric_rotary_encoding(points, feat_dim, voxel)
    if pe_type == "sinusoidal":
        return volumetric_sinusoidal_encoding(points, feat_dim, voxel)
    raise ValueError(pe_type)


def embed_rotary(x: jax.Array, pe: jax.Array) -> jax.Array:
    """Rotate feature pairs by the positional phases
    (position_encoding.py:26-35 embed_rotary)."""
    d = x.shape[-1] // 2 * 2
    x2 = x[..., :d].reshape(x.shape[:-1] + (d // 2, 2))
    # pe laid out as interleaved (cos, sin) pairs matching x pairs
    pc = pe[..., :d].reshape(pe.shape[:-1] + (d // 2, 2))
    cos, sin = pc[..., 0:1], pc[..., 1:2]
    rot = jnp.concatenate([
        x2[..., 0:1] * cos - x2[..., 1:2] * sin,
        x2[..., 0:1] * sin + x2[..., 1:2] * cos], -1)
    out = rot.reshape(x.shape[:-1] + (d,))
    if d < x.shape[-1]:
        out = jnp.concatenate([out, x[..., d:]], -1)
    return out


class GeometryAttentionLayer(nn.Module):
    """Position-encoded attention + FFN merge (transformer.py:10-93).
    pe_type 'rotary' rotates q/k phase pairs (embed_rotary); 'sinusoidal'
    adds the encoding before projection (position_encoding.py embed_pos)."""
    feat_dim: int
    nhead: int
    pe_type: str = "rotary"

    @nn.compact
    def __call__(self, x, source, x_pe, source_pe, source_mask=None):
        d = self.feat_dim // self.nhead
        if self.pe_type == "rotary":
            q = embed_rotary(nn.Dense(self.feat_dim)(x), x_pe)
            k = embed_rotary(nn.Dense(self.feat_dim)(source), source_pe)
        else:
            q = nn.Dense(self.feat_dim)(x + x_pe)
            k = nn.Dense(self.feat_dim)(source + source_pe)
        v = nn.Dense(self.feat_dim)(source)
        qh = q.reshape(-1, self.nhead, d)
        kh = k.reshape(-1, self.nhead, d)
        vh = v.reshape(-1, self.nhead, d)
        scores = jnp.einsum("nhd,mhd->hnm", qh, kh, precision=_PREC) / d**0.5
        if source_mask is not None:
            scores = jnp.where(source_mask[None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, -1)
        msg = jnp.einsum("hnm,mhd->nhd", attn, vh,
                         precision=_PREC).reshape(-1, self.feat_dim)
        msg = nn.Dense(self.feat_dim)(msg)
        h = jnp.concatenate([x, msg], -1)
        h = nn.Dense(2 * self.feat_dim)(h)
        h = nn.relu(nn.LayerNorm()(h))
        return x + nn.Dense(self.feat_dim)(h)


class RepositioningTransformer(nn.Module):
    """Interleaved self/cross attention with optional re-positioning
    (transformer.py:100-280)."""
    cfg: LepardConfig

    @nn.compact
    def __call__(self, src_pts, tgt_pts, f_src, f_tgt,
                 src_mask=None, tgt_mask=None):
        cfg = self.cfg
        cur_src = src_pts
        position_layers = []
        for name in cfg.layers:
            pe_s = position_encoding(cur_src, cfg.feat_dim, cfg.voxel,
                                     cfg.pe_type)
            pe_t = position_encoding(tgt_pts, cfg.feat_dim, cfg.voxel,
                                     cfg.pe_type)
            if name == "self":
                layer = GeometryAttentionLayer(cfg.feat_dim, cfg.nhead,
                                               cfg.pe_type)
                f_src = layer(f_src, f_src, pe_s, pe_s, src_mask)
                f_tgt = layer(f_tgt, f_tgt, pe_t, pe_t, tgt_mask)
            elif name == "cross":
                layer = GeometryAttentionLayer(cfg.feat_dim, cfg.nhead,
                                               cfg.pe_type)
                f_src = layer(f_src, f_tgt, pe_s, pe_t, tgt_mask)
                f_tgt = layer(f_tgt, f_src, pe_t, pe_s, src_mask)
            elif name == "positioning":
                # intermediate soft-Procrustes re-warp of the src positions;
                # the intermediate (conf, R, t) is supervised by the loss
                # exactly like the final fit (loss.py:156-190)
                conf = dual_softmax_confidence(f_src, f_tgt,
                                               src_mask, tgt_mask)
                R, t = procrustes.soft_procrustes(conf, cur_src, tgt_pts)
                position_layers.append({"conf": conf, "R": R, "t": t})
                cur_src = jax.lax.stop_gradient(
                    se3.transform(cur_src, R, t))
            else:
                raise ValueError(name)
        return f_src, f_tgt, cur_src, position_layers


def dual_softmax_confidence(f_src, f_tgt, src_mask=None, tgt_mask=None,
                            temperature: float = 0.1):
    """Dual-softmax confidence matrix (matching.py:118-150)."""
    sim = jnp.einsum("nc,mc->nm", f_src, f_tgt, precision=_PREC) / temperature
    if tgt_mask is not None:
        sim_r = jnp.where(tgt_mask[None, :], sim, -1e9)
    else:
        sim_r = sim
    if src_mask is not None:
        sim_c = jnp.where(src_mask[:, None], sim, -1e9)
    else:
        sim_c = sim
    conf = jax.nn.softmax(sim_r, -1) * jax.nn.softmax(sim_c, -2)
    if src_mask is not None:
        conf = jnp.where(src_mask[:, None], conf, 0.0)
    if tgt_mask is not None:
        conf = jnp.where(tgt_mask[None, :], conf, 0.0)
    return conf


def extract_matches(conf: jax.Array, threshold: float = 0.05):
    """Mutual-NN + threshold match mask (matching.py:73-88), static shape:
    returns (tgt index per src row, bool mask of accepted matches)."""
    best_t = jnp.argmax(conf, -1)
    best_s = jnp.argmax(conf, -2)
    n = conf.shape[0]
    mutual = best_s[best_t] == jnp.arange(n)
    peak = jnp.take_along_axis(conf, best_t[:, None], -1)[:, 0]
    return best_t, mutual & (peak > threshold)


class Matching(nn.Module):
    """Confidence computation with selectable backend (matching.py:91-173)."""
    cfg: LepardConfig

    @nn.compact
    def __call__(self, f_src, f_tgt, src_mask=None, tgt_mask=None):
        cfg = self.cfg
        f_src = f_src / (jnp.linalg.norm(f_src, axis=-1, keepdims=True)
                         + 1e-8)
        f_tgt = f_tgt / (jnp.linalg.norm(f_tgt, axis=-1, keepdims=True)
                         + 1e-8)
        if cfg.matching == "dual_softmax":
            conf = dual_softmax_confidence(f_src, f_tgt, src_mask, tgt_mask)
        else:
            alpha = self.param("dustbin",
                               lambda _: jnp.asarray(cfg.dustbin_alpha))
            sim = jnp.einsum("nc,mc->nm", f_src, f_tgt, precision=_PREC)
            Z = log_optimal_transport(sim, alpha, cfg.sinkhorn_iters,
                                      src_mask, tgt_mask)
            conf = jnp.exp(Z[:-1, :-1])
        return conf


class OutlierRejection(nn.Module):
    """NeCo-style 6-d correspondence confidence net
    (outlier_rejection/pipeline.py:9-119): per-correspondence features from
    (src, tgt) pairs, spatial-compatibility-weighted attention blocks,
    sigmoid confidence."""
    feat_dim: int = 128
    n_blocks: int = 3
    sigma_spat: float = 0.1

    @nn.compact
    def __call__(self, corr_src, corr_tgt, mask=None):
        x = jnp.concatenate([corr_src, corr_tgt], -1)      # (L, 6)
        h = nn.Dense(self.feat_dim)(x)
        h = nn.relu(nn.LayerNorm()(h))
        # spatial compatibility: |d_src(i,j) - d_tgt(i,j)| small for inliers
        ds = jnp.sqrt(square_dists(corr_src, corr_src) + 1e-12)
        dt = jnp.sqrt(square_dists(corr_tgt, corr_tgt) + 1e-12)
        compat = jax.nn.relu(1.0 - (ds - dt) ** 2 / self.sigma_spat ** 2)
        if mask is not None:
            compat = jnp.where(mask[None, :] & mask[:, None], compat, 0.0)
        for _ in range(self.n_blocks):
            q = nn.Dense(self.feat_dim)(h)
            k = nn.Dense(self.feat_dim)(h)
            v = nn.Dense(self.feat_dim)(h)
            scores = jnp.einsum("nc,mc->nm", q, k, precision=_PREC) \
                / self.feat_dim ** 0.5
            scores = jnp.where(compat > 0, scores, -1e9)
            attn = jax.nn.softmax(scores, -1)
            h = h + nn.Dense(self.feat_dim)(
                jnp.einsum("nm,mc->nc", attn, v, precision=_PREC))
            h = nn.relu(nn.LayerNorm()(h))
        conf = nn.Dense(1)(h)[..., 0]
        if mask is not None:
            conf = jnp.where(mask, conf, -1e9)
        return jax.nn.sigmoid(conf)


class KPFCNBackbone(nn.Module):
    """KPConv FCN backbone with the coarse/fine phase split
    (correspondence/lepard/backbone.py:5-162 KPFCN): the encoder bottom is
    the 'coarse' phase feeding the repositioning transformer; a decoder
    recovers 'fine' per-point features at full resolution. Shares the
    KPConv block library with NgeNet (models/kpconv.py — one block library
    where the reference carries two copies)."""
    first_feats_dim: int = 64
    coarse_dim: int = 128
    fine_dim: int = 32
    voxel: float = 0.04
    conv_radius: float = 2.5

    @nn.compact
    def __call__(self, pyr, train: bool = False):
        from pointcloudregistration_tpu.models.kpconv import (UnaryBlock,
                                                              nearest_upsample)
        from pointcloudregistration_tpu.models.ngenet import (KPEncoder,
                                                              NgeNetConfig)
        ncfg = NgeNetConfig(first_feats_dim=self.first_feats_dim,
                            first_subsampling_dl=self.voxel,
                            conv_radius=self.conv_radius)
        ones = jnp.ones(pyr["points"][0].shape[:-1] + (1,))
        x, skips = KPEncoder(ncfg)(pyr, ones, train)      # (N3, 8d)
        coarse = nn.Dense(self.coarse_dim)(x)             # phase-1 output
        # fine phase: decoder back to L0 (backbone.py decoder blocks)
        ups = pyr["upsamples"]
        h = nearest_upsample(x, ups[2])
        h = UnaryBlock(4 * self.first_feats_dim)(
            jnp.concatenate([h, skips[2]], -1), train)
        h = nearest_upsample(h, ups[1])
        h = UnaryBlock(2 * self.first_feats_dim)(
            jnp.concatenate([h, skips[1]], -1), train)
        h = nearest_upsample(h, ups[0])
        fine = nn.Dense(self.fine_dim)(
            jnp.concatenate([h, skips[0]], -1))
        return {"coarse_feats": coarse, "fine_feats": fine}


class LandmarkModel(nn.Module):
    """Full landmark estimator: transformer + matching + outlier rejection
    (correspondence/landmark_estimator.py:14-75 Landmark_Model). Takes
    precomputed per-point features (e.g. NgeNet feats_h or a KPConv
    encoder's coarse features projected to feat_dim)."""
    cfg: LepardConfig = LepardConfig()

    @nn.compact
    def __call__(self, src_pts, tgt_pts, f_src, f_tgt,
                 src_mask=None, tgt_mask=None):
        proj = nn.Dense(self.cfg.feat_dim)
        f_src, f_tgt = proj(f_src), proj(f_tgt)
        f_src, f_tgt, repositioned, position_layers = \
            RepositioningTransformer(self.cfg)(
                src_pts, tgt_pts, f_src, f_tgt, src_mask, tgt_mask)
        conf = Matching(self.cfg)(f_src, f_tgt, src_mask, tgt_mask)
        match_idx, match_ok = extract_matches(
            conf, self.cfg.confidence_threshold)
        corr_src = src_pts
        corr_tgt = tgt_pts[match_idx]
        inlier_conf = OutlierRejection(self.cfg.feat_dim)(
            corr_src, corr_tgt, match_ok)
        R, t = procrustes.soft_procrustes(conf, src_pts, tgt_pts)
        return {
            "confidence": conf,
            "match_idx": match_idx,
            "match_mask": match_ok,
            "inlier_confidence": inlier_conf,
            "ldmk_src": corr_src,
            "ldmk_tgt": corr_tgt,
            "R": R, "t": t,
            "position_layers": tuple(position_layers),
        }
