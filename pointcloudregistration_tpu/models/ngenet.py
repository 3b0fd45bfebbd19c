"""NgeNet — multi-scale KPConv registration features with geometric guidance.

Capability parity with c2p-net/ngenet/models/NgeNet.py:10-237 (4-level KPConv
encoder per architectures.py:100-117, bottleneck to gnn_feats 256,
InformationInteractive ['gge','cross_attn','gge']
(information_interactive.py:7-254: DGCNN edge-conv GCN, PPF conv, 4-head
cross attention), learned-temperature overlap/saliency attention scores, and
three decoders (high/mid/low) with encoder skip concatenation producing
L2-normalized multi-scale features) plus the distance-consistency vote
(vote.py:6-37).

TPU-first: fixed-capacity masked pyramids (ops/pyramid.py) instead of the
ragged stacked-batch CPU collate; src/tgt run as separate padded tensors
through shared weights; every norm is mask-aware.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from pointcloudregistration_tpu.core.geometry import (
    angle as vec_angle, gather_points, square_dists)
from pointcloudregistration_tpu.models.kpconv import (
    SimpleBlock, ResnetBottleneckBlock, UnaryBlock, nearest_upsample)
from pointcloudregistration_tpu.ops.ball_query import ball_query

_PREC = jax.lax.Precision.HIGHEST


class NgeNetConfig(NamedTuple):
    """Defaults per c2p-net/config/MRI.yaml."""
    first_feats_dim: int = 128
    final_feats_dim: int = 32
    gnn_feats_dim: int = 256
    first_subsampling_dl: float = 0.025
    conv_radius: float = 2.5
    dgcnn_k: int = 10
    ppf_k: int = 64
    radius_mul: float = 32.0
    num_head: int = 4
    # dense=True: the fused dense-radius Pallas KPConv path
    # (ops/kpconv_pallas.py) — no neighbor/pool tables, light pyramids
    # (build_pyramid tables=False). Same parameters either way.
    dense: bool = False


def masked_instance_norm(x, mask, eps=1e-5):
    """Per-channel normalization over valid points: x (N, C), mask (N,)."""
    m = mask[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * m, axis=-2, keepdims=True) / cnt
    return (x - mean) * jax.lax.rsqrt(var + eps)


class GCN(nn.Module):
    """2x DGCNN edge conv + fuse (information_interactive.py:87-130)."""
    feats_dim: int
    k: int

    @nn.compact
    def __call__(self, coords, feats, mask):
        def edge_conv(f, out_dim):
            d = square_dists(coords, coords)
            d = jnp.where(mask[None, :], d, 1e10)
            _, idx = jax.lax.top_k(-d, self.k)
            nbr = gather_points(f, idx)                   # (N, k, C)
            h = jnp.concatenate(
                [jnp.broadcast_to(f[:, None, :], nbr.shape), nbr - f[:, None, :]],
                -1)
            h = nn.Dense(out_dim, use_bias=False)(h)
            h = masked_instance_norm(
                h.reshape(-1, h.shape[-1]), jnp.repeat(mask, self.k)
            ).reshape(h.shape)
            h = nn.leaky_relu(h, 0.2)
            return jnp.max(h, axis=-2)                    # (N, out_dim)

        f1 = edge_conv(feats, self.feats_dim)
        f2 = edge_conv(f1, self.feats_dim * 2)
        h = jnp.concatenate([feats, f1, f2], -1)
        h = nn.Dense(self.feats_dim, use_bias=False)(h)
        h = masked_instance_norm(h, mask)
        return nn.leaky_relu(h, 0.2)


class PPFConv(nn.Module):
    """PPF neighborhood conv (information_interactive.py:48-84)."""
    out_dims: Sequence[int]
    k: int
    radius: float

    @nn.compact
    def __call__(self, coords, normals, mask):
        idx, valid = ball_query(coords, coords, self.radius, self.k,
                                points_mask=mask)
        grouped = gather_points(coords, idx)
        rel = grouped - coords[:, None, :]
        n_grp = gather_points(normals, idx)
        nr = jnp.broadcast_to(normals[:, None, :], rel.shape)
        ppf = jnp.stack([vec_angle(nr, rel), vec_angle(n_grp, rel),
                         vec_angle(nr, n_grp),
                         jnp.linalg.norm(rel, axis=-1)], -1)
        h = jnp.concatenate(
            [jnp.broadcast_to(coords[:, None, :], rel.shape), rel, ppf], -1)
        for d in self.out_dims:
            h = nn.Dense(d, use_bias=False)(h)
            h = nn.GroupNorm(num_groups=min(8, d))(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.where(valid[..., None], h, -1e9)
        return jnp.max(h, axis=-2)


class GGE(nn.Module):
    """PPF + GCN fused (information_interactive.py:133-162)."""
    feats_dim: int
    gcn_k: int
    ppf_k: int
    radius: float

    @nn.compact
    def __call__(self, coords, feats, normals, mask):
        f_ppf = PPFConv([self.feats_dim, self.feats_dim * 2, self.feats_dim],
                        self.ppf_k, self.radius)(coords, normals, mask)
        f_gcn = GCN(self.feats_dim, self.gcn_k)(coords, feats, mask)
        h = jnp.concatenate([f_ppf, f_gcn], -1)
        h = nn.Dense(2 * self.feats_dim)(h)
        h = nn.leaky_relu(masked_instance_norm(h, mask), 0.2)
        h = nn.Dense(self.feats_dim)(h)
        return nn.leaky_relu(masked_instance_norm(h, mask), 0.2)


class CrossAttention(nn.Module):
    """4-head cross attention + MLP merge
    (information_interactive.py:165-214)."""
    feats_dim: int
    nhead: int

    @nn.compact
    def __call__(self, f1, f2, mask1, mask2):
        d = self.feats_dim // self.nhead
        q = nn.Dense(self.feats_dim)(f1).reshape(f1.shape[0], self.nhead, d)
        k = nn.Dense(self.feats_dim)(f2).reshape(f2.shape[0], self.nhead, d)
        v = nn.Dense(self.feats_dim)(f2).reshape(f2.shape[0], self.nhead, d)
        scores = jnp.einsum("nhd,mhd->hnm", q, k, precision=_PREC) / (d ** 0.5)
        scores = jnp.where(mask2[None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, -1)
        h = jnp.einsum("hnm,mhd->nhd", attn, v,
                       precision=_PREC).reshape(f1.shape[0], self.feats_dim)
        h = nn.Dense(self.feats_dim)(h)
        h = jnp.concatenate([f1, h], -1)
        h = nn.Dense(2 * self.feats_dim)(h)
        h = nn.relu(masked_instance_norm(h, mask1))
        return nn.Dense(self.feats_dim)(h)


class InformationInteractive(nn.Module):
    """['gge', 'cross_attn', 'gge'] (information_interactive.py:217-254)."""
    cfg: NgeNetConfig

    @nn.compact
    def __call__(self, c1, f1, c2, f2, n1, n2, m1, m2):
        cfg = self.cfg
        r = cfg.first_subsampling_dl * cfg.radius_mul
        gge1 = GGE(cfg.gnn_feats_dim, cfg.dgcnn_k, cfg.ppf_k, r)
        f1 = gge1(c1, f1, n1, m1)
        f2 = gge1(c2, f2, n2, m2)
        ca = CrossAttention(cfg.gnn_feats_dim, cfg.num_head)
        f1 = f1 + ca(f1, f2, m1, m2)
        f2 = f2 + ca(f2, f1, m2, m1)
        gge2 = GGE(cfg.gnn_feats_dim, cfg.dgcnn_k, cfg.ppf_k, r)
        f1 = gge2(c1, f1, n1, m1)
        f2 = gge2(c2, f2, n2, m2)
        return f1, f2


class KPEncoder(nn.Module):
    """4-level encoder per architectures.py:100-111. Returns final feats +
    the three skip features (before each strided block)."""
    cfg: NgeNetConfig

    @nn.compact
    def __call__(self, pyr, feats, train: bool):
        cfg = self.cfg
        r0 = cfg.first_subsampling_dl * cfg.conv_radius
        p, m = pyr["points"], pyr["masks"]
        dn = cfg.dense
        if dn:
            nb = nbm = pool = poolm = [None] * 4
        else:
            nb, nbm = pyr["neighbors"], pyr["neighbor_masks"]
            pool, poolm = pyr["pools"], pyr["pool_masks"]
        d = cfg.first_feats_dim                    # 128
        skips = []
        # L0
        x = SimpleBlock(d, r0, dense=dn)(
            p[0], p[0], feats, nb[0], nbm[0], train, m[0], m[0])
        x = ResnetBottleneckBlock(d, r0, dense=dn)(
            p[0], p[0], x, nb[0], nbm[0], train, m[0], m[0])
        skips.append(x)                            # dim 128
        x = ResnetBottleneckBlock(d, r0, strided=True, dense=dn)(
            p[1], p[0], x, pool[0], poolm[0], train, m[0], m[1])
        # L1
        x = ResnetBottleneckBlock(2 * d, 2 * r0, dense=dn)(
            p[1], p[1], x, nb[1], nbm[1], train, m[1], m[1])
        x = ResnetBottleneckBlock(2 * d, 2 * r0, dense=dn)(
            p[1], p[1], x, nb[1], nbm[1], train, m[1], m[1])
        skips.append(x)                            # dim 256
        x = ResnetBottleneckBlock(2 * d, 2 * r0, strided=True, dense=dn)(
            p[2], p[1], x, pool[1], poolm[1], train, m[1], m[2])
        # L2
        x = ResnetBottleneckBlock(4 * d, 4 * r0, dense=dn)(
            p[2], p[2], x, nb[2], nbm[2], train, m[2], m[2])
        x = ResnetBottleneckBlock(4 * d, 4 * r0, dense=dn)(
            p[2], p[2], x, nb[2], nbm[2], train, m[2], m[2])
        skips.append(x)                            # dim 512
        x = ResnetBottleneckBlock(4 * d, 4 * r0, strided=True, dense=dn)(
            p[3], p[2], x, pool[2], poolm[2], train, m[2], m[3])
        # L3
        x = ResnetBottleneckBlock(8 * d, 8 * r0, dense=dn)(
            p[3], p[3], x, nb[3], nbm[3], train, m[3], m[3])
        x = ResnetBottleneckBlock(8 * d, 8 * r0, dense=dn)(
            p[3], p[3], x, nb[3], nbm[3], train, m[3], m[3])
        return x, skips


class NgeNet(nn.Module):
    """Full model. Call with two pyramids (src, tgt); returns per-cloud
    multi-scale features: (feats_h (+ol+sal), feats_m, feats_l) each."""
    cfg: NgeNetConfig = NgeNetConfig()

    @nn.compact
    def __call__(self, pyr_src, pyr_tgt, normals_src_l3, normals_tgt_l3,
                 train: bool = False):
        cfg = self.cfg
        enc = KPEncoder(cfg)
        ones_s = jnp.ones(pyr_src["points"][0].shape[:-1] + (1,))
        ones_t = jnp.ones(pyr_tgt["points"][0].shape[:-1] + (1,))
        x_s, skips_s = enc(pyr_src, ones_s, train)
        x_t, skips_t = enc(pyr_tgt, ones_t, train)

        bottleneck = nn.Dense(cfg.gnn_feats_dim)
        x_s, x_t = bottleneck(x_s), bottleneck(x_t)
        m_s3, m_t3 = pyr_src["masks"][3], pyr_tgt["masks"][3]
        c_s3, c_t3 = pyr_src["points"][3], pyr_tgt["points"][3]

        x_s, x_t = InformationInteractive(cfg)(
            c_s3, x_s, c_t3, x_t, normals_src_l3, normals_tgt_l3, m_s3, m_t3)
        pro = nn.Dense(cfg.gnn_feats_dim)
        x_s, x_t = pro(x_s), pro(x_t)

        # overlap scores via learned-temperature cross attention
        # (NgeNet.py:169-179)
        attn_head = nn.Dense(1)
        a_s, a_t = attn_head(x_s), attn_head(x_t)        # (N, 1)
        epsilon = self.param("epsilon", lambda _: jnp.asarray(-5.0))
        temperature = jnp.exp(epsilon) + 0.03
        xs_n = x_s / (jnp.linalg.norm(x_s, axis=-1, keepdims=True) + 1e-8)
        xt_n = x_t / (jnp.linalg.norm(x_t, axis=-1, keepdims=True) + 1e-8)
        inner = jnp.einsum("nc,mc->nm", xs_n, xt_n, precision=_PREC)
        inner_s = jnp.where(m_t3[None, :], inner / temperature, -1e9)
        inner_t = jnp.where(m_s3[None, :], inner.T / temperature, -1e9)
        ol_s = jax.nn.softmax(inner_s, -1) @ a_t          # (N, 1)
        ol_t = jax.nn.softmax(inner_t, -1) @ a_s

        def decode(x, a, ol, skips, pyr):
            ups = pyr["upsamples"]
            h = jnp.concatenate([x, a, ol], -1)           # gnn+2
            # decoder h: upsample+skip+unary x3 (NgeNet.py:185-212)
            h = nearest_upsample(h, ups[2])
            h = jnp.concatenate([h, skips[2]], -1)
            h = UnaryBlock(cfg.gnn_feats_dim)(h, train)
            m = skips[2]
            h = nearest_upsample(h, ups[1])
            m = nearest_upsample(m, ups[1])
            h = jnp.concatenate([h, skips[1]], -1)
            m = jnp.concatenate([m, skips[1]], -1)
            h = UnaryBlock(cfg.gnn_feats_dim // 2)(h, train)
            m = UnaryBlock(cfg.gnn_feats_dim // 2)(m, train)
            lo = skips[1]
            h = nearest_upsample(h, ups[0])
            m = nearest_upsample(m, ups[0])
            lo = nearest_upsample(lo, ups[0])
            h = jnp.concatenate([h, skips[0]], -1)
            m = jnp.concatenate([m, skips[0]], -1)
            lo = jnp.concatenate([lo, skips[0]], -1)
            h = nn.Dense(cfg.final_feats_dim + 2)(h)      # last_unary
            m = nn.Dense(cfg.final_feats_dim)(m)
            lo = nn.Dense(cfg.final_feats_dim)(lo)
            overlap = jax.nn.sigmoid(h[..., -2])
            saliency = jax.nn.sigmoid(h[..., -1])
            fh = h[..., :-2]
            fh = fh / (jnp.linalg.norm(fh, axis=-1, keepdims=True) + 1e-8)
            fm = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-8)
            fl = lo / (jnp.linalg.norm(lo, axis=-1, keepdims=True) + 1e-8)
            return {"feats_h": fh, "feats_m": fm, "feats_l": fl,
                    "overlap": overlap, "saliency": saliency}

        out_s = decode(x_s, a_s, ol_s, skips_s, pyr_src)
        out_t = decode(x_t, a_t, ol_t, skips_t, pyr_tgt)
        return out_s, out_t


def vote(src_pts, tgt_pts, feats_src, feats_tgt, voxel_size,
         src_mask=None, tgt_mask=None):
    """Multi-scale distance-consistency vote (vote.py:6-37).

    feats_*: dicts with feats_h/m/l. Returns (sel mask over src, corr idx
    into tgt, feats_h possibly replaced by feats_m where only m+l agree).
    """
    def nn_idx(fs, ft):
        d = square_dists(fs, ft)
        if tgt_mask is not None:
            d = jnp.where(tgt_mask[None, :], d, 1e10)
        return jnp.argmin(d, -1)

    i1 = nn_idx(feats_src["feats_h"], feats_tgt["feats_h"])
    i2 = nn_idx(feats_src["feats_m"], feats_tgt["feats_m"])
    i3 = nn_idx(feats_src["feats_l"], feats_tgt["feats_l"])
    y1, y2, y3 = tgt_pts[i1], tgt_pts[i2], tgt_pts[i3]
    d12 = jnp.linalg.norm(y1 - y2, axis=-1)
    d13 = jnp.linalg.norm(y1 - y3, axis=-1)
    d23 = jnp.linalg.norm(y2 - y3, axis=-1)
    thresh = voxel_size * 2
    sel_h = (d12 < thresh) | (d13 < thresh)
    sel_m = d23 < thresh
    sel = sel_h | sel_m
    if src_mask is not None:
        sel = sel & src_mask
    replace = (~sel_h) & sel_m
    feats_h = jnp.where(replace[:, None], feats_src["feats_m"],
                        feats_src["feats_h"])
    corr_idx = jnp.where(replace, i2, i1)
    return sel, corr_idx, feats_h
