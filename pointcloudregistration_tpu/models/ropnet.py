"""ROPNet — end-to-end rigid registration (CG coarse + TFMR fine), flax.

Capability parity with ROPNet/src/models/{CG,TFMR,ROPNet}.py:
  * CGModule (CG.py:63-106): siamese PointNet encoder (192/192/192/384/1536),
    7-dof quat+trans head from concatenated global features, per-point
    overlap classifier on the [f, g_x, g_y, g_x - g_y] ensemble;
  * TFMRModule (TFMR.py:17-257): ball-query + PPF local features
    (conv stack 256/512/feat_dim, GroupNorm), 5 stacked shared-qk overlap
    attention blocks with offset-style residuals, top-N1 overlap gating,
    similarity-matrix top-prob filtering, top-k softmax virtual
    correspondences;
  * ROPNet.forward (ROPNet.py:26-96): T0 from CG, then num_iter rounds of
    TFMR + weighted Kabsch composition.

TPU-first shifts: channels-last everywhere (1x1 convs = Dense on the MXU);
the iter-0 target-feature cache becomes explicit functional reuse; all
top-k/sort selections are static-shape lax.top_k.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from pointcloudregistration_tpu.core import se3, procrustes
from pointcloudregistration_tpu.core.geometry import angle as vec_angle
from pointcloudregistration_tpu.ops.ball_query import ball_query
from pointcloudregistration_tpu.core.geometry import gather_points

_PREC = jax.lax.Precision.HIGHEST


class ROPNetConfig(NamedTuple):
    """Defaults per ROPNet/src/configs/arguments.py:4-86."""
    N1: int = 896                 # train_N1 (448*2)
    M1: int = 1434                # train_M1 (717*2)
    top_prob: float = 0.6
    similarity_topk: int = 3
    test_top_prob: float = 0.4
    test_similarity_topk: int = 1
    radius: float = 0.3
    num_neighbors: int = 64
    feat_dim: int = 192
    use_ppf: bool = True
    num_iter: int = 2

    @property
    def N2(self) -> int:
        return int(self.top_prob * self.N1)


class PointNetSeq(nn.Module):
    """1x1-conv stack, channels-last (CG.py:15-43)."""
    out_dims: Sequence[int]
    gn: bool = False
    cls: bool = False

    @nn.compact
    def __call__(self, x):
        n = len(self.out_dims)
        for i, d in enumerate(self.out_dims):
            x = nn.Dense(d)(x)
            if self.gn:
                x = nn.GroupNorm(num_groups=8)(x)
            if self.cls and i != n - 1:
                x = nn.relu(x)
        return x


class MLPs(nn.Module):
    """FC stack with dropout (CG.py:46-60)."""
    mlps: Sequence[int]
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.mlps)
        for i, d in enumerate(self.mlps):
            x = nn.Dense(d)(x)
            if i != n - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class CGModule(nn.Module):
    """Context-guided coarse alignment (CG.py:63-106)."""

    @nn.compact
    def __call__(self, src, tgt, train: bool = False):
        enc = PointNetSeq([192, 192, 192, 384, 1536])
        f_x = enc(src)                          # (B, N, 1536)
        f_y = enc(tgt)
        g_x = jnp.max(f_x, axis=-2)             # (B, 1536)
        g_y = jnp.max(f_y, axis=-2)
        concat = jnp.concatenate([g_x, g_y], -1)

        out = MLPs([1536, 1536, 768, 7])(concat, train)
        t0 = out[..., :3]
        quat = out[..., 3:]
        R0 = se3.quat_to_rotmat(quat)

        def ensemble(f, g_self, g_other):
            gs = jnp.broadcast_to(g_self[..., None, :], f.shape)
            go = jnp.broadcast_to(g_other[..., None, :], f.shape)
            return jnp.concatenate([f, gs, go, gs - go], -1)

        dec_ol = PointNetSeq([1536, 1536, 768, 2], cls=True)
        x_ol = dec_ol(ensemble(f_x, g_x, g_y))  # (B, N, 2) logits
        y_ol = dec_ol(ensemble(f_y, g_y, g_x))
        return R0, t0, x_ol, y_ol


class LocalFeatures(nn.Module):
    """Ball-query grouping + PPF -> conv stack -> max over K
    (TFMR.py:17-74)."""
    radius: float
    K: int
    out_dims: Sequence[int]

    @nn.compact
    def __call__(self, xyz, normals=None):
        # group K neighbors around every point (M=-1 in the reference)
        idx, valid = ball_query(xyz, xyz, self.radius, self.K)
        grouped = gather_points(xyz, idx)                 # (B, N, K, 3)
        rel = grouped - xyz[..., :, None, :]
        feats = [jnp.broadcast_to(xyz[..., :, None, :], rel.shape), rel]
        if normals is not None:
            n_grouped = gather_points(normals, idx)
            nr = jnp.broadcast_to(normals[..., :, None, :], rel.shape)
            nr_d = vec_angle(nr, rel)
            ni_d = vec_angle(n_grouped, rel)
            nr_ni = vec_angle(nr, n_grouped)
            d_norm = jnp.linalg.norm(rel, axis=-1)
            feats.append(jnp.stack([nr_d, ni_d, nr_ni, d_norm], -1))
        h = jnp.concatenate(feats, -1)                    # (B, N, K, 10|6)
        for d in self.out_dims:
            h = nn.Dense(d, use_bias=False)(h)
            h = nn.GroupNorm(num_groups=d // 32)(h)
            h = nn.relu(h)
        # mask padded neighbors out of the max
        h = jnp.where(valid[..., None], h, -1e9)
        return jnp.max(h, axis=-2)                        # (B, N, feat_dim)


class OverlapAttentionBlock(nn.Module):
    """Shared-qk offset attention (TFMR.py:76-107)."""
    channels: int

    @nn.compact
    def __call__(self, x, ol_score=None):
        qk = nn.Dense(self.channels // 4, use_bias=False)
        x_q = qk(x)                                       # (B, N, C/4)
        x_k = qk(x)                                       # shared weights
        x_v = nn.Dense(self.channels)(x)
        attn = jnp.einsum("...nc,...mc->...nm", x_q, x_k, precision=_PREC)
        if ol_score is not None:
            attn = ol_score[..., :, None] * attn
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn / (1e-9 + jnp.sum(attn, axis=-2, keepdims=True))
        x_r = jnp.einsum("...nm,...mc->...nc", attn, x_v, precision=_PREC)
        x_r = nn.Dense(self.channels)(x - x_r)
        x_r = nn.relu(nn.GroupNorm(num_groups=self.channels // 32)(x_r))
        return x + x_r


class OverlapAttention(nn.Module):
    """5 stacked blocks + fuse (TFMR.py:109-130). Output dim = 5*dim."""
    dim: int

    @nn.compact
    def __call__(self, x, ol=None):
        xs = []
        h = x
        for _ in range(5):
            h = OverlapAttentionBlock(self.dim)(h, ol)
            xs.append(h)
        h = jnp.concatenate(xs, -1)
        h = nn.Dense(5 * self.dim, use_bias=False)(h)
        h = nn.GroupNorm(num_groups=20)(h)
        return nn.leaky_relu(h, 0.2)


class TFMRModule(nn.Module):
    """Transformer feature matching + removal (TFMR.py:135-257)."""
    cfg: ROPNetConfig

    def setup(self):
        self.local_features = LocalFeatures(
            self.cfg.radius, self.cfg.num_neighbors,
            [256, 512, self.cfg.feat_dim])
        self.attention = OverlapAttention(self.cfg.feat_dim)

    def embed(self, xyz, normals):
        f = self.local_features(xyz, normals if self.cfg.use_ppf else None)
        f = self.attention(f, None)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, src, f_x_atten, x_ol_score, tgt_sel, f_y_atten,
                 train: bool = True):
        """One matching round given precomputed embeddings.

        src (B, N1, 3) overlap-gated source points (already embedded),
        tgt_sel (B, M1, 3) gated target with cached features f_y_atten.
        Returns (src_sel (B, N2, 3), tgt_corr (B, N2, 3), icp_weights,
        sim_max_inds).
        """
        cfg = self.cfg
        N2 = int((cfg.top_prob if train else cfg.test_top_prob) * cfg.N1)
        topk = cfg.similarity_topk if train else cfg.test_similarity_topk
        sim = jnp.einsum("...nc,...mc->...nm", f_x_atten, f_y_atten,
                         precision=_PREC)                 # (B, N1, M1)
        sim_max = jnp.max(sim, -1)
        _, sim_max_inds = jax.lax.top_k(sim_max, N2)      # (B, N2)
        src_sel = gather_points(src, sim_max_inds)
        sim_sel = gather_points(sim, sim_max_inds)        # (B, N2, M1)
        x_ol_sel = jnp.take_along_axis(x_ol_score, sim_max_inds, -1)
        # top-k mask over the similarity row
        kth = jax.lax.top_k(sim_sel, topk)[0][..., -1:]
        mask = sim_sel >= kth
        sim_m = jnp.where(mask, sim_sel, 0.0)
        w = sim_m / (jnp.sum(sim_m, -1, keepdims=True) + 1e-8)
        tgt_corr = jnp.einsum("...nm,...mc->...nc", w, tgt_sel,
                              precision=_PREC)
        return src_sel, tgt_corr, x_ol_sel, sim_max_inds


class ROPNet(nn.Module):
    """Top-level iterated registration (ROPNet.py:18-96)."""
    cfg: ROPNetConfig = ROPNetConfig()

    def setup(self):
        self.cg = CGModule()
        self.tfmr = TFMRModule(self.cfg)

    def __call__(self, src, tgt, train: bool = True):
        """src/tgt (B, N, 3) or (B, N, 6) with normals. Returns results dict."""
        cfg = self.cfg
        normal_src = src[..., 3:] if src.shape[-1] == 6 else None
        normal_tgt = tgt[..., 3:] if tgt.shape[-1] == 6 else None
        src = src[..., :3]
        tgt = tgt[..., :3]
        src_raw = src

        R, t0_, x_ol, y_ol = self.cg(src, tgt, train)
        t = t0_
        src_t = se3.transform(src_raw, R, t)
        pred_Ts = [(R, t)]
        pred_src = [src_t]
        x_ol_score = jax.lax.stop_gradient(
            jax.nn.softmax(x_ol, -1)[..., 1])             # (B, N)
        y_ol_score = jax.lax.stop_gradient(
            jax.nn.softmax(y_ol, -1)[..., 1])

        # overlap gating of the target once (iter-0 cache, TFMR.py:216-224)
        _, y_inds = jax.lax.top_k(y_ol_score, cfg.M1)
        tgt_sel = gather_points(tgt, y_inds)
        n_tgt_sel = (gather_points(normal_tgt, y_inds)
                     if normal_tgt is not None else None)
        f_y = self.tfmr.embed(tgt_sel, n_tgt_sel)

        x_ol_sorted, x_inds = jax.lax.top_k(x_ol_score, cfg.N1)
        sim_max_inds = None
        for it in range(cfg.num_iter):
            src_t = jax.lax.stop_gradient(src_t)
            src_gated = gather_points(src_t, x_inds)      # (B, N1, 3)
            n_src_t = None
            if normal_src is not None:
                n_src_t = jax.lax.stop_gradient(
                    jnp.einsum("...ij,...nj->...ni", R, normal_src,
                               precision=_PREC))
                n_src_t = gather_points(n_src_t, x_inds)
            f_x = self.tfmr.embed(src_gated, n_src_t)
            src_sel, tgt_corr, icp_w, sim_max_inds = self.tfmr(
                src_gated, f_x, x_ol_sorted, tgt_sel, f_y, train)
            R_cur, t_cur = procrustes.kabsch(src_sel, tgt_corr, icp_w)
            R, t = se3.compose(R_cur, t_cur, R, t)
            src_t = se3.transform(src_raw, R, t)
            pred_Ts.append((R, t))
            pred_src.append(src_t)

        src_ol1 = gather_points(src_raw, x_inds)
        src_ol2 = gather_points(src_ol1, sim_max_inds)
        return {
            "pred_Ts": pred_Ts,
            "pred_src": pred_src,
            "x_ol": x_ol, "y_ol": y_ol,
            "src_ol1": src_ol1, "src_ol2": src_ol2,
        }
