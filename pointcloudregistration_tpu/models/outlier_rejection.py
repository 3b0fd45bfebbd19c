"""Outlier-rejection variants: geometry attention, view-graph GAT, cycle
consistency.

Capability parity with the reference's correspondence outlier-rejection
submodules (c2p-net/deformationpyramid/correspondence/outlier_rejection/):

  * `CorrespondenceAttentionLayer` — geometry_attention.py:8-106: multi-head
    attention over 6-d correspondences with the spatial-compatibility matrix
    MULTIPLYING the attention logits (a = a * compat before softmax), PE
    types none / sinusoidal (additive w(x+p)) / rotary, merge + concat-MLP
    feed-forward with two LayerNorms and a residual.
  * `GATLayer` — graph_attention.py:41-157: GAT attention over the view
    graph of correspondences. The reference materializes an edge LIST and
    scatter_adds per-edge messages; on TPU the same math is a dense masked
    softmax over a static (M, M) adjacency — no scatters, rides the MXU.
  * `CycleOutlierRejection` — cycle_consistency.py:11-124 Outlier_Rejection:
    6-d packing, optional spatial-compatibility check, alternating
    geometry/graph attention stacks ('geo' | 'crs' | 'geocrs' | 'crsgeo'),
    64->32->1 sigmoid confidence head.
  * `view_graph_adjacency` — cycle_consistency.py:169-231
    creat_graph_of_correspondences: correspondences from different pairs are
    connected when they touch the SAME physical cloud within `edge_radius`.
    Static-shape dense adjacency instead of a ragged edge list.

The NeCo-style single-pair rejector lives in models/lepard.py
(OutlierRejection); these variants add the multiview/cycle capability.
Training signal: the same BCE-vs-inlier-labels as NeCo
(losses/lepard.py neco_loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudregistration_tpu.core.geometry import square_dists
from pointcloudregistration_tpu.models.lepard import (
    position_encoding, embed_rotary)

_PREC = jax.lax.Precision.HIGHEST


def spatial_compatibility(corr_src: jax.Array, corr_tgt: jax.Array,
                          sigma_spat: float,
                          mask: jax.Array | None = None) -> jax.Array:
    """clamp(1 - (|d_src| - |d_tgt|)^2 / sigma^2, 0) per correspondence pair.

    (reference: cycle_consistency.py:66-73 — length-preservation prior:
    inlier pairs keep their mutual distance across the two clouds.)
    corr_src/corr_tgt (..., L, 3) -> (..., L, L).
    """
    ds = jnp.sqrt(square_dists(corr_src, corr_src) + 1e-12)
    dt = jnp.sqrt(square_dists(corr_tgt, corr_tgt) + 1e-12)
    compat = jax.nn.relu(1.0 - (ds - dt) ** 2 / sigma_spat ** 2)
    if mask is not None:
        compat = jnp.where(mask[..., None, :] & mask[..., :, None],
                           compat, 0.0)
    return compat


class CorrespondenceAttentionLayer(nn.Module):
    """Pair-wise 6-d correspondence attention (geometry_attention.py:8-106).

    x (..., L, C) attends over source (..., S, C); `compat` (..., L, S)
    multiplies the raw logits (the reference's `a = a * compatibility`),
    which soft-gates messages through geometrically consistent pairs while
    the padded entries are hard-masked.
    """
    feat_dim: int = 128
    n_heads: int = 4
    pe_type: str = "sinusoidal"        # none | sinusoidal | rotary

    @nn.compact
    def __call__(self, x, source, x_pe=None, source_pe=None,
                 source_mask=None, compat=None):
        d = self.feat_dim // self.n_heads
        q_in, k_in = x, source
        if self.pe_type == "sinusoidal" and x_pe is not None:
            q_in = q_in + x_pe
            k_in = k_in + source_pe
        qw = nn.Dense(self.feat_dim, use_bias=False, name="q_proj")(q_in)
        kw = nn.Dense(self.feat_dim, use_bias=False, name="k_proj")(k_in)
        vw = nn.Dense(self.feat_dim, use_bias=False, name="v_proj")(source)
        if self.pe_type == "rotary" and x_pe is not None:
            qw = embed_rotary(qw, x_pe)
            kw = embed_rotary(kw, source_pe)
        qw = qw.reshape(qw.shape[:-1] + (self.n_heads, d))
        kw = kw.reshape(kw.shape[:-1] + (self.n_heads, d))
        vw = vw.reshape(vw.shape[:-1] + (self.n_heads, d))
        a = jnp.einsum("...lhd,...shd->...lsh", qw, kw, precision=_PREC)
        if compat is not None:
            a = a * compat[..., None]
        if source_mask is not None:
            a = jnp.where(source_mask[..., None, :, None], a, -1e9)
        a = jax.nn.softmax(a / d ** 0.5, axis=-2)
        o = jnp.einsum("...lsh,...shd->...lhd", a, vw, precision=_PREC)
        o = o.reshape(o.shape[:-2] + (self.feat_dim,))
        msg = nn.LayerNorm(name="norm1")(
            nn.Dense(self.feat_dim, use_bias=False, name="merge")(o))
        ff = nn.Dense(2 * self.feat_dim, use_bias=False)(
            jnp.concatenate([x, msg], -1))
        ff = nn.Dense(self.feat_dim, use_bias=False)(nn.relu(ff))
        return x + nn.LayerNorm(name="norm2")(ff)


class GATLayer(nn.Module):
    """Graph-attention layer over a dense adjacency (graph_attention.py:41).

    feats (M, C) node features, adj (M, M) bool: adj[t, s] = edge s -> t.
    Per head: score_e(t, s) = LeakyReLU(a_src . h_s + a_tgt . h_t),
    attention normalized over the sources of each target (the reference's
    scatter-grouped softmax), messages aggregated, heads concatenated.

    Two deliberate deviations from the reference GATLayer.forward
    (outlier_rejection/graph_attention.py): (a) the reference constructs a
    skip projection and ELU activation but never applies them (dead code in
    its forward); here they ARE applied — the standard GAT formulation the
    reference intended. (b) the reference's edge list can contain duplicate
    edges when two correspondences share both clouds, doubling their softmax
    weight; the dense boolean adjacency ORs duplicates into one edge.
    """
    feat_dim: int = 128
    n_heads: int = 4

    @nn.compact
    def __call__(self, feats, adj):
        M = feats.shape[0]
        d = self.feat_dim // self.n_heads
        h = nn.Dense(self.n_heads * d, use_bias=False,
                     name="input_proj")(feats).reshape(M, self.n_heads, d)
        a_src = self.param("scoring_fn_source", nn.initializers.xavier_uniform(),
                           (1, self.n_heads, d))
        a_tgt = self.param("scoring_fn_target", nn.initializers.xavier_uniform(),
                           (1, self.n_heads, d))
        s_src = jnp.sum(h * a_src, -1)                  # (M, H)
        s_tgt = jnp.sum(h * a_tgt, -1)
        e = nn.leaky_relu(s_tgt[:, None, :] + s_src[None, :, :],
                          negative_slope=0.2)           # (Mt, Ms, H)
        e = jnp.where(adj[..., None], e, -1e9)
        att = jax.nn.softmax(e, axis=1)
        # isolated nodes (no incoming edges) get a zero message, not NaN
        att = jnp.where(jnp.any(adj, axis=1)[:, None, None], att, 0.0)
        out = jnp.einsum("tsh,shd->thd", att, h, precision=_PREC)
        out = out.reshape(M, self.n_heads * d)
        out = out + self.param("bias", nn.initializers.zeros,
                               (self.n_heads * d,))
        skip = nn.Dense(self.n_heads * d, use_bias=False,
                        name="skip_proj")(feats)
        return nn.elu(out + skip)


def view_graph_adjacency(vec6d: jax.Array, mask: jax.Array,
                         pcd_pairs: jax.Array, edge_radius: float):
    """Dense view-graph adjacency over correspondences.

    vec6d (P, L, 6) per-pair matches (head xyz | tail xyz), mask (P, L),
    pcd_pairs (P, 2) int cloud ids per pair. Two correspondences are
    connected when they touch the same physical cloud and their endpoint
    positions in that shared cloud are within `edge_radius`
    (cycle_consistency.py:169-231). Returns (adj (M, M) bool,
    lengths (M, M) f32) with M = P * L; self-edges kept, as in the
    reference's creat_graph_of_correspondences.
    """
    P, L, _ = vec6d.shape
    M = P * L
    # endpoint table: slot 0 = head cloud, slot 1 = tail cloud
    pos = jnp.stack([vec6d[..., :3], vec6d[..., 3:]], axis=-2)   # (P, L, 2, 3)
    cid = jnp.broadcast_to(pcd_pairs[:, None, :], (P, L, 2))     # (P, L, 2)
    pos = pos.reshape(M, 2, 3)
    cid = cid.reshape(M, 2)
    m = mask.reshape(M)
    adj = jnp.zeros((M, M), bool)
    best = jnp.full((M, M), jnp.inf, jnp.float32)
    for s1 in range(2):
        for s2 in range(2):
            same = cid[:, None, s1] == cid[None, :, s2]
            d2 = square_dists(pos[:, s1], pos[:, s2])
            hit = same & (d2 < edge_radius ** 2)
            adj = adj | hit
            best = jnp.where(hit, jnp.minimum(best, d2), best)
    adj = adj & m[:, None] & m[None, :]
    lengths = jnp.where(adj, jnp.sqrt(jnp.where(jnp.isfinite(best),
                                                best, 0.0)), 0.0)
    return adj, lengths


class CycleOutlierRejection(nn.Module):
    """Cycle-consistency outlier rejection (cycle_consistency.py:11-124).

    Alternates pair-wise geometry attention with view-graph GAT layers and
    classifies each correspondence. Inputs are the static-shape analogue of
    the reference's _3D_to_6D packing: per-pair matched coordinates + mask
    + the view-graph pair table.
    """
    feat_dim: int = 128
    n_layers: int = 3
    n_heads: int = 4
    pe_type: str = "sinusoidal"
    alternate: str = "geocrs"         # geo | crs | geocrs | crsgeo
    sigma_spat: float = 0.1
    edge_radius: float = 0.1
    voxel: float = 0.025
    spatial_consistency_check: bool = True

    @nn.compact
    def __call__(self, corr_src, corr_tgt, mask, pcd_pairs):
        """corr_src/corr_tgt (P, L, 3), mask (P, L), pcd_pairs (P, 2)
        -> confidence (P, L) in [0, 1]."""
        P, L, _ = corr_src.shape
        vec6d = jnp.concatenate([corr_src, corr_tgt], -1)   # (P, L, 6)
        compat = spatial_compatibility(corr_src, corr_tgt, self.sigma_spat,
                                       mask) \
            if self.spatial_consistency_check else None
        pe = None
        if self.pe_type != "none":
            # 6-d PE = PE(src xyz) | PE(tgt xyz), each at feat_dim/2
            # (outlier_rejection/position_encoding.py:45-52 forward)
            pe = jnp.concatenate(
                [position_encoding(corr_src, self.feat_dim // 2, self.voxel,
                                   self.pe_type),
                 position_encoding(corr_tgt, self.feat_dim // 2, self.voxel,
                                   self.pe_type)], -1)
        adj, _ = view_graph_adjacency(vec6d, mask, pcd_pairs,
                                      self.edge_radius)
        feat = nn.Dense(self.feat_dim, name="in_proj")(vec6d)

        geo_layers = [CorrespondenceAttentionLayer(
            self.feat_dim, self.n_heads, self.pe_type, name=f"geo_{i}")
            for i in range(self.n_layers)]
        gat_layers = [GATLayer(self.feat_dim, self.n_heads, name=f"gat_{i}")
                      for i in range(self.n_layers)]

        def run_geo(f):
            for lyr in geo_layers:
                f = lyr(f, f, pe, pe, source_mask=mask, compat=compat)
            return f

        def run_gat(f):
            flat = f.reshape(P * L, self.feat_dim)
            for lyr in gat_layers:
                flat = lyr(flat, adj)
            return flat.reshape(P, L, self.feat_dim)

        if self.alternate == "geo":
            feat = run_geo(feat)
        elif self.alternate == "crs":
            feat = run_gat(feat)
        elif self.alternate == "geocrs":
            feat = run_gat(run_geo(feat))
        elif self.alternate == "crsgeo":
            feat = run_geo(run_gat(feat))
        else:
            raise KeyError(self.alternate)

        h = nn.relu(nn.Dense(64)(feat))
        h = nn.relu(nn.Dense(32)(h))
        conf = nn.Dense(1)(h)[..., 0]
        conf = jnp.where(mask, conf, -1e9)
        return jax.nn.sigmoid(conf)
