"""Kernel Point Convolution blocks, flax, over static masked neighbor tables.

Capability parity with c2p-net/ngenet/models/KPConv/blocks.py:44-327
(KPConv linear-influence sum-aggregation conv; Simple / ResnetBottleneck /
strided / Unary / NearestUpsample blocks) and kernel_points.py (kernel
dispositions — the reference ships an optimized .ply cache; here a
deterministic Fibonacci-sphere disposition, which serves the same role of a
fixed quasi-uniform kernel layout).

TPU-first: the reference's ragged stacked batching with a sentinel shadow
row (blocks.py:83-85) becomes boolean neighbor masks on fixed-K tables; the
per-kernel-point correlation + aggregation is one einsum chain on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from pointcloudregistration_tpu.core.geometry import gather_points

_PREC = jax.lax.Precision.HIGHEST
# feature-path matmul precision: 3-pass bf16 emulation (~2e-6 relative) —
# half the MXU passes of HIGHEST; geometry (influence cross-terms) stays
# HIGHEST since distances feed a relu cutoff
_FEAT_PREC = jax.lax.Precision.HIGH


def spherical_lloyd(num_points: int, radius: float = 1.0,
                    n_samples: int = 20000, n_iter: int = 40,
                    fixed_center: bool = True, seed: int = 42) -> np.ndarray:
    """Lloyd-optimized kernel disposition in the ball — the reference's
    `spherical_Lloyd` (kernel_points.py:66-243): k-means over uniform ball
    samples, optionally pinning point 0 at the center ('center' fixed mode),
    giving volumetric (not shell) dispositions. Deterministic given seed."""
    rng = np.random.default_rng(seed)
    # uniform samples in the unit ball (rejection-free: radius ~ u^(1/3))
    dirs = rng.normal(size=(n_samples, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-12
    samples = dirs * rng.random((n_samples, 1)) ** (1.0 / 3.0)
    # init: random subset
    centers = samples[rng.choice(n_samples, num_points, replace=False)]
    if fixed_center:
        centers[0] = 0.0
    for _ in range(n_iter):
        d2 = (np.sum(samples**2, 1)[:, None] + np.sum(centers**2, 1)[None]
              - 2.0 * samples @ centers.T)
        assign = np.argmin(d2, 1)
        for k in range(1 if fixed_center else 0, num_points):
            sel = samples[assign == k]
            if len(sel):
                centers[k] = sel.mean(0)
    return (centers * radius).astype(np.float32)


def kernel_points(num_points: int = 15, radius: float = 1.0) -> np.ndarray:
    """Deterministic Lloyd-optimized kernel disposition, cached per shape.

    (reference: kernel_points.py:66-470 Lloyd-optimized dispositions cached
    as kernels/k_015_center.ply — 'center' fixed mode.)
    """
    key = (num_points, float(radius))
    if key not in _KP_CACHE:
        _KP_CACHE[key] = spherical_lloyd(num_points, radius)
    return _KP_CACHE[key]


_KP_CACHE: dict = {}


class KPConv(nn.Module):
    """One kernel-point convolution (blocks.py:44-128).

    q_pts (M, 3) query positions, s_pts (N, 3) support positions,
    feats (N, Cin), neighbors (M, K) int32 + mask (M, K).

    dense=True switches to the fused dense-radius Pallas kernel
    (ops/kpconv_pallas.py): neighbors/neighbor_mask are ignored and
    s_mask/q_mask carry validity; the adjacency cutoff is
    cutoff_mul * radius (1x for in-level convs — the neighbor-table
    radius — 2x for strided convs — the pool-table radius). Parameter
    names/shapes are identical in both modes, so checkpoints are
    interchangeable.
    """
    out_dim: int
    radius: float              # conv radius (sets KP extent scaling)
    num_kernel_points: int = 15
    kp_extent_ratio: float = 2.0 / 2.5   # KP_extent/conv_radius (MRI.yaml)
    dense: bool = False
    cutoff_mul: float = 1.0

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors=None,
                 neighbor_mask=None, s_mask=None, q_mask=None):
        K = self.num_kernel_points
        in_dim = feats.shape[-1]
        kp = self.param(
            "kernel_points",
            lambda _: jnp.asarray(kernel_points(K, self.radius)))
        kp = jax.lax.stop_gradient(kp)          # fixed disposition
        W = self.param("weights", nn.initializers.lecun_normal(),
                       (K, in_dim, self.out_dim))
        extent = self.radius * self.kp_extent_ratio
        if self.dense:
            from pointcloudregistration_tpu.ops.kpconv_pallas import (
                kpconv_dense)
            if s_mask is None:
                s_mask = jnp.ones(s_pts.shape[:-1], bool)
            if q_mask is None:
                q_mask = jnp.ones(q_pts.shape[:-1], bool)
            return kpconv_dense(q_pts, s_pts, feats, s_mask, q_mask, kp, W,
                                cutoff=self.radius * self.cutoff_mul,
                                extent=extent)
        nbr_pts = gather_points(s_pts, neighbors)        # (M, K_n, 3)
        rel = nbr_pts - q_pts[..., :, None, :]           # (M, K_n, 3)
        # linear influence of each kernel point on each neighbor; the
        # neighbor-to-kernel-point distance via the quadratic expansion so
        # the cross-term is one (M*K_n, 3) x (3, K) matmul on the MXU
        # instead of a materialized (M, K_n, K, 3) difference tensor
        d2 = (jnp.sum(rel * rel, -1)[..., :, None]
              + jnp.sum(kp * kp, -1)[None, None, :]
              - 2.0 * jnp.einsum("...nc,kc->...nk", rel, kp,
                                 precision=_PREC))       # (M, K_n, K)
        # clamp below by eps, not 0: catastrophic cancellation can drive
        # d2 <= 0 for a neighbor coincident with a kernel point, and
        # d/dx sqrt(x) -> inf at 0 would NaN the whole gradient (the
        # deformable variant actively moves kernel points toward
        # neighbors, so this is reachable in training). Bias ~1e-6 in d,
        # negligible vs the conv extent.
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        infl = jax.nn.relu(1.0 - d / extent)
        infl = jnp.where(neighbor_mask[..., :, :, None], infl, 0.0)
        nbr_feats = gather_points(feats, neighbors)      # (M, K_n, Cin)
        # sum aggregation: per kernel point, influence-weighted neighbor
        # sum. Feature matmuls run at Precision.HIGH (3-pass, ~2e-6 rel):
        # these are FEATURE computations (the pose math in core/ stays
        # HIGHEST) — held-out feature-inlier metrics unchanged (±0.01).
        # Note the forward is gather-bound, not matmul-bound (PERF.md r04):
        # this buys shape hygiene, not throughput
        h = jnp.einsum("...nk,...nc->...kc", infl, nbr_feats,
                       precision=_FEAT_PREC)             # (M, K, Cin)
        out = jnp.einsum("...kc,kcd->...d", h, W, precision=_FEAT_PREC)
        return out


class KPConvDeformable(nn.Module):
    """Deformable kernel-point convolution (the deformable KPConv variants
    in correspondence/lepard/blocks.py): a rigid KPConv first predicts
    per-query offsets for every kernel point, the main correlation then
    evaluates influences at the shifted kernel positions. Offsets are
    initialized to zero (zero-init offset head) so the layer starts exactly
    rigid."""
    out_dim: int
    radius: float
    num_kernel_points: int = 15
    kp_extent_ratio: float = 2.0 / 2.5
    offset_scale: float = 1.0          # offsets bounded by KP extent

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask):
        K = self.num_kernel_points
        in_dim = feats.shape[-1]
        extent = self.radius * self.kp_extent_ratio
        # offset predictor: rigid KPConv with a zero-init head -> (M, K, 3)
        off = KPConv(3 * K, self.radius, K, self.kp_extent_ratio,
                     name="offset_conv")(q_pts, s_pts, feats, neighbors,
                                         neighbor_mask)
        off_bias = self.param("offset_bias", nn.initializers.zeros, (3 * K,))
        offsets = jnp.tanh((off + off_bias) / extent) \
            * (extent * self.offset_scale)
        offsets = offsets.reshape(offsets.shape[:-1] + (K, 3))

        kp = jax.lax.stop_gradient(self.param(
            "kernel_points",
            lambda _: jnp.asarray(kernel_points(K, self.radius))))
        W = self.param("weights", nn.initializers.lecun_normal(),
                       (K, in_dim, self.out_dim))
        nbr_pts = gather_points(s_pts, neighbors)         # (M, K_n, 3)
        rel = nbr_pts - q_pts[..., :, None, :]
        kp_def = kp[None, :, :] + offsets                  # (M, K, 3)
        # same MXU quadratic expansion as KPConv, with per-query kernels
        d2 = (jnp.sum(rel * rel, -1)[..., :, None]
              + jnp.sum(kp_def * kp_def, -1)[..., None, :]
              - 2.0 * jnp.einsum("...nc,...kc->...nk", rel, kp_def,
                                 precision=_PREC))
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))   # eps: see KPConv — NaN-grad guard
        infl = jax.nn.relu(1.0 - d / extent)
        infl = jnp.where(neighbor_mask[..., :, :, None], infl, 0.0)
        nbr_feats = gather_points(feats, neighbors)
        h = jnp.einsum("...nk,...nc->...kc", infl, nbr_feats,
                       precision=_FEAT_PREC)
        return jnp.einsum("...kc,kcd->...d", h, W, precision=_FEAT_PREC)


class BNReLU(nn.Module):
    momentum: float = 0.98

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.momentum)(x)
        return nn.leaky_relu(x, 0.1)


class SimpleBlock(nn.Module):
    """KPConv -> BN -> LeakyReLU at out_dim//2 (blocks.py:150-180)."""
    out_dim: int
    radius: float
    dense: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask,
                 train: bool, s_mask=None, q_mask=None):
        x = KPConv(self.out_dim // 2, self.radius, dense=self.dense)(
            q_pts, s_pts, feats, neighbors, neighbor_mask, s_mask, q_mask)
        return BNReLU()(x, train)


class UnaryBlock(nn.Module):
    out_dim: int
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.out_dim)(x)
        if self.relu:
            x = BNReLU()(x, train)
        else:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.98)(x)
        return x


class ResnetBottleneckBlock(nn.Module):
    """unary down -> KPConv -> unary up + shortcut (blocks.py:183-241).

    When strided, q_pts are the coarser-level points and `neighbors` the
    pooling table; the shortcut max-pools neighbor features. In dense
    mode the pooling table is replaced by the dense-radius kernel +
    chunked dense max-pool at the pool-table cutoff (2x radius).
    """
    out_dim: int
    radius: float
    strided: bool = False
    dense: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask,
                 train: bool, s_mask=None, q_mask=None):
        mid = self.out_dim // 4
        x = UnaryBlock(mid)(feats, train)
        x = KPConv(mid, self.radius, dense=self.dense,
                   cutoff_mul=2.0 if self.strided else 1.0)(
            q_pts, s_pts, x, neighbors, neighbor_mask, s_mask, q_mask)
        x = BNReLU()(x, train)
        x = UnaryBlock(self.out_dim, relu=False)(x, train)
        # shortcut
        if self.strided and self.dense:
            from pointcloudregistration_tpu.ops.kpconv_pallas import (
                dense_maxpool)
            sm = s_mask if s_mask is not None \
                else jnp.ones(s_pts.shape[:-1], bool)
            sc = dense_maxpool(q_pts, s_pts, feats, sm,
                               cutoff=2.0 * self.radius)
            if q_mask is not None:
                # padded queries sit at the origin and would pool real
                # neighbors there; the table path gives them 0 rows
                sc = jnp.where(q_mask[..., None], sc, 0.0)
        elif self.strided:
            sc = gather_points(feats, neighbors)          # (M, K, C)
            sc = jnp.where(neighbor_mask[..., None], sc, -jnp.inf)
            sc = jnp.max(sc, axis=-2)
            sc = jnp.where(jnp.isfinite(sc), sc, 0.0)
        else:
            sc = feats
        if sc.shape[-1] != self.out_dim:
            sc = UnaryBlock(self.out_dim, relu=False)(sc, train)
        return nn.leaky_relu(x + sc, 0.1)


def nearest_upsample(feats_coarse, upsample_idx):
    """Copy each fine point its nearest coarse feature (blocks.py:275-290)."""
    return gather_points(feats_coarse, upsample_idx)
