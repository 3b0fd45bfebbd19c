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


def kernel_points(num_points: int = 15, radius: float = 1.0) -> np.ndarray:
    """Deterministic kernel disposition: center + Fibonacci sphere shell.

    (reference: kernel_points.py:66-470 Lloyd-optimized dispositions cached
    as kernels/k_015_center.ply — 'center' fixed mode.)
    """
    n_shell = num_points - 1
    i = np.arange(n_shell)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - 2.0 * (i + 0.5) / n_shell
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    pts = np.stack([np.cos(phi * i) * r, y, np.sin(phi * i) * r], -1)
    # shell at ~0.7 radius like KPConv's optimized layouts
    pts = pts * (0.66 * radius)
    return np.concatenate([np.zeros((1, 3)), pts], 0).astype(np.float32)


class KPConv(nn.Module):
    """One kernel-point convolution (blocks.py:44-128).

    q_pts (M, 3) query positions, s_pts (N, 3) support positions,
    feats (N, Cin), neighbors (M, K) int32 + mask (M, K).
    """
    out_dim: int
    radius: float              # conv radius (sets KP extent scaling)
    num_kernel_points: int = 15
    kp_extent_ratio: float = 2.0 / 2.5   # KP_extent/conv_radius (MRI.yaml)

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask):
        K = self.num_kernel_points
        in_dim = feats.shape[-1]
        kp = self.param(
            "kernel_points",
            lambda _: jnp.asarray(kernel_points(K, self.radius)))
        kp = jax.lax.stop_gradient(kp)          # fixed disposition
        W = self.param("weights", nn.initializers.lecun_normal(),
                       (K, in_dim, self.out_dim))
        nbr_pts = gather_points(s_pts, neighbors)        # (M, K_n, 3)
        rel = nbr_pts - q_pts[..., :, None, :]           # (M, K_n, 3)
        # linear influence of each kernel point on each neighbor
        extent = self.radius * self.kp_extent_ratio
        d = jnp.linalg.norm(rel[..., :, :, None, :] - kp[None, None, :, :],
                            axis=-1)                     # (M, K_n, K)
        infl = jax.nn.relu(1.0 - d / extent)
        infl = jnp.where(neighbor_mask[..., :, :, None], infl, 0.0)
        nbr_feats = gather_points(feats, neighbors)      # (M, K_n, Cin)
        # sum aggregation: per kernel point, influence-weighted neighbor sum
        h = jnp.einsum("...nk,...nc->...kc", infl, nbr_feats,
                       precision=_PREC)                  # (M, K, Cin)
        out = jnp.einsum("...kc,kcd->...d", h, W, precision=_PREC)
        return out


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

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask,
                 train: bool):
        x = KPConv(self.out_dim // 2, self.radius)(
            q_pts, s_pts, feats, neighbors, neighbor_mask)
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
    pooling table; the shortcut max-pools neighbor features.
    """
    out_dim: int
    radius: float
    strided: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, neighbors, neighbor_mask,
                 train: bool):
        mid = self.out_dim // 4
        x = UnaryBlock(mid)(feats, train)
        x = KPConv(mid, self.radius)(q_pts, s_pts, x, neighbors,
                                     neighbor_mask)
        x = BNReLU()(x, train)
        x = UnaryBlock(self.out_dim, relu=False)(x, train)
        # shortcut
        if self.strided:
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
