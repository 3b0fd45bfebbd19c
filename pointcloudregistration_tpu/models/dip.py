"""DIP rotation-invariant local descriptor network (PointNet + TNet), flax.

Capability parity with dip/network.py:5-119: STN3d regresses a 3x3 patch
alignment; the PointNet encoder (1x1 convs 128/256 with dropout 0.5 + BN,
global max-pool, FC head) emits an L2-normalized descriptor plus the
bottleneck max values `mx` and argmax `amx` used for quality gating
(dip/demo.py:149-156 drops the bottom 5% by ||mx||).

TPU-first shifts: channels-last layout (1x1 convs become feature matmuls on
the MXU), BatchNorm carried as explicit flax mutable state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLPBlock(nn.Module):
    """Conv1d(1x1)+Dropout+BN+ReLU of the reference, channels-last."""
    features: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9, axis_name=None)(x)
        return nn.relu(x)


class STN3d(nn.Module):
    """TNet: (B, P, 3) points -> (B, 3, 3) alignment (dip/network.py:5-47)."""

    @nn.compact
    def __call__(self, x, train: bool):
        h = MLPBlock(128)(x, train)          # 64*2
        h = MLPBlock(256)(h, train)          # 128*2
        h = jnp.max(h, axis=-2)              # global max-pool over points
        h = MLPBlock(128)(h, train)          # fc1 64*2
        out = nn.Dense(9, kernel_init=nn.initializers.zeros)(h)
        iden = jnp.eye(3, dtype=x.dtype).reshape(9)
        return (out + iden).reshape(x.shape[:-2] + (3, 3))


class PointNetFeature(nn.Module):
    """(B, P, 3) patches -> (descriptor (B, dim), xtrans, trans, mx, amx)."""
    dim: int = 64
    l2norm: bool = True
    use_tnet: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_tnet:
            trans = STN3d()(x, train)
            xtrans = jnp.einsum("...ij,...pj->...pi", trans, x,
                                precision=jax.lax.Precision.HIGHEST)
        else:
            trans = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype),
                                     x.shape[:-2] + (3, 3))
            xtrans = x
        h = MLPBlock(128)(xtrans, train)
        h = MLPBlock(256)(h, train)
        mx = jnp.max(h, axis=-2)             # (B, 256) bottleneck max
        amx = jnp.argmax(h, axis=-2)         # (B, 256) argmax point indices
        h = MLPBlock(128)(mx, train)
        out = nn.Dense(self.dim)(h)
        if self.l2norm:
            out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
        return out, xtrans, trans, mx, amx
