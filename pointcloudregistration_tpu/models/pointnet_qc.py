"""PointNet quality-control classifier (TOF vs PC), flax.

Parity with DataPreparation/Pointnet.py:69-226 — the reference's only
TensorFlow/Keras component: a PointNet with two T-Nets (3x3 and 32x32
feature transform), conv-bn stacks 32/32/32/64/512, global max-pool, dense
256/128 with dropout, 2-class softmax. Used to reject augmented samples the
classifier can't confidently attribute to their modality
(DataPreparation/run.py:233-243).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

_PREC = jax.lax.Precision.HIGHEST


class _ConvBN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class TNet(nn.Module):
    """Orthogonal-ish K x K transform regressor (Pointnet.py:106-127)."""
    k: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = _ConvBN(32)(x, train)
        h = _ConvBN(64)(h, train)
        h = _ConvBN(512)(h, train)
        h = jnp.max(h, axis=-2)
        h = _ConvBN(256)(h, train)
        h = _ConvBN(128)(h, train)
        out = nn.Dense(self.k * self.k,
                       kernel_init=nn.initializers.zeros)(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (out + eye).reshape(x.shape[:-2] + (self.k, self.k))


class PointNetQC(nn.Module):
    """(B, N, 3) -> (B, 2) logits (TOF vs PC)."""
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        t_in = TNet(3)(x, train)
        x = jnp.einsum("...ij,...nj->...ni", t_in, x, precision=_PREC)
        x = _ConvBN(32)(x, train)
        x = _ConvBN(32)(x, train)
        t_feat = TNet(32)(x, train)
        x = jnp.einsum("...ij,...nj->...ni", t_feat, x, precision=_PREC)
        x = _ConvBN(32)(x, train)
        x = _ConvBN(64)(x, train)
        x = _ConvBN(512)(x, train)
        x = jnp.max(x, axis=-2)
        x = _ConvBN(256)(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = _ConvBN(128)(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
