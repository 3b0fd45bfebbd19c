"""Hardest-contrastive descriptor loss (FCGF-style).

Parity with dip/losses.py:7-38: positive margin 0.1, negative margin 1.4;
positives are row-aligned descriptor pairs, the hardest negative is the
row/column min of the full (N, N) descriptor-distance matrix with the
diagonal masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e9


def hardest_contrastive(fxd: jax.Array, fxm: jax.Array,
                        pos_margin: float = 0.1,
                        neg_margin: float = 1.4):
    """fxd, fxm (N, D) corresponding descriptor batches -> (loss, aux)."""
    n = fxd.shape[0]
    diff = fxd[:, None, :] - fxm[None, :, :]
    fdists = jnp.linalg.norm(diff, axis=-1) + _BIG * jnp.eye(n, dtype=fxd.dtype)
    fdm_mins = jnp.min(fdists, axis=1)       # hardest negative per row
    fmd_mins = jnp.min(fdists, axis=0)       # hardest negative per col
    fdists_pos = jnp.linalg.norm(fxd - fxm, axis=-1)
    a = jnp.mean(jax.nn.relu(fdists_pos - pos_margin) ** 2)
    b = jnp.mean(jax.nn.relu(neg_margin - fdm_mins) ** 2)
    c = jnp.mean(jax.nn.relu(neg_margin - fmd_mins) ** 2)
    loss = a + (b + c) / 2.0
    return loss, {"pos_dists": fdists_pos, "hardest_neg_row": fdm_mins,
                  "hardest_neg_col": fmd_mins}
