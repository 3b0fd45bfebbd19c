"""Farthest point sampling — sequential by nature, expressed as a fori_loop.

Replaces torch_cluster.fps (dip/preprocess_lrf.py usage) and the reference's
Python-loop FPS (ROPNet/src/models/model_utils.py:6-24). The carry is the
running min-distance-to-selected-set field; each step is one masked argmax,
O(N) per sample on the VPU, compiled to a single program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


@partial(jax.jit, static_argnames=("n_samples",))
def fps(points: jax.Array, n_samples: int, mask: jax.Array | None = None,
        start_idx: int = 0) -> jax.Array:
    """(..., N, 3) -> (..., n_samples) int32 sample indices.

    Deterministic (starts at `start_idx`, the reference uses random start —
    pass a randomly-chosen start index for that behavior). Masked points are
    never selected.
    """
    N = points.shape[-2]
    batch = points.shape[:-2]
    if mask is None:
        mask = jnp.ones(batch + (N,), bool)

    def body(i, carry):
        mind, sel, last = carry
        p_last = jnp.take_along_axis(points, last[..., None, None].repeat(3, -1),
                                     axis=-2)[..., 0, :]
        d = jnp.sum((points - p_last[..., None, :]) ** 2, -1)
        mind = jnp.minimum(mind, d)
        score = jnp.where(mask, mind, -_BIG)
        nxt = jnp.argmax(score, -1).astype(jnp.int32)
        sel = jax.lax.dynamic_update_index_in_dim(sel, nxt, i, axis=-1)
        return mind, sel, nxt

    first = jnp.full(batch, start_idx, jnp.int32)
    sel0 = jnp.zeros(batch + (n_samples,), jnp.int32)
    sel0 = jax.lax.dynamic_update_index_in_dim(sel0, first, 0, axis=-1)
    init = (jnp.full(batch + (N,), _BIG, points.dtype), sel0, first)
    _, sel, _ = jax.lax.fori_loop(1, n_samples, body, init)
    return sel
