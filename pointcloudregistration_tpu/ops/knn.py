"""Nearest-neighbor search and Chamfer distances (jax.numpy reference path).

Replaces the reference's native NN stack — dip/torch-nndistance (CUDA NND
kernel, my_lib.cpp:3-96 / nnd_cuda.cu:8-180), pytorch3d `knn_points`
(deformationpyramid/model/loss.py:143-147), and Open3D KD-tree queries — with
blocked dense search: for point counts up to ~100k, a tiled O(N·M) scan on the
MXU/VPU beats tree traversal on TPU by orders of magnitude, and it is exactly
differentiable.

The hot single-NN path has a Pallas twin in ops/nnd_pallas.py; this module is
the semantics reference (golden-tested against it) and provides general K.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core.geometry import square_dists

_BIG = 1e10


def _blocked_min(query: jax.Array, ref: jax.Array, ref_mask, block: int,
                 precision=jax.lax.Precision.HIGHEST):
    """Per-query (min_sqdist, argmin) over ref, scanning ref in blocks."""
    M = ref.shape[-2]
    nblocks = max(1, -(-M // block))
    pad = nblocks * block - M
    refp = jnp.concatenate(
        [ref, jnp.full(ref.shape[:-2] + (pad, ref.shape[-1]), 1e6,
                       ref.dtype)], -2) if pad else ref
    maskp = None
    if ref_mask is not None:
        maskp = jnp.concatenate(
            [ref_mask, jnp.zeros(ref_mask.shape[:-1] + (pad,), bool)], -1) \
            if pad else ref_mask

    def body(carry, j):
        best_d, best_i = carry
        rb = jax.lax.dynamic_slice_in_dim(refp, j * block, block, axis=-2)
        d = square_dists(query, rb, precision)            # (..., N, block)
        if maskp is not None:
            mb = jax.lax.dynamic_slice_in_dim(maskp, j * block, block, axis=-1)
            d = jnp.where(mb[..., None, :], d, _BIG)
        dmin = jnp.min(d, -1)
        imin = jnp.argmin(d, -1) + j * block
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, imin, best_i)), None

    init = (jnp.full(query.shape[:-1], _BIG, query.dtype),
            jnp.zeros(query.shape[:-1], jnp.int32))
    (d, i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return d, i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("block", "precision"))
def nn_search(query: jax.Array, ref: jax.Array,
              query_mask: jax.Array | None = None,
              ref_mask: jax.Array | None = None,
              block: int = 2048,
              precision=jax.lax.Precision.HIGHEST):
    """1-NN: (..., N, 3), (..., M, 3) -> (sqdist (..., N), idx (..., N)).

    Masked (padded) ref points never win; masked query rows get dist 0/idx 0.
    (reference semantics: dip/torch-nndistance/src/my_lib.cpp:3-27 nnsearch)
    """
    d, i = _blocked_min(query, ref, ref_mask, block, precision)
    if query_mask is not None:
        d = jnp.where(query_mask, d, 0.0)
        i = jnp.where(query_mask, i, 0)
    return d, i


def nn_distance(x: jax.Array, y: jax.Array,
                x_mask=None, y_mask=None, block: int = 2048):
    """Bidirectional NN squared distances — the reference's "NND" primitive.

    Returns (dist1 (...,N), idx1, dist2 (...,M), idx2), matching
    dip/torch-nndistance (my_lib.cpp:28-63 forward). Differentiable through
    jnp (gather + square), no custom VJP needed at this layer.
    """
    d1, i1 = nn_search(x, y, x_mask, y_mask, block)
    d2, i2 = nn_search(y, x, y_mask, x_mask, block)
    return d1, i1, d2, i2


def chamfer(x: jax.Array, y: jax.Array, x_mask=None, y_mask=None,
            block: int = 2048, sqrt: bool = False):
    """Symmetric Chamfer distance (mean of both directions).

    (reference: pytorch3d chamfer_distance as used in dip/train.py:84;
    DataPreparation/QualityCheck.py:25-31 uses the sqrt variant)
    """
    d1, _, d2, _ = nn_distance(x, y, x_mask, y_mask, block)
    if sqrt:
        d1, d2 = jnp.sqrt(d1), jnp.sqrt(d2)
    n1 = (jnp.sum(x_mask, -1) if x_mask is not None
          else jnp.asarray(x.shape[-2], x.dtype))
    n2 = (jnp.sum(y_mask, -1) if y_mask is not None
          else jnp.asarray(y.shape[-2], y.dtype))
    m1 = jnp.sum(d1, -1) / jnp.maximum(n1, 1)
    m2 = jnp.sum(d2, -1) / jnp.maximum(n2, 1)
    return m1 + m2


def truncated_chamfer(x: jax.Array, y: jax.Array, trunc: float,
                      x_mask=None, y_mask=None, block: int = 2048):
    """Truncated symmetric Chamfer: per-point sqdists above `trunc` dropped.

    Matches NDP's data term (c2p-net/deformationpyramid/model/loss.py:60-218
    compute_truncated_chamfer_distance: knn K=1 both ways, mask d < trunc,
    mean of kept terms per direction, summed).
    """
    d1, _, d2, _ = nn_distance(x, y, x_mask, y_mask, block)
    k1 = d1 < trunc
    k2 = d2 < trunc
    if x_mask is not None:
        k1 = k1 & x_mask
    if y_mask is not None:
        k2 = k2 & y_mask
    c1 = jnp.sum(jnp.where(k1, d1, 0.0), -1) / jnp.maximum(jnp.sum(k1, -1), 1)
    c2 = jnp.sum(jnp.where(k2, d2, 0.0), -1) / jnp.maximum(jnp.sum(k2, -1), 1)
    return c1 + c2


@partial(jax.jit, static_argnames=("k", "block", "approx", "precision"))
def knn(query: jax.Array, ref: jax.Array, k: int,
        query_mask=None, ref_mask=None, block: int = 4096,
        approx: bool = False,
        precision=jax.lax.Precision.HIGHEST):
    """K nearest neighbors: returns (sqdists (..., N, k), idx (..., N, k)).

    Blocked merge: scan ref blocks, keep a running top-k via lax.top_k on the
    concatenation of the carry and the new block's candidates. Peak live
    buffer is (..., N, k + block), never (..., N, M).

    approx=True uses the TPU-native `lax.approx_max_k` (recall ~0.95 per
    query) — considerably faster than exact top-k for neighborhood features
    (FPFH/LRF/normals) where a stray 33rd-nearest neighbor is harmless.
    Exact by default; golden tests cover the exact path.
    """
    M = ref.shape[-2]
    if M <= block:
        d = square_dists(query, ref, precision)
        if ref_mask is not None:
            d = jnp.where(ref_mask[..., None, :], d, _BIG)
        if approx:
            negd, idx = jax.lax.approx_max_k(-d, k)
        else:
            negd, idx = jax.lax.top_k(-d, k)
        return -negd, idx.astype(jnp.int32)

    nblocks = -(-M // block)
    pad = nblocks * block - M
    refp = jnp.concatenate(
        [ref, jnp.full(ref.shape[:-2] + (pad, ref.shape[-1]), 1e6,
                       ref.dtype)], -2) if pad else ref
    maskp = ref_mask
    if pad and ref_mask is not None:
        maskp = jnp.concatenate(
            [ref_mask, jnp.zeros(ref_mask.shape[:-1] + (pad,), bool)], -1)

    def body(carry, j):
        best_d, best_i = carry                       # (..., N, k)
        rb = jax.lax.dynamic_slice_in_dim(refp, j * block, block, axis=-2)
        d = square_dists(query, rb, precision)
        if maskp is not None:
            mb = jax.lax.dynamic_slice_in_dim(maskp, j * block, block, axis=-1)
            d = jnp.where(mb[..., None, :], d, _BIG)
        iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1) + j * block
        cat_d = jnp.concatenate([best_d, d], -1)
        cat_i = jnp.concatenate([best_i, iota], -1)
        if approx:
            negd, pos = jax.lax.approx_max_k(-cat_d, k)
        else:
            negd, pos = jax.lax.top_k(-cat_d, k)
        return (-negd, jnp.take_along_axis(cat_i, pos, -1)), None

    init = (jnp.full(query.shape[:-1] + (k,), _BIG, query.dtype),
            jnp.zeros(query.shape[:-1] + (k,), jnp.int32))
    (d, i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return d, i
