"""Pallas TPU kernel for bidirectional nearest-neighbor distance (NND).

TPU-native replacement for the reference's CUDA kernel
(dip/torch-nndistance/src/nnd_cuda.cu:8-180 NmDistanceKernel: tiled
shared-memory scan with per-thread running min) and for pytorch3d
`knn_points` K=1 (c2p-net/deformationpyramid/model/loss.py:143-147).

Design:
  * Coordinates are passed TRANSPOSED (3, N): the point axis rides the
    128-lane dimension, so VMEM cost is ~32 B/point instead of the 512 B/point
    a (N, 3) layout would pad to. The whole reference cloud stays resident in
    VMEM (3, M) while query tiles stream through the grid.
  * Cross terms x·yᵀ are a (TN, 3)x(3, TM) contraction on the MXU; the
    running (min, argmin) carry lives in registers across reference tiles —
    the (N, M) distance matrix never exists in HBM.
  * Gradients: the kernel only *finds* indices (argmin is nondifferentiable);
    callers recompute d = |x - y[idx]|² with plain jnp, which autodiffs to
    exactly the scatter-add backward of the reference
    (nnd_cuda.cu:164-180 NmDistanceGradKernel) for free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_SENTINEL = 1e6        # padded points sit far away and never win


def _sqnorm(pT):
    """|p|^2 along the leading 3-axis: (3, K) -> (K,)."""
    return pT[0] * pT[0] + pT[1] * pT[1] + pT[2] * pT[2]


def _cross_mxu(xT, yT):
    """-2 x.y cross terms on the MXU: (3, TN), (3, TM) -> (TN, TM).

    f32-emulated matmul (Precision.HIGHEST — Mosaic's 6-pass bf16 scheme;
    HIGH is not implemented on TPU) keeps the expansion
    |x|^2 - 2x.y + |y|^2 accurate to ~1e-6 absolute for unit-scale clouds:
    only exact near-ties can flip an argmin, which is harmless for
    chamfer/ICP, and callers re-derive distances differentiably from the
    indices anyway (nn_distance below). The MXU does the 6 mul+add per
    element that previously ran on the VPU (the kernel was VPU-bound at
    ~0.47 TFLOP/s); the VPU keeps only adds and the min/argmin reductions.
    """
    return jax.lax.dot_general(
        xT, yT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _nnd_kernel(xT_ref, yT_ref, dist_ref, idx_ref, *, tm: int):
    """One query tile (3, TN) vs the whole reference cloud (3, M)."""
    xT = xT_ref[:]                                     # (3, TN)
    tn = xT.shape[1]
    m = yT_ref.shape[1]
    num_m_tiles = m // tm
    xx = _sqnorm(xT)                                   # (TN,)

    def body(j, carry):
        best_d, best_i = carry
        yT = yT_ref[:, pl.ds(j * tm, tm)]              # (3, TM)
        cross = _cross_mxu(xT, yT)                     # (TN, TM)
        yy = _sqnorm(yT)
        d = (xx[:, None] - 2.0 * cross) + yy[None, :]
        dmin = jnp.min(d, axis=1)
        imin = jnp.argmin(d, axis=1).astype(jnp.int32) + j * tm
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i))

    init = (jnp.full((tn,), _BIG, jnp.float32), jnp.zeros((tn,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_m_tiles, body, init)
    # outputs land as (tn//128, 128) tiles of a (n_tiles, tn//128, 128)
    # array: keeps blocks (8k, 128)-aligned for Mosaic while 1-D f32 blocks
    # trip a T(1024)-vs-T(512) XLA layout mismatch on real hardware
    dist_ref[0] = jnp.maximum(best_d, 0.0).reshape(tn // 128, 128)
    idx_ref[0] = best_i.reshape(tn // 128, 128)


def _pad_T(pT: jax.Array, mult: int) -> jax.Array:
    n = pT.shape[1]
    pad = (-n) % mult
    if pad:
        pT = jnp.pad(pT, ((0, 0), (0, pad)), constant_values=_SENTINEL)
    return pT


@partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def nn_search_T(xT: jax.Array, yT: jax.Array, tn: int = 1024, tm: int = 1024,
                interpret: bool = False):
    """1-NN of transposed clouds: (3, N), (3, M) -> (sqdist (N,), idx (N,)).

    N and M are padded internally to tile multiples; padded reference points
    use a far-away sentinel so they never win.
    """
    assert tn % 1024 == 0, "tn must be a multiple of 1024 (8x128 tiles)"
    n = xT.shape[1]
    xTp = _pad_T(xT.astype(jnp.float32), tn)
    yTp = _pad_T(yT.astype(jnp.float32), tm)
    npad, mpad = xTp.shape[1], yTp.shape[1]
    grid = (npad // tn,)
    dist, idx = pl.pallas_call(
        partial(_nnd_kernel, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad // tn, tn // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((npad // tn, tn // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(xTp, yTp)
    return dist.reshape(-1)[:n], idx.reshape(-1)[:n]


def _bidir_kernel(xT_ref, yT_ref, d1_ref, i1_ref, d2_ref, i2_ref,
                  d2_scr, i2_scr, *, tm: int, n_tiles: int):
    """Fused bidirectional NND: one pass produces BOTH directions.

    Grid iterates x tiles sequentially (TPU grid order); the y-side running
    (min, argmin) lives in VMEM scratch accumulated across grid steps and is
    flushed to the outputs at the last tile. Halves kernel launches and
    reads y once per x tile for both directions.
    """
    i = pl.program_id(0)
    xT = xT_ref[:]                                     # (3, TN)
    tn = xT.shape[1]
    m = yT_ref.shape[1]
    num_m_tiles = m // tm
    xx = _sqnorm(xT)                                   # (TN,)

    @pl.when(i == 0)
    def _init():
        d2_scr[:] = jnp.full((m // 128, 128), _BIG, jnp.float32)
        i2_scr[:] = jnp.zeros((m // 128, 128), jnp.int32)

    def body(j, carry):
        best_d, best_i = carry
        yT = yT_ref[:, pl.ds(j * tm, tm)]              # (3, TM)
        cross = _cross_mxu(xT, yT)                     # (TN, TM)
        yy = _sqnorm(yT)
        d = (xx[:, None] - 2.0 * cross) + yy[None, :]
        # x-side row mins (register carry)
        dmin = jnp.min(d, axis=1)
        imin = jnp.argmin(d, axis=1).astype(jnp.int32) + j * tm
        take = dmin < best_d
        # y-side col mins accumulated into scratch
        cmin = jnp.min(d, axis=0)                      # (TM,)
        cidx = jnp.argmin(d, axis=0).astype(jnp.int32) + i * tn
        prev_d = d2_scr[pl.ds(j * tm // 128, tm // 128)]
        prev_i = i2_scr[pl.ds(j * tm // 128, tm // 128)]
        cmin2 = cmin.reshape(tm // 128, 128)
        cidx2 = cidx.reshape(tm // 128, 128)
        ctake = cmin2 < prev_d
        d2_scr[pl.ds(j * tm // 128, tm // 128)] = jnp.where(ctake, cmin2,
                                                            prev_d)
        i2_scr[pl.ds(j * tm // 128, tm // 128)] = jnp.where(ctake, cidx2,
                                                            prev_i)
        return (jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i))

    init = (jnp.full((tn,), _BIG, jnp.float32), jnp.zeros((tn,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_m_tiles, body, init)
    d1_ref[0] = jnp.maximum(best_d, 0.0).reshape(tn // 128, 128)
    i1_ref[0] = best_i.reshape(tn // 128, 128)

    @pl.when(i == n_tiles - 1)
    def _flush():
        d2_ref[:] = jnp.maximum(d2_scr[:], 0.0)
        i2_ref[:] = i2_scr[:]


@partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def nn_distance_T(xT: jax.Array, yT: jax.Array, tn: int = 1024,
                  tm: int = 1024, interpret: bool = False):
    """Bidirectional 1-NN of transposed clouds in ONE kernel call.

    (3, N), (3, M) -> (d1 (N,), i1 (N,), d2 (M,), i2 (M,)).
    """
    assert tn % 1024 == 0, "tn must be a multiple of 1024 (8x128 tiles)"
    n, m = xT.shape[1], yT.shape[1]
    xTp = _pad_T(xT.astype(jnp.float32), tn)
    yTp = _pad_T(yT.astype(jnp.float32), tm)
    npad, mpad = xTp.shape[1], yTp.shape[1]
    n_tiles = npad // tn
    d1, i1, d2, i2 = pl.pallas_call(
        partial(_bidir_kernel, tm=tm, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mpad // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mpad // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tn // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tn // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((mpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((mpad // 128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mpad // 128, 128), jnp.float32),
            pltpu.VMEM((mpad // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(xTp, yTp)
    return (d1.reshape(-1)[:n], i1.reshape(-1)[:n],
            d2.reshape(-1)[:m], i2.reshape(-1)[:m])


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def nn_search(x: jax.Array, y: jax.Array, tn: int = 1024, tm: int = 1024):
    """1-NN: (N, 3) or (B, N, 3) against (M, 3)/(B, M, 3) -> (sqdist, idx)."""
    interp = _use_interpret()
    f = partial(nn_search_T, tn=tn, tm=tm, interpret=interp)
    if x.ndim == 2:
        return f(x.T, y.T)
    return jax.vmap(lambda a, b: f(a.T, b.T))(x, y)


def nn_distance(x: jax.Array, y: jax.Array, tn: int = 1024, tm: int = 1024):
    """Bidirectional NND with differentiable distances.

    Returns (d1, i1, d2, i2) like the reference CUDA op
    (dip/torch-nndistance/torch_nndistance/__init__.py:10-61): d1/i1 are
    per-x nearest squared distance/index into y; d2/i2 the reverse.
    Distances are recomputed from gathered pairs so grads flow to x and y.
    """
    # sever autodiff at the kernel boundary: the kernel only finds indices
    # (pallas_call has no AD rule); distances below re-derive differentiably
    xs, ys = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)
    interp = _use_interpret()
    f = partial(nn_distance_T, tn=tn, tm=tm, interpret=interp)
    if x.ndim == 2:
        _, i1, _, i2 = f(xs.T, ys.T)
    else:
        _, i1, _, i2 = jax.vmap(lambda a, b: f(a.T, b.T))(xs, ys)
    y_near = jnp.take_along_axis(y, i1[..., None], axis=-2)
    x_near = jnp.take_along_axis(x, i2[..., None], axis=-2)
    d1 = jnp.sum((x - y_near) ** 2, -1)
    d2 = jnp.sum((y - x_near) ** 2, -1)
    return d1, i1, d2, i2


def chamfer(x: jax.Array, y: jax.Array, sqrt: bool = False):
    """Symmetric Chamfer on the Pallas path (differentiable)."""
    d1, _, d2, _ = nn_distance(x, y)
    if sqrt:
        d1, d2 = jnp.sqrt(jnp.maximum(d1, 1e-12)), jnp.sqrt(jnp.maximum(d2, 1e-12))
    return jnp.mean(d1, -1) + jnp.mean(d2, -1)


def truncated_chamfer(x: jax.Array, y: jax.Array, trunc: float,
                      x_mask: jax.Array | None = None,
                      y_mask: jax.Array | None = None):
    """Truncated symmetric Chamfer (NDP data term) on the Pallas path.

    Masks supported by displacing masked points to the far sentinel before
    the kernel (they never win a search) and excluding them from the means.
    (reference semantics: deformationpyramid/model/loss.py:60-218)
    """
    xs = x if x_mask is None else jnp.where(x_mask[..., None], x, _SENTINEL)
    ys = y if y_mask is None else jnp.where(y_mask[..., None], y, _SENTINEL)
    d1, _, d2, _ = nn_distance(xs, ys)
    k1 = d1 < trunc
    k2 = d2 < trunc
    if x_mask is not None:
        k1 = k1 & x_mask
    if y_mask is not None:
        k2 = k2 & y_mask
    c1 = jnp.sum(jnp.where(k1, d1, 0.0), -1) / jnp.maximum(jnp.sum(k1, -1), 1)
    c2 = jnp.sum(jnp.where(k2, d2, 0.0), -1) / jnp.maximum(jnp.sum(k2, -1), 1)
    return c1 + c2
