"""Dense-radius kernel-point convolution as a fused Pallas TPU kernel.

The reference KPConv (c2p-net/ngenet/models/KPConv/blocks.py:73-128)
gathers per-query neighbor features through precomputed radius-kNN tables
and aggregates them with linear kernel-point influences. On TPU that
gather is the bottleneck: the (M, K_n, C) neighbor gathers ride the
scalar path and the tiny (K_n x 15) matmuls never fill the MXU
(PERF.md r04 — NgeNet forward 13.3 ms/pair, gather-bound).

This kernel removes the tables entirely — the NND/FPFH treatment:

  * the (TM, N) squared-distance tile is one MXU matmul plus rank-1
    terms, never leaving VMEM;
  * the kernel-point influence tile for each of the K kernel points is
    assembled in-register via the quadratic expansion
    |rel - kp_k|^2 = d2 - 2(s.kp_k - q.kp_k) + |kp_k|^2, with the
    s.kp/q.kp biases precomputed outside as (K, N)/(M, K) matmuls;
  * the aggregation  out += (infl_k @ feats) @ W_k  is two MXU dots per
    kernel point over VMEM-resident support features.

Semantics: identical to the gather path with an *uncapped* neighbor
table at the same cutoff radius (the K_n cap kept only the nearest
80th-percentile neighbors; dense radius semantics are the Open3D-style
contract the fused FPFH kernel already proved both faster and more
accurate). Masked support points never contribute (adjacency mask) and
masked queries output exactly 0 (parity with the all-False neighbor-mask
rows of the table path, which BatchNorm statistics see).

The custom VJP recomputes influences tile-by-tile in the backward
(rematerialization — the (M, N, K) influence tensor is never stored) and
returns zero cotangents for positions/masks/kernel dispositions: the
layer's trainable inputs are `feats` and `W` only (kernel points are
stop-gradiented in the rigid KPConv modules; position gradients have no
consumer since pyramid coordinates are data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST
_HIGH = jax.lax.Precision.HIGH
_TM = 256                      # query tile (sublane-aligned)
_TM_BWD = 128                  # backward holds g/df/dw too: smaller tile
                               # keeps the scoped VMEM under the 16M limit


def _d2_tile(q, s_t):
    """(TM, N) squared distances by exact coordinate differences.

    The |q|^2+|s|^2-2q.s expansion loses ~1e-6 absolute to cancellation
    for nearby points; sqrt of that noise at d~0 costs ~4e-3 of influence
    on the self/center-kernel-point term. Outer differences are exact
    (subtract-then-square), cost 9 VPU ops/element, and make the
    self-term identically zero. q (TM, 3); s_t (3, N) lane-major."""
    d2 = jnp.zeros((q.shape[0], s_t.shape[1]), jnp.float32)
    for c in range(3):
        diff = q[:, c:c + 1] - s_t[c:c + 1, :]
        d2 += diff * diff
    return d2


def _influence(d2, sbias_row, qbias_col, adj, inv_extent):
    """relu(1 - |rel - kp_k| / extent) * adjacency for one kernel point."""
    d2k = d2 + sbias_row + qbias_col
    d = jnp.sqrt(jnp.maximum(d2k, 1e-12))    # eps: NaN-grad guard
    return jnp.maximum(1.0 - d * inv_extent, 0.0) * adj


def _fwd_kernel(q_ref, st_ref, f_ref, sm_ref, qm_ref, sb_ref, qb_ref, w_ref,
                o_ref, *, cutoff, extent, n_kp, bf16):
    q = q_ref[:]                               # (TM, 3)
    d2 = _d2_tile(q, st_ref[:])                # s_t (3, N)
    adj = jnp.where(d2 <= cutoff * cutoff, sm_ref[:], 0.0)   # (TM, N)
    inv_extent = 1.0 / extent
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    # feature dots: bf16 operands / f32 accumulation (1 MXU pass) by
    # default — geometry (d2, influences) stays f32. HIGHEST (6-pass
    # f32 emulation) is the bf16=False fallback used by the golden test.
    fdt = jnp.bfloat16 if bf16 else jnp.float32
    fprec = None if bf16 else _HIGHEST
    f = f_ref[:].astype(fdt)
    for k in range(n_kp):
        infl = _influence(d2, sb_ref[k:k + 1, :], qb_ref[:, k:k + 1], adj,
                          inv_extent)
        t = jax.lax.dot_general(infl.astype(fdt), f,
                                (((1,), (0,)), ((), ())),
                                precision=fprec,
                                preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(t.astype(fdt), w_ref[k].astype(fdt),
                                   (((1,), (0,)), ((), ())),
                                   precision=fprec,
                                   preferred_element_type=jnp.float32)
    o_ref[:] = acc * qm_ref[:]


def _bwd_kernel(q_ref, st_ref, f_ref, sm_ref, qm_ref, sb_ref, qb_ref, w_ref,
                g_ref, df_ref, dw_ref, *, cutoff, extent, n_kp, bf16):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        df_ref[:] = jnp.zeros_like(df_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    q = q_ref[:]
    d2 = _d2_tile(q, st_ref[:])
    adj = jnp.where(d2 <= cutoff * cutoff, sm_ref[:], 0.0)
    inv_extent = 1.0 / extent
    fdt = jnp.bfloat16 if bf16 else jnp.float32
    fprec = None if bf16 else _HIGHEST
    g = (g_ref[:] * qm_ref[:]).astype(fdt)     # (TM, Cout)
    f = f_ref[:].astype(fdt)
    for k in range(n_kp):
        infl = _influence(d2, sb_ref[k:k + 1, :], qb_ref[:, k:k + 1], adj,
                          inv_extent).astype(fdt)
        # dh_k = g @ W_k^T  (TM, C); dfeats += infl^T @ dh_k  (N, C)
        dh = jax.lax.dot_general(g, w_ref[k].astype(fdt),
                                 (((1,), (1,)), ((), ())),
                                 precision=fprec,
                                 preferred_element_type=jnp.float32)
        df_ref[:] += jax.lax.dot_general(infl, dh.astype(fdt),
                                         (((0,), (0,)), ((), ())),
                                         precision=fprec,
                                         preferred_element_type=jnp.float32)
        # dW_k += t_k^T @ g  (C, Cout)
        t = jax.lax.dot_general(infl, f, (((1,), (0,)), ((), ())),
                                precision=fprec,
                                preferred_element_type=jnp.float32)
        dw_ref[k] += jax.lax.dot_general(t.astype(fdt), g,
                                         (((0,), (0,)), ((), ())),
                                         precision=fprec,
                                         preferred_element_type=jnp.float32)


def _biases(q_pts, s_pts, kp):
    """Quadratic-expansion bias terms: sbias (K, N), qbias (M, K)."""
    sk = jnp.einsum("nc,kc->kn", s_pts, kp, precision=_HIGHEST)
    qk = jnp.einsum("mc,kc->mk", q_pts, kp, precision=_HIGHEST)
    kk = jnp.sum(kp * kp, -1)
    return kk[:, None] - 2.0 * sk, 2.0 * qk


def _pallas_fwd(q_pts, s_pts, feats, s_mask, q_mask, kp, W, cutoff, extent,
                bf16):
    M = q_pts.shape[0]
    N, C = feats.shape
    K, _, Cout = W.shape
    bf16 = bf16 and C >= 8          # C=1 (first SimpleBlock) trips Mosaic's
                                    # mixed-dtype lowering; trivial FLOPs
    sbias, qbias = _biases(q_pts, s_pts, kp)
    tm = min(_TM, M)
    grid = pl.cdiv(M, tm)
    return pl.pallas_call(
        partial(_fwd_kernel, cutoff=cutoff, extent=extent, n_kp=K,
                bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * (N * C + C * Cout) + 9 * M * N,
            bytes_accessed=4 * (M * 3 + N * 3 + N * C + K * C * Cout
                                + M * Cout),
            transcendentals=K * M * N,
        ),
    )(q_pts, s_pts.T, feats, s_mask[None, :].astype(jnp.float32),
      q_mask[:, None].astype(jnp.float32), sbias, qbias, W)


def _pallas_bwd(q_pts, s_pts, feats, s_mask, q_mask, kp, W, cutoff, extent,
                bf16, g):
    M = q_pts.shape[0]
    N, C = feats.shape
    K, _, Cout = W.shape
    bf16 = bf16 and C >= 8          # see _pallas_fwd
    sbias, qbias = _biases(q_pts, s_pts, kp)
    tm = min(_TM_BWD, M)
    grid = pl.cdiv(M, tm)
    return pl.pallas_call(
        partial(_bwd_kernel, cutoff=cutoff, extent=extent, n_kp=K,
                bf16=bf16),
        out_shape=(jax.ShapeDtypeStruct((N, C), jnp.float32),
                   jax.ShapeDtypeStruct((K, C, Cout), jnp.float32)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(q_pts, s_pts.T, feats, s_mask[None, :].astype(jnp.float32),
      q_mask[:, None].astype(jnp.float32), sbias, qbias, W, g)


def _ref_conv(q_pts, s_pts, feats, s_mask, q_mask, kp, W, cutoff, extent):
    """Pure-jnp dense KPConv — the CPU/test fallback, autodiff-friendly."""
    d2 = jnp.sum((q_pts[:, None, :] - s_pts[None, :, :]) ** 2, -1)
    adj = jnp.where(d2 <= cutoff * cutoff,
                    s_mask[None, :].astype(feats.dtype), 0.0)
    sbias, qbias = _biases(q_pts, s_pts, kp)
    out = jnp.zeros((q_pts.shape[0], W.shape[-1]), feats.dtype)
    for k in range(W.shape[0]):
        d2k = d2 + sbias[k][None, :] + qbias[:, k][:, None]
        infl = jnp.maximum(
            1.0 - jnp.sqrt(jnp.maximum(d2k, 1e-12)) / extent, 0.0) * adj
        t = jnp.einsum("mn,nc->mc", infl, feats, precision=_HIGH)
        out = out + jnp.einsum("mc,cd->md", t, W[k], precision=_HIGH)
    return out * q_mask[:, None].astype(feats.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _kpconv_dense_tpu(cutoff, extent, bf16, q_pts, s_pts, feats, s_mask,
                      q_mask, kp, W):
    return _pallas_fwd(q_pts, s_pts, feats, s_mask, q_mask, kp, W,
                       cutoff, extent, bf16)


def _kpconv_fwd(cutoff, extent, bf16, q_pts, s_pts, feats, s_mask, q_mask,
                kp, W):
    out = _pallas_fwd(q_pts, s_pts, feats, s_mask, q_mask, kp, W,
                      cutoff, extent, bf16)
    return out, (q_pts, s_pts, feats, s_mask, q_mask, kp, W)


def _kpconv_bwd(cutoff, extent, bf16, res, g):
    q_pts, s_pts, feats, s_mask, q_mask, kp, W = res
    df, dw = _pallas_bwd(q_pts, s_pts, feats, s_mask, q_mask, kp, W,
                         cutoff, extent, bf16, g)
    zeros = lambda x: jnp.zeros_like(x)
    return (zeros(q_pts), zeros(s_pts), df, zeros(s_mask), zeros(q_mask),
            zeros(kp), dw)


_kpconv_dense_tpu.defvjp(_kpconv_fwd, _kpconv_bwd)


def kpconv_dense(q_pts: jax.Array, s_pts: jax.Array, feats: jax.Array,
                 s_mask: jax.Array, q_mask: jax.Array, kp: jax.Array,
                 W: jax.Array, *, cutoff: float, extent: float,
                 bf16: bool = True) -> jax.Array:
    """Dense-radius KPConv: out (M, Cout) from support feats (N, C).

    q_pts (M, 3), s_pts (N, 3), s_mask/q_mask bool, kp (K, 3) kernel
    dispositions, W (K, C, Cout). `cutoff` is the adjacency radius (the
    neighbor-table radius of the gather path), `extent` the influence
    extent. TPU: fused Pallas kernel with custom VJP; elsewhere: the jnp
    reference (full autodiff).
    """
    if jax.default_backend() == "tpu":
        return _kpconv_dense_tpu(float(cutoff), float(extent), bool(bf16),
                                 q_pts, s_pts, feats, s_mask, q_mask, kp, W)
    return _ref_conv(q_pts, s_pts, feats, s_mask, q_mask, kp, W,
                     float(cutoff), float(extent))


def _maxpool_chunks(q_pts, s_pts, feats, s_mask, cutoff, chunk):
    """(adj_c (n_chunks, M, chunk), f_c (n_chunks, chunk, C))."""
    M = q_pts.shape[0]
    N, C = feats.shape
    d2 = jnp.sum((q_pts[:, None, :] - s_pts[None, :, :]) ** 2, -1)
    adj = (d2 <= cutoff * cutoff) & s_mask[None, :]
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    adj_p = jnp.pad(adj, ((0, 0), (0, pad)))
    f_p = jnp.pad(feats, ((0, pad), (0, 0)))
    return (adj_p.reshape(M, n_chunks, chunk).transpose(1, 0, 2),
            f_p.reshape(n_chunks, chunk, C))


def _maxpool_raw(cutoff, chunk, q_pts, s_pts, feats, s_mask):
    """Chunked masked max; -inf rows mean 'no neighbor'."""
    adj_c, f_c = _maxpool_chunks(q_pts, s_pts, feats, s_mask, cutoff, chunk)

    def body(acc, xs):
        a, f = xs                       # (M, chunk), (chunk, C)
        cand = jnp.max(jnp.where(a[:, :, None], f[None, :, :], -jnp.inf),
                       axis=1)
        return jnp.maximum(acc, cand), None

    init = jnp.full((q_pts.shape[0], feats.shape[1]), -jnp.inf, feats.dtype)
    out, _ = jax.lax.scan(body, init, (adj_c, f_c))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _maxpool(cutoff, chunk, q_pts, s_pts, feats, s_mask):
    raw = _maxpool_raw(cutoff, chunk, q_pts, s_pts, feats, s_mask)
    return jnp.where(jnp.isfinite(raw), raw, 0.0)


def _maxpool_fwd(cutoff, chunk, q_pts, s_pts, feats, s_mask):
    raw = _maxpool_raw(cutoff, chunk, q_pts, s_pts, feats, s_mask)
    out = jnp.where(jnp.isfinite(raw), raw, 0.0)
    return out, (q_pts, s_pts, feats, s_mask, raw)


def _maxpool_bwd(cutoff, chunk, res, g):
    """Recompute-based backward: dfeats[j, c] = sum_m g[m, c] over the
    (m, c) cells whose max was achieved at support j (equality
    indicator; exact ties split the gradient across the tied supports —
    measure-zero for continuous features). No per-step residuals are
    stored, unlike autodiff-through-scan, which materialized the
    (M, chunk, C) candidates for every chunk (the 40 GB HBM OOM)."""
    q_pts, s_pts, feats, s_mask, raw = res
    adj_c, f_c = _maxpool_chunks(q_pts, s_pts, feats, s_mask, cutoff, chunk)

    def body(_, xs):
        a, f = xs
        ind = a[:, :, None] & (f[None, :, :] == raw[:, None, :])
        df = jnp.einsum("mnc,mc->nc", ind.astype(g.dtype), g)
        return None, df

    _, df_chunks = jax.lax.scan(body, None, (adj_c, f_c))
    N, C = feats.shape
    df = df_chunks.reshape(-1, C)[:N]
    zeros = lambda x: jnp.zeros_like(x)
    return zeros(q_pts), zeros(s_pts), df, zeros(s_mask)


_maxpool.defvjp(_maxpool_fwd, _maxpool_bwd)


def dense_maxpool(q_pts: jax.Array, s_pts: jax.Array, feats: jax.Array,
                  s_mask: jax.Array, *, cutoff: float,
                  chunk: int = 64) -> jax.Array:
    """Masked max over all in-cutoff support features — the strided-block
    shortcut max-pool (blocks.py max_pool over the pooling table), dense
    radius semantics, chunked so the (M, N, C) candidate tensor is never
    materialized (forward or backward). Queries with no neighbor return 0
    (table-path parity).
    """
    return _maxpool(float(cutoff), int(chunk), q_pts, s_pts, feats, s_mask)
