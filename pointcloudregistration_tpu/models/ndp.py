"""Neural Deformation Pyramid (NDP) — non-rigid registration by coarse-to-fine
per-level MLP warps, optimized per pair.

Capability parity with the reference's NDP
(c2p-net/deformationpyramid/model/nets.py:10-177 Deformation_Pyramid /
NDPLayer, registration.py:149-289 optimize_deformation_pyramid): m pyramid
levels; level i sees a sinusoidal positional encoding at frequency
2^(k0+i+1); each level is a small MLP emitting a per-point rigid motion
(axis-angle + translation) plus, for levels > 0, a sigmoid nonrigidity gate
blending the motion with identity. Levels are optimized sequentially with
Adam against a truncated-Chamfer data term on an inlier subset and a BCE
penalty pushing gates toward rigidity; each level's output is detached and
fed to the next.

TPU-first re-design (SURVEY.md §7.3):
  * the reference runs ~9 levels x <=40 eager iterations of
    kNN + MLP + backprop per pair (≈360 CUDA launch rounds,
    testScript.py:191-192); here ONE `lax.scan` over levels with an inner
    `lax.scan` over Adam steps compiles to a single program,
  * the Chamfer data term uses the blocked NN ops (no (N,M) HBM matrix),
  * everything vmaps over a batch of pairs — the pair axis is the
    embarrassingly-parallel throughput axis the reference never exploits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.ops import knn as _knn


class NDPConfig(NamedTuple):
    """Defaults mirror c2p-net/config/NDP.yaml:8-24."""
    m: int = 9                # pyramid levels
    k0: int = -8              # base log2 frequency
    depth: int = 3            # MLP hidden layers
    width: int = 128
    iters: int = 40           # Adam steps per level
    lr: float = 0.01
    # nonrigidity BCE weight. The reference uses 0.05 (NDP.yaml:24) on
    # raw-unit clouds; on unit-cube-normalized data the Chamfer term is
    # ~1e-3, so the weight must shrink proportionally or the gates collapse
    # to 0 and no level ever deforms.
    w_reg: float = 0.005
    # truncated-Chamfer threshold (squared). The reference optimizer runs
    # effectively untruncated (trunc=1e+9, registration.py:236).
    trunc: float = 1e9
    mlp_scale: float = 1e-3   # near-identity init of the motion head
    # early-stop of the per-level Adam loop (registration.py:246-256):
    # stop once the loss plateaus (|prev - loss| < prev * break_ratio) for
    # max_break_count cumulative steps, or drops below 1e-4. Implemented as
    # a lax.while_loop, so a converged level really skips its remaining
    # iterations; under vmap the level runs until the LAST pair in the
    # batch converges (the vmap-of-while semantics), still a real win.
    # 0 disables (fixed-length scan).
    max_break_count: int = 15
    break_ratio: float = 1e-3
    # NN backend for the data term: the Pallas kernel is ~4x faster than the
    # blocked-jnp scan at 3k-point scale (no HBM distance matrices)
    nn_backend: str = "auto"  # auto | pallas | jnp
    # Fixed-capacity data subset for the level optimization. The reference
    # optimizes the pyramid ONLY on the RANSAC-inlier sample (s_sample =
    # src[inds], registration.py:229-236) and warps the full cloud once at
    # the end (registration.py:279-287); data_cap is the static-shape
    # equivalent: up to data_cap masked-in points drive the optimization,
    # the full cloud is warped once per level afterwards. None = optimize on
    # the full cloud (the LNDP landmark path requires this: landmark indices
    # address the full cloud).
    data_cap: int | None = None
    # Fixed-capacity TARGET subset for the data term — the y-side twin of
    # data_cap. The truncated-Chamfer target is a distribution sample, not
    # an index space (nothing downstream addresses tgt rows), so capping it
    # only subsamples the data term's reference surface. Measured on the
    # bench workload: tgt_cap=1024 cuts the per-step NND scan by 2/3 with
    # chamfer unchanged (0.0270 vs 0.0274 full; PERF.md). None = full tgt.
    tgt_cap: int | None = None


def _level_freq(cfg: NDPConfig, level: jax.Array) -> jax.Array:
    return 2.0 ** (cfg.k0 + level + 1.0)


def init_level_params(key: jax.Array, cfg: NDPConfig):
    """One level's MLP: in 9 (xyz + sin/cos posenc) -> width^depth -> 7."""
    dims = [9] + [cfg.width] * cfg.depth
    keys = jax.random.split(key, cfg.depth + 1)
    layers = []
    for i in range(cfg.depth):
        w = jax.random.normal(keys[i], (dims[i], dims[i + 1])) \
            * jnp.sqrt(2.0 / dims[i])
        layers.append({"w": w, "b": jnp.zeros(dims[i + 1])})
    w_out = jax.random.normal(keys[-1], (cfg.width, 7)) * cfg.mlp_scale
    layers.append({"w": w_out, "b": jnp.zeros(7)})
    return layers


def init_pyramid(key: jax.Array, cfg: NDPConfig):
    """Stacked params for all m levels: pytree with leading (m,) axis."""
    keys = jax.random.split(key, cfg.m)
    return jax.vmap(lambda k: init_level_params(k, cfg))(keys)


def warp_level(params, x: jax.Array, freq: jax.Array,
               use_gate: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Apply one level's warp. x (..., N, 3) -> (warped, gate)."""
    h = jnp.concatenate(
        [x, jnp.sin(freq * jnp.pi * x), jnp.cos(freq * jnp.pi * x)], -1)
    for layer in params[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    out = h @ params[-1]["w"] + params[-1]["b"]        # (..., N, 7)
    w_rot, v, gate_logit = out[..., :3], out[..., 3:6], out[..., 6]
    R = se3.exp_so3(w_rot)                             # (..., N, 3, 3)
    moved = jnp.einsum("...nij,...nj->...ni", R, x,
                       precision=jax.lax.Precision.HIGHEST) + v
    gate = jax.nn.sigmoid(gate_logit)                  # (..., N)
    # level 0 is ungated full motion (reference nets.py:132-137)
    g = jnp.where(use_gate, gate, 1.0)
    warped = g[..., None] * moved + (1.0 - g[..., None]) * x
    return warped, gate


def _use_pallas(cfg: NDPConfig) -> bool:
    if cfg.nn_backend == "pallas":
        return True
    if cfg.nn_backend == "jnp":
        return False
    return jax.default_backend() == "tpu"


def _level_loss(params, x, tgt, freq, use_gate, data_mask, tgt_mask, cfg,
                ldmk_idx=None, ldmk_tgt=None, w_ldmk=0.0, ldmk_mask=None):
    warped, gate = warp_level(params, x, freq, use_gate)
    if _use_pallas(cfg):
        from pointcloudregistration_tpu.ops import nnd_pallas
        data = nnd_pallas.truncated_chamfer(warped, tgt, cfg.trunc,
                                            x_mask=data_mask,
                                            y_mask=tgt_mask)
    else:
        data = _knn.truncated_chamfer(warped, tgt, cfg.trunc,
                                      x_mask=data_mask, y_mask=tgt_mask)
    loss = jnp.mean(data)
    if ldmk_idx is not None:
        # landmark-guided variant (LNDP): squared error on matched pairs
        # (registration.py:210-227 when use_ldmk); ldmk_mask weights out
        # rejected matches (static shape). Bool masks gate 0/1; float masks
        # act as per-landmark confidence weights (matcher fine-similarity).
        w_l = jnp.sum((jnp.take_along_axis(
            warped, ldmk_idx[..., None], axis=-2) - ldmk_tgt) ** 2, -1)
        if ldmk_mask is not None:
            lw = ldmk_mask.astype(w_l.dtype)
            loss = loss + w_ldmk * jnp.sum(lw * w_l) / jnp.maximum(
                jnp.sum(lw), 1e-6)
        else:
            loss = loss + w_ldmk * jnp.mean(w_l)
    # BCE(gate -> 0): prefer rigidity (registration.py:240-244)
    reg = -jnp.mean(jnp.log1p(-jnp.clip(gate, 0.0, 1.0 - 1e-6)), -1)
    return loss + cfg.w_reg * jnp.mean(jnp.where(use_gate, reg, 0.0))


@partial(jax.jit, static_argnames=("cfg", "w_ldmk"))
def fit(key: jax.Array, src: jax.Array, tgt: jax.Array,
        cfg: NDPConfig = NDPConfig(),
        data_mask: jax.Array | None = None,
        tgt_mask: jax.Array | None = None,
        ldmk_idx: jax.Array | None = None,
        ldmk_tgt: jax.Array | None = None,
        w_ldmk: float = 1.0,
        ldmk_mask: jax.Array | None = None):
    """Optimize the pyramid for one pair (or a batch via vmap).

    src (N, 3) rigidly-prealigned source, tgt (M, 3). data_mask selects the
    subset driving the data term (the reference feeds RANSAC inliers,
    registration.py:236); the FINAL warp is applied to all src points
    (registration.py:279-287).

    Returns (warped_src, aux) with aux = dict(losses (m, iters), gates mean).
    """
    if data_mask is None:
        data_mask = jnp.ones(src.shape[:-1], bool)
    params0 = init_pyramid(key, cfg)
    opt = optax.adam(cfg.lr)

    # fixed-capacity data subset (the reference's s_sample = src[inds],
    # registration.py:229-236); landmark indices address the full cloud so
    # the LNDP path keeps it
    subset = (cfg.data_cap is not None and ldmk_idx is None
              and cfg.data_cap < src.shape[-2])
    if subset:
        key, k_sel = jax.random.split(key)
        # prefer masked-in points, break ties uniformly at random; points
        # that don't fit the cap (or aren't inliers) fall out / stay masked
        score = data_mask.astype(jnp.float32) \
            + jax.random.uniform(k_sel, data_mask.shape, maxval=0.5)
        _, sel = jax.lax.top_k(score, cfg.data_cap)
        x_data = jnp.take_along_axis(src, sel[..., None], axis=-2)
        sub_mask = jnp.take_along_axis(data_mask, sel, axis=-1)
    else:
        x_data, sub_mask = src, data_mask

    # target-side subset (see NDPConfig.tgt_cap): the data term measures
    # distance to a SAMPLE of the target surface; the final warp and any
    # caller-side chamfer still see the full clouds
    if cfg.tgt_cap is not None and cfg.tgt_cap < tgt.shape[-2]:
        key, k_tsel = jax.random.split(key)
        t_valid = (jnp.ones(tgt.shape[:-1], bool) if tgt_mask is None
                   else tgt_mask)
        t_score = t_valid.astype(jnp.float32) \
            + jax.random.uniform(k_tsel, t_valid.shape, maxval=0.5)
        _, t_sel = jax.lax.top_k(t_score, cfg.tgt_cap)
        tgt = jnp.take_along_axis(tgt, t_sel[..., None], axis=-2)
        tgt_mask = jnp.take_along_axis(t_valid, t_sel, axis=-1)

    def run_level(x, inputs):
        params, level = inputs
        freq = _level_freq(cfg, level)
        use_gate = level > 0
        opt_state = opt.init(params)

        def loss_grad(p):
            return jax.value_and_grad(_level_loss)(
                p, x, tgt, freq, use_gate, sub_mask, tgt_mask, cfg,
                ldmk_idx, ldmk_tgt, w_ldmk, ldmk_mask)

        if cfg.max_break_count > 0:
            # plateau early-stop (registration.py:246-256) as a while_loop:
            # a converged level skips its remaining Adam iterations
            def cond(carry):
                _, _, step, prev, bad, _ = carry
                return ((step < cfg.iters) & (bad < cfg.max_break_count)
                        & (prev > 1e-4))

            def body(carry):
                p, s, step, prev, bad, losses = carry
                loss, g = loss_grad(p)
                updates, s = opt.update(g, s, p)
                p = optax.apply_updates(p, updates)
                losses = losses.at[step].set(loss)
                bad = bad + (jnp.abs(prev - loss)
                             < prev * cfg.break_ratio).astype(jnp.int32)
                return (p, s, step + 1, loss, bad, losses)

            init = (params, opt_state, jnp.asarray(0, jnp.int32),
                    jnp.asarray(jnp.inf, jnp.float32),
                    jnp.asarray(0, jnp.int32),
                    jnp.full((cfg.iters,), jnp.nan, jnp.float32))
            params_f, _, n_steps, _, _, losses = jax.lax.while_loop(
                cond, body, init)
        else:
            def adam_step(carry, _):
                p, s = carry
                loss, g = loss_grad(p)
                updates, s = opt.update(g, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (params_f, _), losses = jax.lax.scan(
                adam_step, (params, opt_state), None, length=cfg.iters)
            n_steps = jnp.asarray(cfg.iters, jnp.int32)
        warped, gate = warp_level(params_f, x, freq, use_gate)
        # detach: next level treats this level's output as data
        return jax.lax.stop_gradient(warped), (params_f, losses,
                                               jnp.mean(gate), n_steps)

    levels = jnp.arange(cfg.m, dtype=jnp.float32)
    warped, (params_all, losses, gates, n_steps) = jax.lax.scan(
        run_level, x_data, (params0, levels))

    if subset:
        # final full-cloud warp through the frozen pyramid, once per level
        # (registration.py:279-287)
        warped = apply_pyramid(params_all, src, cfg)
    return warped, {"losses": losses, "gate_means": gates,
                    "level_steps": n_steps, "params": params_all}


def apply_pyramid(params_all, x: jax.Array, cfg: NDPConfig = NDPConfig()):
    """Warp any cloud through a frozen fitted pyramid (the final full-cloud
    warp of registration.py:279-287, as a standalone op).

    params_all is aux["params"] from `fit` — the per-level parameter stack;
    the deformation field is a pure function of coordinates, so it applies
    to clouds other than the one it was fitted on (e.g. the full-resolution
    source when the fit ran on a subsampled/inlier subset)."""
    levels = jnp.arange(cfg.m, dtype=jnp.float32)

    def apply_level(pts, inputs):
        params, level = inputs
        out, _ = warp_level(params, pts, _level_freq(cfg, level), level > 0)
        return out, None

    warped, _ = jax.lax.scan(apply_level, x, (params_all, levels))
    return warped


def fit_batch(key: jax.Array, src: jax.Array, tgt: jax.Array,
              cfg: NDPConfig = NDPConfig(),
              data_mask: jax.Array | None = None,
              tgt_mask: jax.Array | None = None):
    """Batched NDP: src (B, N, 3), tgt (B, M, 3) optimized in parallel."""
    B = src.shape[0]
    keys = jax.random.split(key, B)
    if data_mask is None:
        data_mask = jnp.ones(src.shape[:-1], bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt.shape[:-1], bool)
    return jax.vmap(lambda k, s, t, dm, tm: fit(k, s, t, cfg, dm, tm))(
        keys, src, tgt, data_mask, tgt_mask)
