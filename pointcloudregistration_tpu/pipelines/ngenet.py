"""NgeNet training + inference pipeline (the C2P rigid stage).

Parity targets: c2p-net/trainNgeNet.py:25-226 (SGD momentum 0.98 + ExpLR,
saliency-weight schedule gated on recall > 0.3) and testScript.py:126-206
(features -> vote -> RANSAC on learned features). Data and pyramids come
from the on-device synthetic factory + ops/pyramid.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import estimate_normals
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.losses.ngenet import (NgeNetLossConfig,
                                                      ngenet_loss)
from pointcloudregistration_tpu.models.ngenet import (NgeNet, NgeNetConfig,
                                                      vote)
from pointcloudregistration_tpu.ops import icp as icp_mod
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import ransac as ransac_mod
from pointcloudregistration_tpu.ops.pyramid import PyramidConfig, build_pyramid


class NgeNetTrainConfig(NamedTuple):
    model: NgeNetConfig = NgeNetConfig()
    pyramid: PyramidConfig = PyramidConfig()
    loss: NgeNetLossConfig = NgeNetLossConfig()
    n_points: int = 2048
    lr: float = 0.005
    momentum: float = 0.98
    weight_decay: float = 1e-6
    lr_gamma: float = 0.95          # ExpLR per epoch (trainNgeNet.py)
    max_angle_deg: float = 45.0
    max_trans: float = 0.5
    saliency_recall_gate: float = 0.3


class NgeNetTrainState(train_state.TrainState):
    batch_stats: Any = None


def _pyramid_with_normals(points, mask, pyr_cfg, dense: bool = False):
    # dense KPConv needs no neighbor/pool tables (ops/kpconv_pallas.py) —
    # the light pyramid skips the per-level radius-kNN builds entirely
    pyr = build_pyramid(points, mask, pyr_cfg, tables=not dense)
    p3, m3 = pyr["points"][3], pyr["masks"][3]
    _, nidx = knn_ops.knn(p3, p3, 10, m3, m3)
    normals3 = estimate_normals(p3, nidx)
    return pyr, normals3


@partial(jax.jit, static_argnames=("cfg",))
def make_sample(key: jax.Array, cfg: NgeNetTrainConfig):
    """One training pair: disoriented source + target, pyramids, GT."""
    pair = synthetic.make_pair(key, n_points=cfg.n_points,
                               max_angle_deg=cfg.max_angle_deg,
                               max_trans=cfg.max_trans)
    return make_sample_arrays(pair["source"], pair["source_mask"],
                              pair["target"], pair["target_mask"],
                              pair["R_gt"], pair["t_gt"], cfg)


@partial(jax.jit, static_argnames=("cfg",))
def make_sample_arrays(source, source_mask, target, target_mask,
                       R_gt, t_gt, cfg: NgeNetTrainConfig):
    """Pyramids + normals for an explicit pair — the on-device collate for
    real data (replaces the CPU C++ collate, dataloader.py:69-182)."""
    pyr_s, n_s = _pyramid_with_normals(source, source_mask, cfg.pyramid,
                                       cfg.model.dense)
    pyr_t, n_t = _pyramid_with_normals(target, target_mask, cfg.pyramid,
                                       cfg.model.dense)
    return {"pyr_src": pyr_s, "pyr_tgt": pyr_t,
            "normals_src": n_s, "normals_tgt": n_t,
            "R_gt": R_gt, "t_gt": t_gt}


@partial(jax.jit, static_argnames=("cfg",))
def make_sample_arrays_augmented(key, source, source_mask, target,
                                 target_mask, R_gt, t_gt,
                                 cfg: NgeNetTrainConfig):
    """Rotation-augmented on-device collate for raw padded clouds.

    Applies independent uniform SO(3) rotations to both clouds and rebuilds
    the pyramids (voxel subsampling is NOT rotation-equivariant, so the
    pyramid must be recomputed after rotating — the augmentation the r03
    corpus overfit for lack of). GT composes as
        tgt' = Rb tgt,  src' = Ra src  =>  R' = Rb R Ra^T, t' = Rb t.
    The reference applies random disorientation per draw in the dataset
    compose step (ROPNet/src/data/MRI.py:51-78); this is the NgeNet-side
    equivalent at train time.
    """
    ka, kb = jax.random.split(key)
    Ra = se3.random_uniform_rotation(ka)
    Rb = se3.random_uniform_rotation(kb)
    prec = jax.lax.Precision.HIGHEST
    src = jnp.einsum("ij,nj->ni", Ra, source, precision=prec)
    tgt = jnp.einsum("ij,nj->ni", Rb, target, precision=prec)
    R_new = jnp.einsum("ij,jk,lk->il", Rb, R_gt, Ra, precision=prec)
    t_new = jnp.einsum("ij,j->i", Rb, t_gt, precision=prec)
    return make_sample_arrays(src, source_mask, tgt, target_mask,
                              R_new, t_new, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def batched_train_step_augmented(state: NgeNetTrainState, keys, raw_batch,
                                 w_saliency, cfg: NgeNetTrainConfig):
    """batched_train_step over RAW padded clouds with per-step rotation
    augmentation + in-step pyramid rebuild (one jitted program).

    raw_batch: dict(src (B,N,3), src_mask (B,N), tgt, tgt_mask,
    R_gt (B,3,3), t_gt (B,3))."""
    def one(k, src, sm, tgt, tm, R, t):
        k_aug, k_loss = jax.random.split(k)
        sample = make_sample_arrays_augmented(k_aug, src, sm, tgt, tm,
                                              R, t, cfg)
        (loss, (bs, parts)), grads = _loss_and_grads(state, k_loss, sample,
                                                     w_saliency, cfg)
        return loss, bs, parts, grads

    loss, bs, parts, grads = jax.vmap(one)(
        keys, raw_batch["src"], raw_batch["src_mask"],
        raw_batch["tgt"], raw_batch["tgt_mask"],
        raw_batch["R_gt"], raw_batch["t_gt"])
    mean = lambda t: jax.tree.map(lambda x: jnp.mean(x, 0), t)
    state = state.apply_gradients(grads=mean(grads)).replace(
        batch_stats=mean(bs))
    return state, {"loss": jnp.mean(loss), **mean(parts)}


def _pad_cloud(pts, n: int):
    """Host-side fixed-shape pad: (m, 3) -> ((n, 3), (n,) mask)."""
    import numpy as np
    pts = np.asarray(pts, np.float32)[:n]
    m = len(pts)
    out = np.zeros((n, 3), np.float32)
    out[:m] = pts
    mask = np.zeros(n, bool)
    mask[:m] = True
    return out, mask


def sample_from_item(item: dict, cfg: NgeNetTrainConfig):
    """One NgeNetPairs row (data/mri.py) -> the trainer's sample pytree.

    The stored transformation is the GT the loss supervises against
    (c2p-net/ngenet/data/MRI.py:70-77: transf carries src into tgt).
    """
    src, sm = _pad_cloud(item["src_points"], cfg.n_points)
    tgt, tm = _pad_cloud(item["tgt_points"], cfg.n_points)
    T = jnp.asarray(item["transf"], jnp.float32)
    return make_sample_arrays(jnp.asarray(src), jnp.asarray(sm),
                              jnp.asarray(tgt), jnp.asarray(tm),
                              T[:3, :3], T[:3, 3], cfg)


def create_train_state(key: jax.Array, cfg: NgeNetTrainConfig,
                       sample=None) -> NgeNetTrainState:
    model = NgeNet(cfg.model)
    if sample is None:
        sample = make_sample(jax.random.PRNGKey(0), cfg)
    variables = model.init(key, sample["pyr_src"], sample["pyr_tgt"],
                           sample["normals_src"], sample["normals_tgt"],
                           train=False)
    sched = optax.exponential_decay(cfg.lr, transition_steps=100,
                                    decay_rate=cfg.lr_gamma)
    tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                     optax.sgd(sched, momentum=cfg.momentum))
    return NgeNetTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"))


def _loss_and_grads(state: NgeNetTrainState, key: jax.Array, sample,
                    w_saliency: jax.Array, cfg: NgeNetTrainConfig):
    def loss_fn(params):
        (out_s, out_t), updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            sample["pyr_src"], sample["pyr_tgt"],
            sample["normals_src"], sample["normals_tgt"], train=True,
            mutable=["batch_stats"])
        total, parts = ngenet_loss(
            key,
            sample["pyr_src"]["points"][0], sample["pyr_tgt"]["points"][0],
            out_s, out_t, sample["R_gt"], sample["t_gt"],
            sample["pyr_src"]["masks"][0], sample["pyr_tgt"]["masks"][0],
            w_saliency=w_saliency, cfg=cfg.loss)
        return total, (updates["batch_stats"], parts)

    return jax.value_and_grad(loss_fn, has_aux=True)(state.params)


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: NgeNetTrainState, key: jax.Array, sample,
               w_saliency: jax.Array, cfg: NgeNetTrainConfig):
    (loss, (bs, parts)), grads = _loss_and_grads(state, key, sample,
                                                 w_saliency, cfg)
    state = state.apply_gradients(grads=grads).replace(batch_stats=bs)
    return state, {"loss": loss, **parts}


def stack_samples(samples):
    """Stack per-pair sample pytrees into a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *samples)


@partial(jax.jit, static_argnames=("cfg", "B"))
def make_samples(key: jax.Array, cfg: NgeNetTrainConfig, B: int):
    """B synthetic training samples with a leading batch axis."""
    keys = jax.random.split(key, B)
    return jax.vmap(lambda k: make_sample(k, cfg))(keys)


@jax.jit
def gather_samples(stacked, idx: jax.Array):
    """Select rows of a stacked sample pytree: the on-device batch draw."""
    return jax.tree.map(lambda x: x[idx], stacked)


@partial(jax.jit, static_argnames=("cfg",))
def batched_train_step(state: NgeNetTrainState, keys, samples, w_saliency,
                       cfg: NgeNetTrainConfig):
    """Mean-gradient update over a stacked sample batch (single chip).

    Equivalent to the reference's per-sample SGD budget
    (trainNgeNet.py:102-152) at 1/B the step count with better MXU
    utilization; batch_stats are batch-averaged like a true batched
    BatchNorm step.
    """
    def one(k, sample):
        (loss, (bs, parts)), grads = _loss_and_grads(state, k, sample,
                                                     w_saliency, cfg)
        return loss, bs, parts, grads

    loss, bs, parts, grads = jax.vmap(one)(keys, samples)
    mean = lambda t: jax.tree.map(lambda x: jnp.mean(x, 0), t)
    state = state.apply_gradients(grads=mean(grads)).replace(
        batch_stats=mean(bs))
    return state, {"loss": jnp.mean(loss), **mean(parts)}


@partial(jax.jit, static_argnames=("cfg",))
def eval_metrics(state: NgeNetTrainState, key: jax.Array, samples,
                 cfg: NgeNetTrainConfig):
    """Loss parts + correspondence recall on a stacked eval batch
    (train=False, no state mutation) — the val loop of trainNgeNet.py."""
    def one(k, sample):
        (out_s, out_t) = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            sample["pyr_src"], sample["pyr_tgt"],
            sample["normals_src"], sample["normals_tgt"], train=False)
        total, parts = ngenet_loss(
            k, sample["pyr_src"]["points"][0],
            sample["pyr_tgt"]["points"][0], out_s, out_t,
            sample["R_gt"], sample["t_gt"],
            sample["pyr_src"]["masks"][0], sample["pyr_tgt"]["masks"][0],
            w_saliency=jnp.zeros(()), cfg=cfg.loss)
        return {"loss": total, **parts}

    keys = jax.random.split(key, samples["R_gt"].shape[0])
    return jax.tree.map(lambda x: jnp.mean(x, 0),
                        jax.vmap(one)(keys, samples))


@lru_cache(maxsize=8)
def make_dp_train_step(mesh, cfg: NgeNetTrainConfig,
                       key_impl: str = "threefry2x32"):
    """Data-parallel train step: the sample batch sharded over the `pairs`
    mesh axis, gradients (and batch stats) pmean-reduced over ICI.

    New design mandated by the north star (SURVEY.md §2.8) — the reference
    trains on a single GPU. Each device computes grads on its local sample
    shard; one psum of the gradient pytree makes the update identical on
    every device, so per-step loss matches a single-device step at the same
    global batch (asserted in tests/test_scaling.py).

    Takes (state, keys (B, key_size) u32, samples stacked (B, ...),
    w_saliency); returns (state, metrics) replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pointcloudregistration_tpu.parallel.mesh import PAIRS_AXIS

    def body(state, keys, samples, w_saliency):
        def one(k, sample):
            (loss, (bs, parts)), grads = _loss_and_grads(
                state, jax.random.wrap_key_data(k, impl=key_impl), sample,
                w_saliency, cfg)
            return loss, bs, parts, grads

        loss, bs, parts, grads = jax.vmap(one)(keys, samples)

        def gmean(x):
            return jax.lax.pmean(jnp.mean(x, 0), PAIRS_AXIS)

        grads = jax.tree.map(gmean, grads)
        bs = jax.tree.map(gmean, bs)
        parts = jax.tree.map(gmean, parts)
        loss = gmean(loss)
        state = state.apply_gradients(grads=grads).replace(batch_stats=bs)
        return state, {"loss": loss, **parts}

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(PAIRS_AXIS), P(PAIRS_AXIS), P()),
        out_specs=(P(), P()), check_vma=False))


def dp_train_step(mesh, state: NgeNetTrainState, key: jax.Array, samples,
                  w_saliency, cfg: NgeNetTrainConfig):
    """Convenience wrapper: split per-sample keys, shard, run the DP step.

    samples: list of sample pytrees (see make_sample/sample_from_item) or an
    already-stacked pytree with leading batch axis divisible by the mesh's
    pairs axis.
    """
    if isinstance(samples, (list, tuple)):
        samples = stack_samples(samples)
    B = samples["R_gt"].shape[0]
    keys = jax.random.split(key, B)
    key_impl = "threefry2x32"
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        key_impl = str(jax.random.key_impl(keys))
        keys = jax.random.key_data(keys)
    return make_dp_train_step(mesh, cfg, key_impl)(state, keys, samples,
                                                   jnp.asarray(w_saliency))


def train(key: jax.Array, cfg: NgeNetTrainConfig = NgeNetTrainConfig(),
          steps: int = 100, log_every: int = 10, data=None,
          ckpt_dir: str | None = None, log_dir: str | None = None,
          resume: bool = False, save_every: int = 100,
          calibrate: bool = False):
    """Driver with the reference's saliency schedule: w_saliency flips to 1
    once recall passes the gate (trainNgeNet.py:217-219).

    data: path to a RANSACData pickle (streams data.mri.NgeNetPairs) or any
    indexable of NgeNetPairs-shaped rows; None streams synthetic pairs.
    Checkpoints/logs/resume via train.loop.TrainHooks; the recall sync to
    host happens only at log points (an every-step float() readback would
    serialize the device queue).
    """
    from pointcloudregistration_tpu.train.loop import TrainHooks
    if isinstance(data, str):
        from pointcloudregistration_tpu.data.mri import NgeNetPairs
        data = NgeNetPairs(data, "train", max_points=cfg.n_points)
    if calibrate and data is not None:
        # one-shot neighbor-cap calibration over a dataset sample
        # (dataloader.py:185-205)
        from pointcloudregistration_tpu.ops.pyramid import (
            calibrate_neighbor_caps)
        clouds = []
        for i in range(min(8, len(data))):
            it = data[i]
            for k in ("src_points", "tgt_points"):
                pts, m = _pad_cloud(it[k], cfg.n_points)
                clouds.append((pts, m))
        cfg = cfg._replace(pyramid=calibrate_neighbor_caps(clouds,
                                                           cfg.pyramid))
    state = create_train_state(jax.random.fold_in(key, 0), cfg,
                               make_sample(jax.random.fold_in(key, 1), cfg))
    hooks = TrainHooks(ckpt_dir, log_dir, "ngenet", save_every)
    if resume:
        state, start = hooks.restore(state)
    else:
        start = 0
    w_sal, hist = 0.0, []
    for step in range(start, steps):
        kd, kl = jax.random.split(jax.random.fold_in(key, step + 2))
        if data is None:
            sample = make_sample(kd, cfg)
        else:
            sample = sample_from_item(data[step % len(data)], cfg)
        state, m = train_step(state, kl, sample, jnp.asarray(w_sal), cfg)
        if (step % log_every == 0 or step == steps - 1
                or (step + 1) % save_every == 0):
            mf = {k: float(v) for k, v in m.items()}
            if mf["recall"] > cfg.saliency_recall_gate:
                w_sal = 1.0
            hist.append(mf)
            hooks.log(step, mf)
            hooks.step_end(step, state, mf, steps)
    hooks.close()
    return state, hist


@partial(jax.jit, static_argnames=("cfg", "num_hypotheses"))
def register(state: NgeNetTrainState, key: jax.Array,
             source, target, source_mask=None, target_mask=None,
             cfg: NgeNetTrainConfig = NgeNetTrainConfig(),
             num_hypotheses: int = 8192):
    """Inference: NgeNet feats -> vote -> RANSAC -> ICP polish.

    (testScript.py:126-206; RANSAC distance threshold mapped from the
    first_subsampling_dl as in testScript.py:112-119.)
    """
    pyr_s, n_s = _pyramid_with_normals(source, source_mask, cfg.pyramid,
                                       cfg.model.dense)
    pyr_t, n_t = _pyramid_with_normals(target, target_mask, cfg.pyramid,
                                       cfg.model.dense)
    out_s, out_t = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        pyr_s, pyr_t, n_s, n_t, train=False)
    p0_s, m0_s = pyr_s["points"][0], pyr_s["masks"][0]
    p0_t, m0_t = pyr_t["points"][0], pyr_t["masks"][0]
    sel, corr_idx, feats_h = vote(p0_s, p0_t, out_s, out_t,
                                  cfg.pyramid.first_voxel, m0_s, m0_t)
    thresh = cfg.pyramid.first_voxel * 2.0
    R0, t0, info = ransac_mod.ransac_correspondences(
        key, p0_s, p0_t[corr_idx], threshold=thresh,
        num_hypotheses=num_hypotheses, corr_mask=sel)
    R, t, iinfo = icp_mod.icp(p0_s, p0_t, thresh, iters=20, R0=R0, t0=t0,
                              src_mask=m0_s, tgt_mask=m0_t,
                              max_dist_final=cfg.pyramid.first_voxel)
    return {"R": R, "t": t, "ransac": info, "icp": iinfo,
            "inliers": info["inliers"], "sub_source": p0_s,
            "sub_target": p0_t, "sub_source_mask": m0_s,
            "sub_target_mask": m0_t}
