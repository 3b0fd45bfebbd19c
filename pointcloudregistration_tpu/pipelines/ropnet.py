"""ROPNet training/eval pipeline.

Parity targets: ROPNet/src/train.py:46-316 (epoch loop, KFold CV, cosine
warm restarts, checkpoint criteria) and ROPNet/src/data/MRI.py:24-78 (pair
composition: GT alignment + random SE(3) disorientation + normals). Data
comes from the on-device synthetic phantom factory; normals are estimated
with the closed-form covariance eig.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import estimate_normals
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.losses import ropnet as ropnet_loss
from pointcloudregistration_tpu.models.ropnet import ROPNet, ROPNetConfig
from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu import metrics


class ROPNetTrainConfig(NamedTuple):
    model: ROPNetConfig = ROPNetConfig()
    n_points: int = 2048          # npts (configs/arguments.py:11)
    lr: float = 1e-4
    batch: int = 2                # reference batch size (arguments.py:66)
    max_angle_deg: float = 45.0
    max_trans: float = 0.5


class TrainState(train_state.TrainState):
    pass


def create_train_state(key: jax.Array, cfg: ROPNetTrainConfig) -> TrainState:
    model = ROPNet(cfg.model)
    dummy = jnp.zeros((1, cfg.n_points, 6))
    variables = model.init({"params": key, "dropout": key}, dummy, dummy,
                           train=False)
    # cosine warm restarts, T_0=40 (train.py:243-246)
    sched = optax.sgdr_schedule([
        {"init_value": cfg.lr, "peak_value": cfg.lr, "decay_steps": t,
         "warmup_steps": 0, "end_value": 1e-6}
        for t in (40, 80, 160, 320)])
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=optax.adam(sched))


@partial(jax.jit, static_argnames=("cfg",))
def make_batch(key: jax.Array, cfg: ROPNetTrainConfig):
    """(src (B,N,6), tgt (B,N,6), gt (R, t)) with normals concatenated
    (data/MRI.py:62-67)."""
    pairs = synthetic.make_batch(key, cfg.batch, n_points=cfg.n_points,
                                 max_angle_deg=cfg.max_angle_deg,
                                 max_trans=cfg.max_trans)
    src, tgt = pairs["source"], pairs["target"]

    def with_normals(pts):
        _, nidx = knn_ops.knn(pts, pts, 16)
        n = estimate_normals(pts, nidx)
        return jnp.concatenate([pts, n], -1)

    return {
        "src": jax.vmap(with_normals)(src),
        "tgt": jax.vmap(with_normals)(tgt),
        "R_gt": pairs["R_gt"], "t_gt": pairs["t_gt"],
        "target_mask": pairs["target_mask"],
    }


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: TrainState, key: jax.Array, batch,
               cfg: ROPNetTrainConfig):
    gt_src = se3.transform(batch["src"][..., :3], batch["R_gt"],
                           batch["t_gt"])

    def loss_fn(params):
        out = state.apply_fn({"params": params}, batch["src"], batch["tgt"],
                             train=True, rngs={"dropout": key})
        loss, parts = ropnet_loss.total_loss(
            gt_src, out["pred_src"], out["x_ol"], out["y_ol"],
            batch["tgt"][..., :3])
        return loss, (parts, out)

    (loss, (parts, out)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    R, t = out["pred_Ts"][-1]
    rre = jnp.mean(metrics.isotropic_R_error(R, batch["R_gt"]))
    rte = jnp.mean(metrics.isotropic_t_error(t, batch["t_gt"]))
    return state, {"loss": loss, "rre": rre, "rte": rte, **parts}


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: TrainState, batch, cfg: ROPNetTrainConfig):
    out = state.apply_fn({"params": state.params}, batch["src"],
                         batch["tgt"], train=False)
    R, t = out["pred_Ts"][-1]
    return {
        "rre": metrics.isotropic_R_error(R, batch["R_gt"]),
        "rte": metrics.isotropic_t_error(t, batch["t_gt"]),
        "R": R, "t": t,
    }


def evaluate(state: TrainState, key: jax.Array,
             cfg: ROPNetTrainConfig = ROPNetTrainConfig(),
             n_batches: int = 8, dump_path: str | None = None):
    """Eval harness with overlap precision/recall — parity with
    ROPNet/src/eval.py:23-133 (registration errors + OP/ROP overlap P/R of
    the src_ol1/src_ol2 point sets) and vis.py's Results dump."""
    import numpy as np
    from pointcloudregistration_tpu.core.geometry import square_dists

    records = []
    for b in range(n_batches):
        batch = make_batch(jax.random.fold_in(key, b), cfg)
        out = state.apply_fn({"params": state.params}, batch["src"],
                             batch["tgt"], train=False)
        R, t = out["pred_Ts"][-1]
        gt_src = se3.transform(batch["src"][..., :3], batch["R_gt"],
                               batch["t_gt"])
        # GT overlap: src points with a tgt point within 0.05 after GT align
        d = square_dists(gt_src, batch["tgt"][..., :3])
        gt_ol = jnp.min(d, -1) < 0.05 * 0.05              # (B, N)
        # predicted overlap sets: which raw src points appear in src_ol1/2
        d1 = square_dists(out["src_ol1"], batch["src"][..., :3])
        in_ol1 = jnp.min(d1, -2) < 1e-8                   # (B, N)
        d2 = square_dists(out["src_ol2"], batch["src"][..., :3])
        in_ol2 = jnp.min(d2, -2) < 1e-8
        p1, r1 = metrics.overlap_precision_recall(in_ol1, gt_ol)
        p2, r2 = metrics.overlap_precision_recall(in_ol2, gt_ol)
        records.append({
            "rre": np.asarray(metrics.isotropic_R_error(R, batch["R_gt"])),
            "rte": np.asarray(metrics.isotropic_t_error(t, batch["t_gt"])),
            "op_precision": np.asarray(p1), "op_recall": np.asarray(r1),
            "rop_precision": np.asarray(p2), "rop_recall": np.asarray(r2),
        })
    agg = {k: float(np.mean(np.concatenate([r[k] for r in records])))
           for k in records[0]}
    if dump_path is not None:
        np.savez_compressed(dump_path, **{
            k: np.concatenate([r[k] for r in records]) for k in records[0]})
    return agg


def vis_dump(state: TrainState, key: jax.Array, path: str,
             cfg: ROPNetTrainConfig = ROPNetTrainConfig(),
             n_batches: int = 4):
    """Qualitative dump {source, target, pred} -> pickle, matching the
    reference's Results.pickle (ROPNet/src/vis.py:21-82 vis_ROPNet)."""
    import pickle

    import numpy as np

    src_l, tgt_l, pred_l = [], [], []
    for b in range(n_batches):
        batch = make_batch(jax.random.fold_in(key, b), cfg)
        out = state.apply_fn({"params": state.params}, batch["src"],
                             batch["tgt"], train=False)
        for i in range(batch["src"].shape[0]):
            src_l.append(np.asarray(batch["src"][i, :, :3]))
            tgt_l.append(np.asarray(batch["tgt"][i, :, :3]))
            pred_l.append(np.asarray(out["pred_src"][-1][i]))
    with open(path, "wb") as f:
        pickle.dump({"source": src_l, "target": tgt_l, "pred": pred_l}, f)
    return len(src_l)


def _kfold_indices(n: int, n_folds: int, fold: int):
    """Contiguous K-fold split of range(n) — (train_idx, val_idx), the
    sklearn.model_selection.KFold(shuffle=False) contract the reference's
    outer loop uses (ROPNet/src/train.py:208-216)."""
    sizes = [n // n_folds + (1 if i < n % n_folds else 0)
             for i in range(n_folds)]
    starts = np.cumsum([0] + sizes)
    val = np.arange(starts[fold], starts[fold + 1])
    train = np.concatenate([np.arange(0, starts[fold]),
                            np.arange(starts[fold + 1], n)])
    return train, val


def _batch_from_items(items, cfg: ROPNetTrainConfig):
    """Stack MRIPairs rows (normal=True -> 6 channels) into the train-step
    batch pytree.

    Label contract bridge: MRIPairs stores the FORWARD disorientation
    (R, t) applied to the aligned source (tgt ~ R_gt^T (src - t_gt),
    tests/test_mri_data.py::test_compose_label_inverse) — exactly what the
    reference loader emits and then inverts before supervising
    (ROPNet/src/train.py:63-66 inv_R_t). train_step expects the ALIGNER
    (the synthetic make_batch contract), so invert here.
    """
    src = jnp.stack([jnp.asarray(it["src"], jnp.float32) for it in items])
    tgt = jnp.stack([jnp.asarray(it["tgt"], jnp.float32) for it in items])
    R_fwd = jnp.stack([jnp.asarray(it["R_gt"]) for it in items])
    t_fwd = jnp.stack([jnp.asarray(it["t_gt"]) for it in items])
    R_align, t_align = se3.invert(R_fwd, t_fwd)
    return {"src": src, "tgt": tgt,
            "R_gt": R_align, "t_gt": t_align,
            "target_mask": jnp.ones(tgt.shape[:-1], bool)}


def train(key: jax.Array, cfg: ROPNetTrainConfig = ROPNetTrainConfig(),
          steps: int = 100, n_folds: int = 1, log_every: int = 20,
          data=None, ckpt_dir: str | None = None,
          log_dir: str | None = None, resume: bool = False,
          save_every: int = 100):
    """Training driver with the reference's KFold outer loop
    (train.py:208-310: fresh model/optimizer per fold, per-fold and global
    best checkpoints under min-loss / min-rot-error criteria, --resume).

    data: path to a RANSACData pickle (streams data.mri.MRIPairs with
    normals, the real training contract, ROPNet/src/data/MRI.py:33) or an
    indexable of MRIPairs-shaped rows; None streams synthetic pairs, where
    each fold uses a disjoint key range. With a dataset, folds are true CV
    splits and each fold ends with a val-fold eval entry in its history.

    Returns (states, history) — one state and one history list per fold.
    """
    from pointcloudregistration_tpu.train.loop import TrainHooks
    if isinstance(data, str):
        from pointcloudregistration_tpu.data.mri import MRIPairs
        data = MRIPairs(data, "train", npts=cfg.n_points, normal=True,
                        max_angle_deg=cfg.max_angle_deg,
                        max_trans=cfg.max_trans)

    states, history = [], []
    for fold in range(n_folds):
        fkey = jax.random.fold_in(key, fold)
        state = create_train_state(jax.random.fold_in(fkey, 0), cfg)
        hooks = TrainHooks(f"{ckpt_dir}/fold{fold}" if ckpt_dir else None,
                           log_dir, f"ropnet_fold{fold}", save_every)
        start = 0
        if resume:
            state, start = hooks.restore(state)
        if data is not None:
            tr_idx, val_idx = _kfold_indices(len(data), max(n_folds, 2),
                                             fold % max(n_folds, 2))
        hist = []
        for step in range(start, steps):
            kd, kt = jax.random.split(jax.random.fold_in(fkey, step + 1))
            if data is None:
                batch = make_batch(kd, cfg)
            else:
                sel = [int(tr_idx[(step * cfg.batch + j) % len(tr_idx)])
                       for j in range(cfg.batch)]
                batch = _batch_from_items([data[i] for i in sel], cfg)
            state, m = train_step(state, kt, batch, cfg)
            if (step % log_every == 0 or step == steps - 1
                    or (step + 1) % save_every == 0):
                mf = {k: float(v) for k, v in m.items()}
                hist.append(mf)
                hooks.log(step, mf)
                hooks.step_end(step, state, mf, steps)
        if data is not None and len(val_idx):
            batch = _batch_from_items(
                [data[int(i)] for i in val_idx[:cfg.batch * 4]], cfg)
            ev = eval_step(state, batch, cfg)
            hist.append({"val_rre": float(jnp.mean(ev["rre"])),
                         "val_rte": float(jnp.mean(ev["rte"]))})
        hooks.close()
        states.append(state)
        history.append(hist)
    return states, history
