"""NgeNet training on the REAL phantom dataset — the learned-C2P run.

The full reference training contract (c2p-net/trainNgeNet.py:25-226) on data
generated from the actual phantom mesh (DataPreparation/run.py:77-312):
real OBJ -> surface sample -> augment -> FPFH+RANSAC+ICP ground truth ->
columnar pickle -> NgeNetPairs train/val streams -> batched SGD with the
saliency schedule -> best-recall checkpoints.

Usage:
  python examples/train_ngenet_real.py [steps] [batch] [ckpt_dir] [pickle]

The pickle is generated on first use (n_points=2048, n_augment=128) and
reused afterwards; pass an existing path to skip generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.pipelines import dataprep
from pointcloudregistration_tpu.pipelines import ngenet as ng
from pointcloudregistration_tpu.train.loop import TrainHooks

_OBJ = ("/root/reference/DataPreparation/OriginalData/"
        "PCMRI_ww25_Cow_v4_final.obj")
N_POINTS = 2048


def ensure_dataset(path: str, n_total: int = 1280, chunk: int = 16,
                   deform_amp: float = 0.0, shapes: str = "real",
                   seed: int = 1) -> str:
    """Generate a phantom corpus through the full dataprep-parity pipeline
    (symmetric-GT gate max_gt_rre_deg=15 active).

    v3 (round 5): `deform_amp>0` applies the smooth modality-disagreement
    field to the PC view before augmentation, so held-out pairs are
    genuinely non-rigid and the NDP stage has real work (VERDICT r04 item
    2; the v2 corpus was rigid + noise only). `shapes="synth"` generates
    from several synthetic vessel trees instead of the real phantom mesh —
    the cross-shape training supplement (VERDICT r04 item 3)."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    print(f"generating {shapes} dataset (deform {deform_amp}) -> {path}",
          flush=True)
    t0 = time.perf_counter()
    if shapes == "real":
        bases = [dataprep.phantom_from_obj(jax.random.PRNGKey(0), _OBJ,
                                           n_points=N_POINTS,
                                           sample_frac=0.5)]
    else:
        from pointcloudregistration_tpu.data import synthetic
        bases = [synthetic.vessel_phantom(
            jax.random.fold_in(jax.random.PRNGKey(7), s), N_POINTS)
            for s in range(6)]
    # chunked generation keeps the vmapped RANSAC ground-truthing within
    # one chip's HBM at 2048 points x 8192 hypotheses
    cfg = dataprep.DataPrepConfig(n_points=N_POINTS, n_augment=chunk,
                                  min_correspondences=500,
                                  deform_amp=deform_amp)
    rows = []
    for c in range(n_total // chunk):
        record = dataprep.generate_dataset(
            jax.random.fold_in(jax.random.PRNGKey(seed), c), cfg,
            base=bases[c % len(bases)])
        rows += dataprep.record_to_rows(record, accepted_only=True)
        print(f"  chunk {c}: {len(rows)} accepted so far "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    from pointcloudregistration_tpu.data import loaders
    loaders.save_ransac_pickle_columnar(path, rows)
    print(f"dataset: {len(rows)}/{n_total} accepted pairs "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    if len(rows) < 16:
        raise SystemExit(f"only {len(rows)} accepted — check the GT stage")
    return path


def load_split(path: str, split: str, cfg: ng.NgeNetTrainConfig, limit=None):
    from pointcloudregistration_tpu.data.mri import NgeNetPairs
    ds = NgeNetPairs(path, split, max_points=cfg.n_points)
    n = len(ds) if limit is None else min(limit, len(ds))
    rows = [ng.sample_from_item(ds[i], cfg) for i in range(n)]
    return ng.stack_samples(rows), n


def load_split_raw(path: str, split: str, cfg: ng.NgeNetTrainConfig,
                   limit=None):
    """Raw padded clouds + GT for the rotation-augmented train step
    (pyramids are rebuilt in-step after the random rotation)."""
    from pointcloudregistration_tpu.data.mri import NgeNetPairs
    ds = NgeNetPairs(path, split, max_points=cfg.n_points)
    n = len(ds) if limit is None else min(limit, len(ds))
    src, sm, tgt, tm, Rs, ts = [], [], [], [], [], []
    for i in range(n):
        it = ds[i]
        s, m1 = ng._pad_cloud(it["src_points"], cfg.n_points)
        t, m2 = ng._pad_cloud(it["tgt_points"], cfg.n_points)
        T = np.asarray(it["transf"], np.float32)
        src.append(s); sm.append(m1); tgt.append(t); tm.append(m2)
        Rs.append(T[:3, :3]); ts.append(T[:3, 3])
    raw = {"src": jnp.asarray(np.stack(src)),
           "src_mask": jnp.asarray(np.stack(sm)),
           "tgt": jnp.asarray(np.stack(tgt)),
           "tgt_mask": jnp.asarray(np.stack(tm)),
           "R_gt": jnp.asarray(np.stack(Rs)),
           "t_gt": jnp.asarray(np.stack(ts))}
    return raw, n


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else "artifacts/ngenet_real_v3"
    pkl = sys.argv[4] if len(sys.argv) > 4 else \
        "artifacts/data/RANSACTraincropped_real_v3.pickle"
    ensure_dataset(pkl, deform_amp=0.05)
    # cross-shape supplement (VERDICT r04 item 3): several synthetic vessel
    # trees join the train stream; val stays real-phantom-only so val
    # recall measures generalization onto the phantom
    cross = os.environ.get("NGENET_CROSS_SHAPE", "1") == "1"
    pkl_synth = None
    if cross:
        pkl_synth = os.path.join(os.path.dirname(pkl) or ".",
                                 "RANSACTraincropped_synth_v3.pickle")
        ensure_dataset(pkl_synth, n_total=768, deform_amp=0.05,
                       shapes="synth", seed=2)

    cfg = ng.NgeNetTrainConfig(n_points=N_POINTS)
    # dense-radius Pallas KPConv path (ops/kpconv_pallas.py) — round 5
    # default: no neighbor tables, light pyramids, ~same semantics with
    # the uncapped radius neighborhoods
    if os.environ.get("NGENET_DENSE", "1") == "1":
        cfg = cfg._replace(model=cfg.model._replace(dense=True))
        print("dense KPConv path ON", flush=True)
    # one-shot neighbor-cap calibration over the dataset
    # (dataloader.py:185-205 contract)
    from pointcloudregistration_tpu.data.mri import NgeNetPairs
    from pointcloudregistration_tpu.ops.pyramid import calibrate_neighbor_caps
    ds0 = NgeNetPairs(pkl, "train", max_points=cfg.n_points)
    clouds = []
    for i in range(min(8, len(ds0))):
        it = ds0[i]
        for k in ("src_points", "tgt_points"):
            clouds.append(ng._pad_cloud(it[k], cfg.n_points))
    cfg = cfg._replace(pyramid=calibrate_neighbor_caps(clouds, cfg.pyramid))
    print(f"calibrated neighbor caps: {cfg.pyramid.neighbor_caps}",
          flush=True)

    train_raw, n_train = load_split_raw(pkl, "train", cfg)
    if pkl_synth is not None:
        synth_raw, n_synth = load_split_raw(pkl_synth, "train", cfg)
        train_raw = {k: jnp.concatenate([train_raw[k], synth_raw[k]], 0)
                     for k in train_raw}
        n_train += n_synth
        print(f"cross-shape: +{n_synth} synthetic-tree pairs", flush=True)
    val_data, n_val = load_split(pkl, "val", cfg, limit=24)
    print(f"train {n_train} pairs, val {n_val} pairs", flush=True)

    key = jax.random.PRNGKey(42)
    state = ng.create_train_state(
        jax.random.fold_in(key, 0), cfg,
        ng.make_sample_arrays(train_raw["src"][0], train_raw["src_mask"][0],
                              train_raw["tgt"][0], train_raw["tgt_mask"][0],
                              train_raw["R_gt"][0], train_raw["t_gt"][0],
                              cfg))
    hooks = TrainHooks(ckpt_dir, ckpt_dir, "ngenet_real", save_every=250)
    state, start = hooks.restore(state)

    # saliency gate survives resume: re-derive from the best recall so far
    # (the reference's gate persists within a run, trainNgeNet.py:217-219)
    w_sal = 0.0
    if hooks.ckpt is not None:
        best = hooks.ckpt._best.get("recall")
        if best is not None and best["value"] > cfg.saliency_recall_gate:
            w_sal = 1.0
    print(f"start step {start}/{steps}, batch {B}, w_sal {w_sal}",
          flush=True)

    rng = np.random.default_rng(1234 + start)
    t0 = time.perf_counter()
    for step in range(start, steps):
        idx = jnp.asarray(rng.choice(n_train, size=B, replace=B > n_train))
        batch = ng.gather_samples(train_raw, idx)
        kl = jax.random.split(jax.random.fold_in(key, step + 2), B)
        state, m = ng.batched_train_step_augmented(state, kl, batch,
                                                   jnp.asarray(w_sal), cfg)
        if step % 25 == 0 or step == steps - 1 or (step + 1) % 250 == 0:
            mf = {k: float(v) for k, v in m.items()}
            if mf["recall"] > cfg.saliency_recall_gate:
                w_sal = 1.0
            mf["w_saliency"] = w_sal
            if step % 100 == 0 or step == steps - 1:
                vm = ng.eval_metrics(state, jax.random.fold_in(key, 1),
                                     val_data, cfg)
                mf.update({f"val_{k}": float(v) for k, v in vm.items()})
            mf["wall_s"] = round(time.perf_counter() - t0, 1)
            hooks.log(step, mf)
            hooks.step_end(step, state, mf, steps)
            print(json.dumps({"step": step,
                              **{k: round(v, 4) for k, v in mf.items()}}),
                  flush=True)
    hooks.close()


if __name__ == "__main__":
    main()
