"""Unified CLI — the L7 entry-point layer.

One command with subcommands replaces the reference's per-project scripts
(DataPreparation/run.py, dip/train.py + demo.py, ROPNet/src/train.py +
eval.py, c2p-net/trainNgeNet.py + testScript.py + validationScript.py):

    python -m pointcloudregistration_tpu dataprep --out data.npz
    python -m pointcloudregistration_tpu dip-train --steps 200
    python -m pointcloudregistration_tpu ropnet-train --steps 100 --folds 5
    python -m pointcloudregistration_tpu ngenet-train --steps 100
    python -m pointcloudregistration_tpu c2p --pairs 8 --points 3000
    python -m pointcloudregistration_tpu validate --pairs 8

YAML configs are accepted anywhere via --config (utils/config.py replaces
the reference's three config styles).
"""

from __future__ import annotations

import argparse
import json


def _key(seed: int):
    import jax
    return jax.random.PRNGKey(seed)


def cmd_dataprep(args):
    from pointcloudregistration_tpu.pipelines import dataprep
    cfg = dataprep.DataPrepConfig(n_augment=args.n_augment)
    base = None
    if args.obj:
        base = dataprep.phantom_from_obj(_key(args.seed + 1), args.obj,
                                         n_points=cfg.n_points)
    qc_state = None
    if args.qc_steps:
        qc_state, _ = dataprep.train_pointnet_qc(_key(args.seed + 2),
                                                 steps=args.qc_steps)
    record = dataprep.generate_dataset(_key(args.seed), cfg,
                                       out_path=args.out, base=base,
                                       qc_state=qc_state)
    n_acc = int(record["accepted"].sum())
    print(json.dumps({"samples": len(record["source"]),
                      "accepted": n_acc,
                      "qc_kept": int(record["qc_keep"].sum()),
                      "train": int(record["is_train"].sum())}))
    if args.pickle:
        if args.gt == "ransac":
            n = dataprep.export_ransac_pickle(record, args.pickle)
        else:
            # CPD re-ground-truthing of the RANSAC-aligned pairs
            # (DataPreparation/CPD.py:26-73)
            rows_in = [{"source": record["source"][i],
                        "target": record["target"][i],
                        "transformation": record["transformation"][i]}
                       for i in range(len(record["source"]))
                       if record["accepted"][i]]
            rows = dataprep.cpd_ground_truth(
                _key(args.seed + 3), rows_in, args.gt.split("_", 1)[1],
                out_path=args.pickle)
            n = len(rows)
        print(f"wrote {n} samples to {args.pickle} ({args.gt} GT)")


def _dip_cfg(small: bool):
    from pointcloudregistration_tpu.pipelines import dip
    cfg = dip.DIPConfig()
    if small:
        cfg = cfg._replace(n_points=256, n_anchors=32, patch_size=64,
                           lrf_k=32)
    return cfg


def _ropnet_cfg(small: bool):
    from pointcloudregistration_tpu.models.ropnet import ROPNetConfig
    from pointcloudregistration_tpu.pipelines import ropnet
    cfg = ropnet.ROPNetTrainConfig()
    if small:
        cfg = cfg._replace(n_points=256, model=ROPNetConfig(
            N1=96, M1=128, num_neighbors=16, feat_dim=64))
    return cfg


def _ngenet_cfg(small: bool):
    from pointcloudregistration_tpu.models.ngenet import NgeNetConfig
    from pointcloudregistration_tpu.ops.pyramid import PyramidConfig
    from pointcloudregistration_tpu.pipelines import ngenet
    cfg = ngenet.NgeNetTrainConfig()
    if small:
        cfg = cfg._replace(
            model=NgeNetConfig(first_feats_dim=32, final_feats_dim=16,
                               gnn_feats_dim=64, first_subsampling_dl=0.04,
                               dgcnn_k=6, ppf_k=16),
            pyramid=PyramidConfig(num_layers=4, first_voxel=0.04,
                                  capacities=(512, 256, 128, 64),
                                  neighbor_caps=(16, 16, 16, 16)),
            n_points=768)
    return cfg


def cmd_dip_train(args):
    from pointcloudregistration_tpu.pipelines import dip
    state, hist = dip.train(_key(args.seed), _dip_cfg(args.small),
                            steps=args.steps, ckpt_dir=args.ckpt_dir,
                            log_dir=args.log_dir, resume=args.resume)
    print(json.dumps({"steps": args.steps,
                      "final_loss": float(hist[-1]["loss"]),
                      "final_chamfer": float(hist[-1]["chamfer"])}))


def cmd_ropnet_train(args):
    from pointcloudregistration_tpu.pipelines import ropnet
    states, history = ropnet.train(
        _key(args.seed), _ropnet_cfg(args.small), steps=args.steps,
        n_folds=args.folds, data=args.data, ckpt_dir=args.ckpt_dir,
        log_dir=args.log_dir, resume=args.resume)
    last = next(h for h in reversed(history[-1]) if "loss" in h)
    print(json.dumps({"folds": args.folds, "steps": args.steps,
                      "final_loss": float(last["loss"]),
                      "final_rre_deg": float(last["rre"])}))


def cmd_ngenet_train(args):
    from pointcloudregistration_tpu.pipelines import ngenet
    state, hist = ngenet.train(_key(args.seed), _ngenet_cfg(args.small),
                               steps=args.steps, data=args.data,
                               ckpt_dir=args.ckpt_dir, log_dir=args.log_dir,
                               resume=args.resume)
    print(json.dumps({"steps": args.steps,
                      "final_loss": float(hist[-1]["loss"]),
                      "final_recall": float(hist[-1]["recall"])}))


def _lepard_cfg(small: bool):
    from pointcloudregistration_tpu.models.lepard import LepardConfig
    from pointcloudregistration_tpu.ops.pyramid import PyramidConfig
    from pointcloudregistration_tpu.pipelines import lepard
    cfg = lepard.LepardTrainConfig()
    if small:
        cfg = cfg._replace(
            model=LepardConfig(feat_dim=32, nhead=2, voxel=0.08),
            pyramid=PyramidConfig(num_layers=4, first_voxel=0.04,
                                  capacities=(256, 128, 64, 32),
                                  neighbor_caps=(12, 12, 12, 12)),
            backbone_feats=16, n_points=256)
    return cfg


def cmd_lepard_train(args):
    from pointcloudregistration_tpu.pipelines import lepard
    state, hist = lepard.train(_key(args.seed), _lepard_cfg(args.small),
                               steps=args.steps, data=args.data,
                               ckpt_dir=args.ckpt_dir, log_dir=args.log_dir,
                               resume=args.resume)
    print(json.dumps({"steps": args.steps,
                      "final_loss": float(hist[-1]["loss"]),
                      "final_match_recall":
                          float(hist[-1]["match_recall"])}))


def cmd_fourdmatch(args):
    if args.multiview:
        from pointcloudregistration_tpu.data import multiview
        paths = multiview.generate_multiview(
            _key(args.seed), args.out, args.multiview,
            multiview.MultiviewConfig(n_points=args.points))
        print(json.dumps({"out": args.out, "scenes": len(paths)}))
        return
    from pointcloudregistration_tpu.data import fourdmatch
    counts = fourdmatch.generate_fourdmatch(
        _key(args.seed), args.out, args.pairs,
        fourdmatch.FourDMatchConfig(n_points=args.points))
    print(json.dumps({"out": args.out, **counts}))


def cmd_c2p(args):
    import jax.numpy as jnp
    from pointcloudregistration_tpu.data import synthetic
    from pointcloudregistration_tpu.pipelines import c2p
    key = _key(args.seed)
    data = synthetic.make_batch(key, args.pairs, n_points=args.points,
                                deform_amp=0.05)
    out = c2p.register_batch(key, data["source"], data["target"],
                             data["source_mask"], data["target_mask"],
                             c2p.C2PConfig())
    print(json.dumps({
        "pairs": args.pairs,
        "chamfer_rigid": float(jnp.mean(out["chamfer_rigid"])),
        "chamfer_nonrigid": float(jnp.mean(out["chamfer_nonrigid"])),
    }))


def cmd_validate(args):
    from pointcloudregistration_tpu.pipelines import validation
    result = validation.validate(_key(args.seed), n_pairs=args.pairs,
                                 n_points=args.points)
    print(json.dumps({"pairs": args.pairs, **result["mean"]}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="pointcloudregistration_tpu")
    p.add_argument("--seed", type=int, default=0)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dataprep", help="generate augmented TOF/PC pairs")
    d.add_argument("--out", default=None)
    d.add_argument("--pickle", default=None,
                   help="also export the reference's columnar pickle")
    d.add_argument("--n-augment", type=int, default=64)
    d.add_argument("--obj", default=None,
                   help="real phantom OBJ mesh to ingest (run.py:77-117 "
                        "head) instead of the synthetic vessel tree")
    d.add_argument("--gt", default="ransac",
                   choices=["ransac", "cpd_rigid", "cpd_affine",
                            "cpd_nonrigid"],
                   help="ground-truthing method for --pickle export")
    d.add_argument("--qc-steps", type=int, default=0,
                   help="train the PointNet-QC confidence filter for N "
                        "steps before filtering (Pointnet.py:69-226)")
    d.set_defaults(fn=cmd_dataprep)

    def train_flags(sp, data_flag=True):
        sp.add_argument("--steps", type=int, default=100)
        sp.add_argument("--small", action="store_true",
                        help="tiny config (CI/smoke)")
        sp.add_argument("--ckpt-dir", default=None,
                        help="Orbax checkpoint directory")
        sp.add_argument("--log-dir", default=None,
                        help="jsonl/TensorBoard metric directory")
        sp.add_argument("--resume", action="store_true",
                        help="restore latest checkpoint from --ckpt-dir")
        if data_flag:
            sp.add_argument("--data", default=None,
                            help="RANSACData pickle to train on "
                                 "(default: synthetic stream)")

    t = sub.add_parser("dip-train", help="train DIP descriptors")
    train_flags(t, data_flag=False)
    t.set_defaults(fn=cmd_dip_train)

    r = sub.add_parser("ropnet-train", help="train ROPNet")
    train_flags(r)
    r.add_argument("--folds", type=int, default=1)
    r.set_defaults(fn=cmd_ropnet_train)

    g = sub.add_parser("ngenet-train", help="train NgeNet")
    train_flags(g)
    g.set_defaults(fn=cmd_ngenet_train)

    le = sub.add_parser("lepard-train",
                        help="train the Lepard landmark matcher")
    train_flags(le)
    le.set_defaults(fn=cmd_lepard_train)

    fd = sub.add_parser("fourdmatch",
                        help="generate a 4DMatch-contract deformed-pair "
                             "dataset (npz per pair with GT flow)")
    fd.add_argument("--out", required=True)
    fd.add_argument("--pairs", type=int, default=64)
    fd.add_argument("--points", type=int, default=1024)
    fd.add_argument("--seed", type=int, default=0)
    fd.add_argument("--multiview", type=int, default=0, metavar="N_SCENES",
                    help="generate N multiview scenes "
                         "(_4dmatch_multiview.py contract) instead")
    fd.set_defaults(fn=cmd_fourdmatch)

    c = sub.add_parser("c2p", help="run the C2P registration pipeline")
    c.add_argument("--pairs", type=int, default=8)
    c.add_argument("--points", type=int, default=3000)
    c.set_defaults(fn=cmd_c2p)

    v = sub.add_parser("validate", help="validation harness with metrics")
    v.add_argument("--pairs", type=int, default=8)
    v.add_argument("--points", type=int, default=3000)
    v.set_defaults(fn=cmd_validate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
