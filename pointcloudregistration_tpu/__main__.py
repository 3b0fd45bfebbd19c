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
    record = dataprep.generate_dataset(_key(args.seed), cfg,
                                       out_path=args.out)
    n_acc = int(record["accepted"].sum())
    print(json.dumps({"samples": len(record["source"]),
                      "accepted": n_acc,
                      "train": int(record["is_train"].sum())}))
    if args.pickle:
        n = dataprep.export_ransac_pickle(record, args.pickle)
        print(f"wrote {n} samples to {args.pickle} (columnar contract)")


def cmd_dip_train(args):
    from pointcloudregistration_tpu.pipelines import dip
    state, hist = dip.train(_key(args.seed), dip.DIPConfig(),
                            steps=args.steps)
    print(json.dumps({"final_loss": float(hist[-1])}))


def cmd_ropnet_train(args):
    from pointcloudregistration_tpu.pipelines import ropnet
    out = ropnet.train(_key(args.seed), ropnet.ROPNetTrainConfig(),
                       steps=args.steps, n_folds=args.folds)
    print(json.dumps({"folds": args.folds, "steps": args.steps}))
    return out


def cmd_ngenet_train(args):
    from pointcloudregistration_tpu.pipelines import ngenet
    state, hist = ngenet.train(_key(args.seed),
                               ngenet.NgeNetTrainConfig(),
                               steps=args.steps)
    print(json.dumps({"final_loss": float(hist[-1])}))


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
    metrics = validation.validate(_key(args.seed), n_pairs=args.pairs)
    print(json.dumps({k: float(v) for k, v in metrics.items()}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="pointcloudregistration_tpu")
    p.add_argument("--seed", type=int, default=0)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dataprep", help="generate augmented TOF/PC pairs")
    d.add_argument("--out", default=None)
    d.add_argument("--pickle", default=None,
                   help="also export the reference's columnar pickle")
    d.add_argument("--n-augment", type=int, default=64)
    d.set_defaults(fn=cmd_dataprep)

    t = sub.add_parser("dip-train", help="train DIP descriptors")
    t.add_argument("--steps", type=int, default=200)
    t.set_defaults(fn=cmd_dip_train)

    r = sub.add_parser("ropnet-train", help="train ROPNet")
    r.add_argument("--steps", type=int, default=100)
    r.add_argument("--folds", type=int, default=1)
    r.set_defaults(fn=cmd_ropnet_train)

    g = sub.add_parser("ngenet-train", help="train NgeNet")
    g.add_argument("--steps", type=int, default=100)
    g.set_defaults(fn=cmd_ngenet_train)

    c = sub.add_parser("c2p", help="run the C2P registration pipeline")
    c.add_argument("--pairs", type=int, default=8)
    c.add_argument("--points", type=int, default=3000)
    c.set_defaults(fn=cmd_c2p)

    v = sub.add_parser("validate", help="validation harness with metrics")
    v.add_argument("--pairs", type=int, default=8)
    v.set_defaults(fn=cmd_validate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
