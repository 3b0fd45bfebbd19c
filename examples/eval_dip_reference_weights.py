"""Score the reference's OWN pretrained DIP weights on the held-out pairs.

The reference ships trained descriptor checkpoints
(dip/chkpts/{best,final}_dip.pt) — the one direct model-parity artifact it
provides. This loads them into the flax PointNetFeature
(utils/interop.dip_variables_from_torch) and runs the exact same held-out
descriptor-RANSAC evaluation as examples/train_dip_real.py, so
reference-weights vs retrained-weights FMR/RRE are directly comparable.

Usage: python examples/eval_dip_reference_weights.py [ckpt] [pickle]
Writes artifacts/dip_reference/accuracy.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np  # noqa: F401  (evaluate uses np via the shared module)

from pointcloudregistration_tpu.data import loaders
from pointcloudregistration_tpu.pipelines import dip
from pointcloudregistration_tpu.utils.interop import dip_state_from_torch

sys.path.insert(0, os.path.dirname(__file__))
from train_dip_real import evaluate  # noqa: E402


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/dip/chkpts/best_dip.pt"
    pkl = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/data/RANSACTraincropped_real.pickle"
    out_dir = "artifacts/dip_reference"
    os.makedirs(out_dir, exist_ok=True)

    cfg = dip.DIPConfig(n_points=2048)
    rows = loaders.load_ransac_pickle(pkl)
    n_train = int(len(rows) * 0.8)
    test_rows = rows[n_train:]          # identical split to train_dip_real
    print(f"{len(test_rows)} held-out pairs; weights: {ckpt}", flush=True)

    state = dip_state_from_torch(ckpt, cfg)
    summary, results = evaluate(state, test_rows, cfg)
    summary["weights"] = ckpt
    stem = os.path.splitext(os.path.basename(ckpt))[0]
    with open(os.path.join(out_dir, f"accuracy_{stem}.json"), "w") as f:
        json.dump({"summary": summary, "pairs": results}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
