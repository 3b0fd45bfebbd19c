"""4DMatch-style deformed-pair dataset: generation + loading with GT flow.

The reference's correspondence stage trains on 4DMatch — per-pair `.npz`
archives with keys `s_pc`, `t_pc`, `rot`, `trans`, `s2t_flow`,
`correspondences`, loaded by
c2p-net/deformationpyramid/correspondence/datasets/_4dmatch.py:57-80 with
the semantics `src_deformed = s_pc + s2t_flow` and
`t_pc ~= rot @ src_deformed + trans` (plus an independent scan of the
deformed surface). The raw 4DMatch scans are assets, not code; this module
provides the equivalent *generator* on the synthetic/real phantom (the same
move data/synthetic.py makes for the DataPreparation stage) and a loader
that reads the exact same contract — so the reference's own npz files drop
in unchanged.
"""

from __future__ import annotations

import glob
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import jitter
from pointcloudregistration_tpu.data import synthetic


class FourDMatchConfig(NamedTuple):
    n_points: int = 1024
    deform_amp: float = 0.08
    max_angle_deg: float = 30.0
    max_trans: float = 0.3
    src_noise: float = 0.004
    tgt_noise: float = 0.008
    tgt_dropout: float = 0.35
    corr_radius: float = 0.02      # _4dmatch.py:69 "search radius 0.015 m"
                                   # at 4DMatch's metric scale; unit-cube here


@partial(jax.jit, static_argnames=("cfg",))
def make_deformed_pair(key: jax.Array, cfg: FourDMatchConfig):
    """One deformed pair in the 4DMatch contract (all static shapes).

    Returns dict(s_pc (N,3), t_pc (N,3), t_mask (N,), rot (3,3), trans (3,),
    s2t_flow (N,3), corr_idx (N,) NN index into t_pc at the GT warp,
    corr_mask (N,) radius gate). `s_pc + s2t_flow` is the deformed source
    in the source frame; `rot @ (s_pc + s2t_flow) + trans` lands on the
    target scan (up to the target's own scan noise).
    """
    kshape, kn1, kdef, kse3, kn2, kd, kp = jax.random.split(key, 7)
    base = synthetic.vessel_phantom(kshape, cfg.n_points)
    s_pc = jitter(kn1, base, sigma=cfg.src_noise, clip=3 * cfg.src_noise)

    # smooth low-frequency displacement field evaluated at the source points
    freqs = jax.random.uniform(kdef, (3, 3), minval=1.0, maxval=2.5)
    amps = jax.random.normal(jax.random.fold_in(kdef, 1), (3, 3))
    disp = jnp.stack([
        jnp.sum(amps[i] * jnp.sin(s_pc * freqs[i] * jnp.pi + 0.7 * i), -1)
        for i in range(3)], -1)
    s2t_flow = cfg.deform_amp * disp / 3.0
    deformed = s_pc + s2t_flow

    R, t = se3.random_se3(kse3, (), max_angle_deg=cfg.max_angle_deg,
                          max_trans=cfg.max_trans)
    # independent "scan" of the deformed surface: fresh noise, coverage
    # dropout, and a permutation so correspondence is not the identity
    t_scan = jitter(kn2, se3.transform(deformed, R, t),
                    sigma=cfg.tgt_noise, clip=3 * cfg.tgt_noise)
    centers = jax.random.choice(kd, t_scan, (4,), axis=0)
    d2 = jnp.min(jnp.sum((t_scan[:, None, :] - centers[None]) ** 2, -1), 1)
    t_mask = d2 > (cfg.tgt_dropout * 0.25) ** 2
    perm = jax.random.permutation(kp, cfg.n_points)
    t_pc, t_mask = t_scan[perm], t_mask[perm]

    # GT correspondences: radius-gated NN of the warped source in the scan
    warped = se3.transform(deformed, R, t)
    from pointcloudregistration_tpu.ops import knn as knn_ops
    d2c, corr_idx = knn_ops.nn_search(warped, t_pc, ref_mask=t_mask)
    corr_mask = d2c < cfg.corr_radius ** 2
    return {"s_pc": s_pc, "t_pc": t_pc, "t_mask": t_mask,
            "rot": R, "trans": t, "s2t_flow": s2t_flow,
            "corr_idx": corr_idx, "corr_mask": corr_mask}


def generate_fourdmatch(key: jax.Array, out_dir: str, n_pairs: int,
                        cfg: FourDMatchConfig = FourDMatchConfig(),
                        splits=(("train", 0.7), ("val", 0.15),
                                ("test", 0.15))) -> dict:
    """Persist n_pairs deformed pairs as `<out_dir>/<split>/seq/<i>.npz` in
    the reference loader's contract (_4dmatch.py:45,57-69: glob
    `split/*/*.npz`; keys s_pc/t_pc/rot/trans/s2t_flow/correspondences).
    Returns {split: n_written}."""
    counts = {}
    i = 0
    for split, frac in splits:
        n = max(int(round(n_pairs * frac)), 1)
        d = os.path.join(out_dir, split, "seq0")
        os.makedirs(d, exist_ok=True)
        for _ in range(n):
            pair = make_deformed_pair(jax.random.fold_in(key, i), cfg)
            corr_mask = np.asarray(pair["corr_mask"])
            corr = np.stack([np.nonzero(corr_mask)[0],
                             np.asarray(pair["corr_idx"])[corr_mask]],
                            1).astype(np.int64)
            np.savez_compressed(
                os.path.join(d, f"pair_{i:05d}.npz"),
                s_pc=np.asarray(pair["s_pc"], np.float32),
                t_pc=np.asarray(pair["t_pc"], np.float32),
                rot=np.asarray(pair["rot"], np.float32),
                trans=np.asarray(pair["trans"], np.float32),
                s2t_flow=np.asarray(pair["s2t_flow"], np.float32),
                correspondences=corr,
                t_mask=np.asarray(pair["t_mask"], bool))
            i += 1
        counts[split] = n
    return counts


class FourDMatchPairs:
    """Loader for 4DMatch-contract npz directories (the reference's own
    files or `generate_fourdmatch` output). Mirrors _4dmatch.py:45-80:
    entries from `<root>/<split>/*/*.npz`, per-item dict with the npz keys
    (+ a full t_mask when absent in reference files)."""

    def __init__(self, root: str, split: str = "train",
                 max_points: int | None = None, seed: int = 0):
        assert split in ("train", "val", "test"), split
        self.entries = sorted(
            glob.glob(os.path.join(root, split, "*", "*.npz")))
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i: int) -> dict:
        with np.load(self.entries[i]) as e:
            out = {
                "s_pc": np.asarray(e["s_pc"], np.float32),
                "t_pc": np.asarray(e["t_pc"], np.float32),
                "rot": np.asarray(e["rot"], np.float32),
                "trans": np.asarray(e["trans"], np.float32).reshape(3),
                "s2t_flow": np.asarray(e["s2t_flow"], np.float32),
                "correspondences": np.asarray(e["correspondences"],
                                              np.int64),
                "t_mask": (np.asarray(e["t_mask"], bool)
                           if "t_mask" in e
                           else np.ones(len(e["t_pc"]), bool)),
            }
        if self.max_points and len(out["s_pc"]) > self.max_points:
            sel = self.rng.permutation(len(out["s_pc"]))[:self.max_points]
            keep = np.zeros(len(out["s_pc"]), bool)
            keep[sel] = True
            remap = np.cumsum(keep) - 1
            out["s_pc"] = out["s_pc"][keep]
            out["s2t_flow"] = out["s2t_flow"][keep]
            c = out["correspondences"]
            ck = keep[c[:, 0]]
            out["correspondences"] = np.stack(
                [remap[c[ck, 0]], c[ck, 1]], 1)
        return out
