"""Multiview deformed-scene dataset: generation + loading, view-graph pairs.

Capability parity with the reference's multiview correspondence data
(c2p-net/deformationpyramid/correspondence/datasets/_4dmatch_multiview.py):
per-scene `.npz` archives with keys

    pcds             (V, N, 3)  per-view clouds, each in its own scan pose
    pcd_pairs        (E, 2)     view-graph edges (source view, target view)
    pairwise_flows   (E, N, 3)  GT flow per edge, in the SOURCE view frame:
                                R_e @ (pcds[src] + flow) + t_e ~ target
                                surface (the reference's stated contract,
                                _4dmatch_multiview.py:103 "R*(Ps+flow)+t=Pt")
    pairwise_overlap (E, 2)     src-side / tgt-side overlap fractions
    _2axis_flow      (V, N, 3)  flow of every view to the canonical (axis)
                                view's surface, in each view's own frame
    axis_node        ()         index of the canonical view
    poses            (E, 4, 4)  per-edge relative SE(3)

and a loader that filters edges by overlap threshold on BOTH sides
(_4dmatch_multiview.py:92-97, threshold 0.15) — so the reference's own
archives drop in unchanged.

The raw multiview scans are assets this environment does not ship; the
generator synthesizes scenes from the vessel phantom: V deformed "takes"
of one underlying surface (per-view smooth displacement fields + scan
poses + noise), which makes every pairwise flow exact by construction.
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


class MultiviewConfig(NamedTuple):
    n_views: int = 4
    n_points: int = 768
    deform_amp: float = 0.08
    max_angle_deg: float = 25.0
    max_trans: float = 0.25
    scan_noise: float = 0.004
    overlap_radius: float = 0.0375   # _4dmatch_multiview.py:40
    # view graph: chain + skip edges (consecutive takes overlap most)
    max_edge_span: int = 2


def _deform_field(key: jax.Array, pts: jax.Array, amp: float) -> jax.Array:
    """Smooth low-frequency displacement field (same family as
    fourdmatch.make_deformed_pair)."""
    freqs = jax.random.uniform(key, (3, 3), minval=1.0, maxval=2.5)
    amps = jax.random.normal(jax.random.fold_in(key, 1), (3, 3))
    disp = jnp.stack([
        jnp.sum(amps[i] * jnp.sin(pts * freqs[i] * jnp.pi + 0.7 * i), -1)
        for i in range(3)], -1)
    return amp * disp / 3.0


def view_graph_edges(n_views: int, max_span: int) -> np.ndarray:
    """Directed chain+skip edges: (i, j) for 0 < j - i <= max_span."""
    edges = [(i, j) for i in range(n_views)
             for j in range(i + 1, min(i + max_span, n_views - 1) + 1)]
    return np.asarray(edges, np.int64)


@partial(jax.jit, static_argnames=("cfg",))
def make_scene(key: jax.Array, cfg: MultiviewConfig = MultiviewConfig()):
    """One multiview scene; all arrays static-shape.

    Every view samples the SAME base points, so the surface-to-surface map
    between any two views is known exactly: deformed_j(base) observed under
    pose_j. Edge flow (in view i's frame) = R_i (deformed_j - deformed_i),
    edge pose = pose_j . pose_i^{-1} restricted to the deformed-i frame.
    """
    kbase, krest = jax.random.split(key)
    base = synthetic.vessel_phantom(kbase, cfg.n_points)
    vkeys = jax.random.split(krest, cfg.n_views)

    def one_view(vk, v_idx):
        kd, ks, kn = jax.random.split(vk, 3)
        # canonical view (index 0) is undeformed; others deform smoothly
        flow = _deform_field(kd, base, cfg.deform_amp) \
            * jnp.minimum(v_idx, 1.0)
        deformed = base + flow
        R, t = se3.random_se3(ks, (), max_angle_deg=cfg.max_angle_deg,
                              max_trans=cfg.max_trans)
        scan = jitter(kn, se3.transform(deformed, R, t),
                      sigma=cfg.scan_noise, clip=3 * cfg.scan_noise)
        return scan, deformed, R, t

    idxs = jnp.arange(cfg.n_views, dtype=jnp.float32)
    pcds, deformed, Rs, ts = jax.vmap(one_view)(vkeys, idxs)

    edges = jnp.asarray(view_graph_edges(cfg.n_views, cfg.max_edge_span))

    def one_edge(e):
        i, j = e[0], e[1]
        # view-i scan points: R_i d_i + t_i. Flow in the SOURCE VIEW frame
        # carries the surface from take i to take j: adding it to the scan
        # then applying the relative pose lands on view j's scan of the
        # same base point — R*(Ps+flow)+t = Pt exactly.
        d_i, d_j = deformed[i], deformed[j]
        R_i, t_i = Rs[i], ts[i]
        R_j, t_j = Rs[j], ts[j]
        flow = jnp.einsum("ij,nj->ni", R_i, d_j - d_i)
        # relative pose: x_j = R_j R_i^T (x_i - t_i) + t_j
        R_rel = R_j @ R_i.T
        t_rel = t_j - R_rel @ t_i
        pose = jnp.eye(4).at[:3, :3].set(R_rel).at[:3, 3].set(t_rel)
        # overlap fractions: how much of each side has a counterpart within
        # the overlap radius after the GT carry. Source side uses the exact
        # per-point correspondence (same base surface); target side is the
        # NN distance from each target scan point back to the carried set.
        # NOTE: because every view samples the full base surface, both
        # fractions are ~1.0 by construction for generated scenes — the
        # loader's 0.15 both-side filter only bites on external archives.
        carried = se3.transform(se3.transform(d_i, R_i, t_i) + flow,
                                R_rel, t_rel)
        d2 = jnp.sum((carried - pcds[j]) ** 2, -1)
        ov_src = jnp.mean(d2 < cfg.overlap_radius ** 2)
        d2_tgt = jnp.min(
            jnp.sum((pcds[j][:, None] - carried[None]) ** 2, -1), axis=1)
        ov_tgt = jnp.mean(d2_tgt < cfg.overlap_radius ** 2)
        return flow, pose, jnp.stack([ov_src, ov_tgt])

    flows, poses, overlaps = jax.vmap(one_edge)(edges)

    # per-view flow to the canonical (axis) view, in each view's own frame
    axis = jnp.asarray(0, jnp.int32)
    to_axis = jax.vmap(
        lambda v: jnp.einsum("ij,nj->ni", Rs[v], deformed[axis] - deformed[v])
    )(jnp.arange(cfg.n_views))

    return {"pcds": pcds, "pcd_pairs": edges, "pairwise_flows": flows,
            "pairwise_overlap": overlaps, "_2axis_flow": to_axis,
            "axis_node": axis, "poses": poses}


def generate_multiview(key: jax.Array, out_dir: str, n_scenes: int,
                       cfg: MultiviewConfig = MultiviewConfig()) -> list[str]:
    """Write n_scenes archives in the reference contract; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_scenes):
        scene = make_scene(jax.random.fold_in(key, i), cfg)
        path = os.path.join(out_dir, f"scene_{i:04d}.npz")
        np.savez_compressed(path, **{k: np.asarray(v)
                                     for k, v in scene.items()})
        paths.append(path)
    return paths


class MultiviewScenes:
    """Loader for the reference's multiview npz contract.

    Filters view-graph edges by overlap threshold on both sides
    (_4dmatch_multiview.py:92-97); returns numpy dicts.

    Deliberate deviation: the reference loader returns `poses` UNFILTERED
    (indexed by original edge id) while filtering pcd_pairs/flows — a
    consumer must remember the pre-filter indices to pair them up. Here
    `poses` is filtered by the same keep-mask so every returned array is
    row-aligned with `pcd_pairs`; self-consistent, but index-based
    consumers written against the reference contract should be aware.
    """

    def __init__(self, root: str, overlap_threshold: float = 0.15):
        self.entries = sorted(glob.glob(os.path.join(root, "**/*.npz"),
                                        recursive=True))
        self.overlap_threshold = overlap_threshold

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, i: int) -> dict:
        e = np.load(self.entries[i], allow_pickle=True)
        ov = e["pairwise_overlap"]
        keep = (ov[:, 0] > self.overlap_threshold) \
            & (ov[:, 1] > self.overlap_threshold)
        return {
            "pcds": e["pcds"],
            "pcd_pairs": e["pcd_pairs"][keep],
            "pairwise_flows": e["pairwise_flows"][keep],
            "pairwise_overlap": ov[keep],
            "_2axis_flow": e["_2axis_flow"],
            "axis_node": int(e["axis_node"]),
            "poses": e["poses"][keep],
        }
