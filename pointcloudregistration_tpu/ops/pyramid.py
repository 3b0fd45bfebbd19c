"""On-device multi-resolution pyramid for KPConv-style networks.

Replaces the reference's per-batch CPU C++ collate
(c2p-net/ngenet/data/dataloader.py:69-182: grid subsampling + radius
neighbor tables built eagerly with cpp_wrappers, then shipped to GPU) with a
fully jitted builder: every level has a STATIC point capacity and neighbor
count; emptiness is carried in masks. The `calibrate_neighbors` idea
(dataloader.py:185-205: pick the 80th-percentile neighbor count) maps
directly onto the static K caps here.

Levels: level 0 is the first_subsampling_dl grid; each next level doubles
the cell size. Tables per level l:
  neighbors[l]: (N_l, K_l)  in-radius kNN within level l
  pools[l]:     (N_{l+1}, K_l) neighbors of coarse centers among fine points
  upsamples[l]: (N_{l+1} -> N_l) nearest coarse point for each fine point
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.ops import knn as knn_ops
from pointcloudregistration_tpu.ops import subsample as subsample_ops


class PyramidConfig(NamedTuple):
    """Defaults mirror c2p-net/config/MRI.yaml (num_layers 4,
    first_subsampling_dl 0.025, conv_radius 2.5)."""
    num_layers: int = 4
    first_voxel: float = 0.025
    conv_radius: float = 2.5
    capacities: tuple = (2048, 1024, 512, 256)
    neighbor_caps: tuple = (24, 28, 32, 32)


@partial(jax.jit, static_argnames=("cfg", "tables"))
def build_pyramid(points: jax.Array, mask: jax.Array | None,
                  cfg: PyramidConfig = PyramidConfig(),
                  tables: bool = True):
    """points (N, 3) -> dict of per-level tensors (all static shapes).

    Returns dict with lists indexed by level:
      points, masks, neighbors (idx), neighbor_masks,
      pools, pool_masks, upsamples.

    tables=False skips the radius-kNN neighbor/pool tables (only
    points/masks/upsamples are built) — the light pyramid for the dense
    Pallas KPConv path (ops/kpconv_pallas.py), which computes
    neighborhoods on the fly in VMEM and makes the table build (the
    reference's CPU C++ collate, dataloader.py:69-182) unnecessary.
    """
    if mask is None:
        mask = jnp.ones(points.shape[:-1], bool)
    levels_pts, levels_mask = [], []
    p, m = points, mask
    voxel = cfg.first_voxel
    for l in range(cfg.num_layers):
        sub, live = subsample_ops.grid_subsample(p, voxel, cfg.capacities[l],
                                                 m)
        levels_pts.append(sub)
        levels_mask.append(live)
        p, m = sub, live
        voxel *= 2.0

    neighbors, neighbor_masks = [], []
    pools, pool_masks, upsamples = [], [], []
    radius = cfg.first_voxel * cfg.conv_radius
    for l in range(cfg.num_layers):
        pts_l, m_l = levels_pts[l], levels_mask[l]
        if tables:
            d2, idx = knn_ops.knn(pts_l, pts_l, cfg.neighbor_caps[l],
                                  ref_mask=m_l)
            nm = (d2 <= radius * radius) & m_l[:, None]
            neighbors.append(jnp.where(nm, idx, 0))
            neighbor_masks.append(nm)
        if l + 1 < cfg.num_layers:
            pts_n, m_n = levels_pts[l + 1], levels_mask[l + 1]
            if tables:
                # pooling: coarse centers gather fine neighbors, 2x radius
                d2p, idxp = knn_ops.knn(pts_n, pts_l, cfg.neighbor_caps[l],
                                        ref_mask=m_l)
                pm = (d2p <= (2 * radius) ** 2) & m_n[:, None]
                pools.append(jnp.where(pm, idxp, 0))
                pool_masks.append(pm)
            # upsampling: each fine point -> nearest coarse point
            _, up = knn_ops.nn_search(pts_l, pts_n, ref_mask=m_n)
            upsamples.append(up)
        radius *= 2.0

    return {
        "points": levels_pts, "masks": levels_mask,
        "neighbors": neighbors, "neighbor_masks": neighbor_masks,
        "pools": pools, "pool_masks": pool_masks,
        "upsamples": upsamples,
    }


def calibrate_neighbors(sample_pyramids, percentile: float = 80.0):
    """Histogram actual neighbor counts over sample pyramids and suggest
    per-level K caps (reference: dataloader.py:185-205).

    Note: counts here are truncated by the caps the pyramids were built
    with; to pick caps from scratch use `calibrate_neighbor_caps`, which
    counts exact in-radius neighborhoods.
    """
    import numpy as np
    caps = []
    n_levels = len(sample_pyramids[0]["neighbor_masks"])
    for l in range(n_levels):
        counts = np.concatenate([
            np.asarray(p["neighbor_masks"][l].sum(-1)).ravel()
            for p in sample_pyramids])
        caps.append(int(np.percentile(counts[counts > 0], percentile)) + 1)
    return tuple(caps)


def calibrate_neighbor_caps(clouds, cfg: PyramidConfig,
                            percentile: float = 80.0) -> PyramidConfig:
    """Calibration pass over sample clouds: count EXACT in-radius neighbor
    set sizes at every pyramid level (no cap truncation) and return the
    config with per-level caps at the given percentile — the
    calibrate_neighbors contract of the reference
    (c2p-net/ngenet/data/dataloader.py:185-205: 80th-percentile histogram
    over the dataset picks max_nn per layer).

    clouds: iterable of (points (N, 3), mask or None). Host-side one-shot —
    calibration happens once before training, not in the hot path.
    """
    import numpy as np
    counts_per_level: list = [[] for _ in range(cfg.num_layers)]
    for points, mask in clouds:
        pyr = build_pyramid(jnp.asarray(points),
                            None if mask is None else jnp.asarray(mask),
                            cfg)
        radius = cfg.first_voxel * cfg.conv_radius
        for l in range(cfg.num_layers):
            p = np.asarray(pyr["points"][l])
            m = np.asarray(pyr["masks"][l])
            d2 = np.sum((p[:, None] - p[None]) ** 2, -1)
            cnt = ((d2 <= radius * radius) & m[None] & m[:, None]).sum(-1)
            if m.any():
                counts_per_level[l].append(cnt[m])
            radius *= 2.0
    caps = tuple(
        int(np.percentile(np.concatenate(c), percentile)) + 1
        if c else cfg.neighbor_caps[l]
        for l, c in enumerate(counts_per_level))
    return cfg._replace(neighbor_caps=caps)
