"""Qualitative visualization + inspection-mesh utilities (headless).

Capability parity with the reference's visualization stack —
``deformationpyramid/utils/vis.py:11-67`` (visualize_pcds /
visualize_pcds_list, rigidity coloring), ``utils/vis.py:147-198``
(node_o3d_spheres), ``utils/vis.py:200-213`` (save_grayscale_image),
``utils/vis.py:670-704`` (merge_meshes) and
``deformationpyramid/utils/line_mesh.py:38-103`` (LineMesh cylinder
correspondence lines) — re-designed for a headless TPU environment:

- The reference renders through mayavi/Open3D interactive windows, which
  need a display and a GPU GL stack. Here every view renders to a PNG via
  matplotlib's Agg backend (multi-view 3-D scatter panels), and every
  mesh export is a plain ASCII-PLY triangle mesh any viewer opens, so the
  artifacts travel from a TPU pod to a laptop.
- Mesh construction (cylinders between correspondence pairs, spheres at
  deformation-graph nodes) is vectorized numpy instead of per-segment
  Open3D primitive objects: one (S, V, 3) batch of transformed template
  vertices, then a single merged (N, 3)/(M, 3) mesh.

Chart conventions: fixed categorical colors (source=blue, target=orange,
warped=purple — never cycled), sequential viridis for magnitudes
(displacement, rigidity), one axis per panel, legends whenever two or
more clouds share a panel.
"""

from __future__ import annotations

import os

import numpy as np

# Fixed categorical assignment (identity of each cloud, never re-ordered).
SRC_COLOR = "#3f7bd9"      # source: blue
TGT_COLOR = "#e08a2e"      # target: orange
WARPED_COLOR = "#9065cf"   # warped/deformed source: purple
_CAT = (SRC_COLOR, TGT_COLOR, WARPED_COLOR, "#4da7a0", "#c95f7d", "#8a8f98")


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def _as_np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _equal_aspect(ax, pts: np.ndarray) -> None:
    lo, hi = pts.min(0), pts.max(0)
    c, r = (lo + hi) / 2, float((hi - lo).max()) / 2 + 1e-6
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)


# ---------------------------------------------------------------------------
# PNG panels (the mayavi/o3d window equivalents)
# ---------------------------------------------------------------------------

_VIEWS = ((20, -60), (20, 30), (75, -90))   # three orbits around the cloud


def visualize_pcds(src_pcd=None, tgt_pcd=None, warped_pcd=None,
                   rigidity=None, path: str = "pcds.png",
                   point_size: float = 1.5, title: str | None = None) -> str:
    """Three-view scatter panel of source / target / warped clouds.

    Mirrors ``vis.py:11-47``: any subset of the three clouds; when
    ``rigidity`` (per-warped-point scalar in [0, 1]) is given, the warped
    cloud is colored by it (sequential ramp) instead of its identity
    color. Returns the written path.
    """
    plt = _mpl()
    clouds = [(name, _as_np(p), col) for name, p, col in
              (("source", src_pcd, SRC_COLOR), ("target", tgt_pcd, TGT_COLOR),
               ("warped", warped_pcd, WARPED_COLOR)) if p is not None]
    if not clouds:
        raise ValueError("no clouds given")
    allpts = np.concatenate([p for _, p, _ in clouds], 0)
    fig = plt.figure(figsize=(4 * len(_VIEWS), 4.2))
    for vi, (elev, azim) in enumerate(_VIEWS):
        ax = fig.add_subplot(1, len(_VIEWS), vi + 1, projection="3d")
        mappable = None
        for name, p, col in clouds:
            if name == "warped" and rigidity is not None:
                r = _as_np(rigidity).reshape(-1)
                mappable = ax.scatter(p[:, 0], p[:, 1], p[:, 2], c=r,
                                      cmap="viridis", vmin=0.0, vmax=1.0,
                                      s=point_size, label="warped (rigidity)")
            else:
                ax.scatter(p[:, 0], p[:, 1], p[:, 2], color=col,
                           s=point_size, label=name)
        ax.view_init(elev=elev, azim=azim)
        _equal_aspect(ax, allpts)
        ax.set_axis_off()
        if vi == 0 and len(clouds) > 1:
            ax.legend(loc="upper left", fontsize=8, markerscale=4)
        if mappable is not None and vi == len(_VIEWS) - 1:
            fig.colorbar(mappable, ax=ax, shrink=0.6, label="rigidity")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def visualize_pcds_list(pcd_list, path: str = "pcds.png",
                        labels=None, point_size: float = 1.5) -> str:
    """Overlay an arbitrary list of clouds, fixed categorical colors
    (``vis.py:49-67``); >6 clouds fold into the last ('other') color."""
    plt = _mpl()
    pcds = [_as_np(p) for p in pcd_list]
    labels = labels or [f"cloud {i}" for i in range(len(pcds))]
    allpts = np.concatenate(pcds, 0)
    fig = plt.figure(figsize=(4 * len(_VIEWS), 4.2))
    for vi, (elev, azim) in enumerate(_VIEWS):
        ax = fig.add_subplot(1, len(_VIEWS), vi + 1, projection="3d")
        for i, p in enumerate(pcds):
            ax.scatter(p[:, 0], p[:, 1], p[:, 2],
                       color=_CAT[min(i, len(_CAT) - 1)], s=point_size,
                       label=labels[i] if i < 8 else None)
        ax.view_init(elev=elev, azim=azim)
        _equal_aspect(ax, allpts)
        ax.set_axis_off()
        if vi == 0 and len(pcds) > 1:
            ax.legend(loc="upper left", fontsize=8, markerscale=4)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_correspondences(src, tgt, pairs, inlier_mask=None,
                         path: str = "corr.png", max_lines: int = 256,
                         point_size: float = 1.0) -> str:
    """Correspondence lines between two clouds (the LineMesh use case,
    ``line_mesh.py:38-103`` / ``validationScript.py:300-320``, as a PNG).

    ``pairs`` is (K, 2) int indices into src/tgt. Inliers draw in the
    warped color, outliers in muted gray dashes.
    """
    plt = _mpl()
    src, tgt = _as_np(src), _as_np(tgt)
    pairs = np.asarray(pairs, np.int64)
    if inlier_mask is None:
        inlier_mask = np.ones((pairs.shape[0],), bool)
    inlier_mask = np.asarray(inlier_mask, bool)
    if pairs.shape[0] > max_lines:
        sel = np.linspace(0, pairs.shape[0] - 1, max_lines).astype(np.int64)
        pairs, inlier_mask = pairs[sel], inlier_mask[sel]
    allpts = np.concatenate([src, tgt], 0)
    fig = plt.figure(figsize=(4 * len(_VIEWS), 4.2))
    for vi, (elev, azim) in enumerate(_VIEWS):
        ax = fig.add_subplot(1, len(_VIEWS), vi + 1, projection="3d")
        ax.scatter(*src.T, color=SRC_COLOR, s=point_size, label="source")
        ax.scatter(*tgt.T, color=TGT_COLOR, s=point_size, label="target")
        for k in range(pairs.shape[0]):
            a, b = src[pairs[k, 0]], tgt[pairs[k, 1]]
            ok = bool(inlier_mask[k])
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                    color=WARPED_COLOR if ok else "#8a8f98",
                    lw=0.7 if ok else 0.4, ls="-" if ok else ":",
                    alpha=0.8 if ok else 0.5)
        ax.view_init(elev=elev, azim=azim)
        _equal_aspect(ax, allpts)
        ax.set_axis_off()
        if vi == 0:
            ax.legend(loc="upper left", fontsize=8, markerscale=4)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_deformation(src, warped, path: str = "deform.png",
                     point_size: float = 2.0) -> str:
    """Warped cloud colored by displacement magnitude (sequential ramp) —
    the deformation-inspection view of ``vis.py:11-47``."""
    plt = _mpl()
    src, warped = _as_np(src), _as_np(warped)
    mag = np.linalg.norm(warped - src, axis=-1)
    fig = plt.figure(figsize=(4 * len(_VIEWS), 4.2))
    for vi, (elev, azim) in enumerate(_VIEWS):
        ax = fig.add_subplot(1, len(_VIEWS), vi + 1, projection="3d")
        m = ax.scatter(*warped.T, c=mag, cmap="viridis", s=point_size)
        ax.view_init(elev=elev, azim=azim)
        _equal_aspect(ax, warped)
        ax.set_axis_off()
        if vi == len(_VIEWS) - 1:
            fig.colorbar(m, ax=ax, shrink=0.6, label="|displacement|")
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_ndp_history(history, path: str = "ndp_history.png") -> str:
    """Per-level NDP loss curves (the ``NDP_loss_history`` export of
    ``validationScript.py:325-333``, rendered). ``history`` is a
    (levels, iters) array, NaN/0-padded past each level's early stop;
    level index is ordinal, so a single-hue sequential ramp encodes it."""
    plt = _mpl()
    h = np.asarray(history, np.float32)
    fig, ax = plt.subplots(figsize=(6, 3.6))
    cmap = plt.get_cmap("viridis")
    L = h.shape[0]
    for lvl in range(L):
        row = h[lvl]
        valid = np.isfinite(row) & (row != 0)
        if not valid.any():
            continue
        ax.plot(np.arange(row.shape[0])[valid], row[valid],
                color=cmap(lvl / max(L - 1, 1)), lw=1.5,
                label=f"level {lvl}" if L <= 10 else None)
    ax.set_xlabel("iteration")
    ax.set_ylabel("data-term loss")
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(alpha=0.25, lw=0.5)
    if L > 1:
        ax.legend(fontsize=7, ncols=2)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_grayscale_image(path: str, image: np.ndarray) -> str:
    """uint8 PNG from a float [0,1] or uint8 HxW array (``vis.py:200-213``)."""
    plt = _mpl()
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.imsave(path, img, cmap="gray", vmin=0, vmax=255)
    return path


# ---------------------------------------------------------------------------
# Inspection meshes (ASCII PLY; the o3d TriangleMesh equivalents)
# ---------------------------------------------------------------------------

def write_ply_mesh(path: str, verts: np.ndarray, faces: np.ndarray,
                   colors: np.ndarray | None = None) -> str:
    """ASCII-PLY triangle mesh writer (vertex colors optional, uint8)."""
    verts = _as_np(verts)
    faces = np.asarray(faces, np.int64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {verts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {faces.shape[0]}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if colors is None:
            for v in verts:
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        else:
            c = np.asarray(colors)
            if c.dtype != np.uint8:
                c = (np.clip(c, 0, 1) * 255).astype(np.uint8)
            if c.ndim == 1 or c.shape[0] == 1:
                c = np.broadcast_to(c.reshape(1, 3), (verts.shape[0], 3))
            for v, rgb in zip(verts, c):
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                        f"{rgb[0]} {rgb[1]} {rgb[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    return path


def _hex_rgb(h: str) -> np.ndarray:
    h = h.lstrip("#")
    return np.array([int(h[i:i + 2], 16) for i in (0, 2, 4)], np.uint8)


def line_mesh(p0, p1, radius: float = 0.002, sides: int = 6,
              color: str | np.ndarray = WARPED_COLOR):
    """Cylinder triangle mesh for a batch of line segments.

    The ``LineMesh`` capability (``line_mesh.py:38-103``: Open3D can't
    draw thick 3-D lines, so lines become cylinder meshes) — vectorized:
    one (S, sides, 3) ring batch at each end instead of per-segment
    primitive objects + per-segment rotation alignment.

    Returns ``(verts (S*2*sides, 3), faces (S*2*sides, 3), colors)``.
    """
    p0, p1 = _as_np(p0), _as_np(p1)
    S = p0.shape[0]
    d = p1 - p0
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    axis = d / np.maximum(length, 1e-12)
    # Orthonormal frame per segment (pick the most orthogonal basis vector).
    ref = np.where(np.abs(axis[:, :1]) < 0.9,
                   np.array([[1.0, 0.0, 0.0]], np.float32),
                   np.array([[0.0, 1.0, 0.0]], np.float32))
    u = np.cross(axis, ref)
    u /= np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = np.cross(axis, u)
    ang = (2 * np.pi / sides) * np.arange(sides, dtype=np.float32)
    ring = (np.cos(ang)[None, :, None] * u[:, None, :] +
            np.sin(ang)[None, :, None] * v[:, None, :]) * radius  # (S,k,3)
    bottom = p0[:, None, :] + ring
    top = p1[:, None, :] + ring
    verts = np.concatenate([bottom, top], 1).reshape(S * 2 * sides, 3)
    # Faces: quad (i, i+1) bottom ring -> top ring, two triangles each.
    i = np.arange(sides)
    j = (i + 1) % sides
    base = (np.arange(S) * 2 * sides)[:, None]
    b0, b1 = base + i, base + j
    t0, t1 = base + sides + i, base + sides + j
    f1 = np.stack([b0, b1, t1], -1)
    f2 = np.stack([b0, t1, t0], -1)
    faces = np.concatenate([f1, f2], 1).reshape(-1, 3)
    rgb = _hex_rgb(color) if isinstance(color, str) else \
        np.asarray(color, np.uint8)
    colors = np.broadcast_to(rgb.reshape(1, 3), (verts.shape[0], 3)).copy()
    return verts, faces, colors


def sphere_mesh(centers, r: float = 0.005, resolution: int = 8,
                color: str | np.ndarray = "#4da7a0"):
    """UV-sphere instances at ``centers`` — the deformation-graph node
    markers of ``vis.py:147-198`` (node_o3d_spheres), one merged mesh."""
    centers = _as_np(centers)
    n_lat, n_lon = resolution, resolution + 2
    lat = np.linspace(0, np.pi, n_lat, dtype=np.float32)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False, dtype=np.float32)
    sl, cl = np.sin(lat)[:, None], np.cos(lat)[:, None]
    template = np.stack([sl * np.cos(lon)[None, :],
                         sl * np.sin(lon)[None, :],
                         np.broadcast_to(cl, (n_lat, n_lon))],
                        -1).reshape(-1, 3) * r             # (V, 3)
    V = template.shape[0]
    # Faces on the lat/lon grid.
    ii, jj = np.meshgrid(np.arange(n_lat - 1), np.arange(n_lon),
                         indexing="ij")
    a = ii * n_lon + jj
    b = ii * n_lon + (jj + 1) % n_lon
    c = (ii + 1) * n_lon + jj
    d = (ii + 1) * n_lon + (jj + 1) % n_lon
    tf = np.concatenate([np.stack([a, b, d], -1).reshape(-1, 3),
                         np.stack([a, d, c], -1).reshape(-1, 3)], 0)
    S = centers.shape[0]
    verts = (centers[:, None, :] + template[None]).reshape(S * V, 3)
    faces = (tf[None] + (np.arange(S) * V)[:, None, None]).reshape(-1, 3)
    rgb = _hex_rgb(color) if isinstance(color, str) else \
        np.asarray(color, np.uint8)
    colors = np.broadcast_to(rgb.reshape(1, 3), (verts.shape[0], 3)).copy()
    return verts, faces, colors


def merge_meshes(meshes):
    """Concatenate (verts, faces[, colors]) triples with face re-indexing
    (``vis.py:670-704``)."""
    vs, fs, cs, off = [], [], [], 0
    for m in meshes:
        v, f = _as_np(m[0]), np.asarray(m[1], np.int64)
        vs.append(v)
        fs.append(f + off)
        if len(m) > 2 and m[2] is not None:
            cs.append(np.asarray(m[2], np.uint8))
        else:
            cs.append(np.full((v.shape[0], 3), 200, np.uint8))
        off += v.shape[0]
    return (np.concatenate(vs, 0), np.concatenate(fs, 0),
            np.concatenate(cs, 0))


def export_correspondence_mesh(path, src, tgt, pairs, inlier_mask=None,
                               radius: float = 0.002) -> str:
    """Full LineMesh parity artifact: a PLY with inlier (purple) / outlier
    (gray) correspondence cylinders, viewable in any mesh viewer."""
    src, tgt = _as_np(src), _as_np(tgt)
    pairs = np.asarray(pairs, np.int64)
    if inlier_mask is None:
        inlier_mask = np.ones((pairs.shape[0],), bool)
    inlier_mask = np.asarray(inlier_mask, bool)
    meshes = []
    if inlier_mask.any():
        meshes.append(line_mesh(src[pairs[inlier_mask, 0]],
                                tgt[pairs[inlier_mask, 1]], radius,
                                color=WARPED_COLOR))
    if (~inlier_mask).any():
        meshes.append(line_mesh(src[pairs[~inlier_mask, 0]],
                                tgt[pairs[~inlier_mask, 1]], radius,
                                color="#8a8f98"))
    verts, faces, colors = merge_meshes(meshes)
    return write_ply_mesh(path, verts, faces, colors)
