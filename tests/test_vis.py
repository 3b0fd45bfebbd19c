"""Visualization utilities: PNG panels render, meshes are well-formed.

Parity surface: deformationpyramid/utils/vis.py + line_mesh.py (headless
PNG/PLY equivalents — see utils/vis.py docstring).
"""
import numpy as np
import pytest

from pointcloudregistration_tpu.utils import vis


@pytest.fixture
def clouds(rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    tgt = src + 0.05
    return src, tgt


def test_visualize_pcds_writes_png(tmp_path, clouds):
    src, tgt = clouds
    p = vis.visualize_pcds(src, tgt, warped_pcd=src * 1.01,
                           rigidity=np.linspace(0, 1, 200),
                           path=str(tmp_path / "pcds.png"))
    assert (tmp_path / "pcds.png").stat().st_size > 1000
    assert p.endswith(".png")


def test_visualize_pcds_requires_a_cloud(tmp_path):
    with pytest.raises(ValueError):
        vis.visualize_pcds(path=str(tmp_path / "x.png"))


def test_visualize_pcds_list(tmp_path, clouds):
    src, tgt = clouds
    vis.visualize_pcds_list([src, tgt, src + 0.2],
                            path=str(tmp_path / "list.png"),
                            labels=["a", "b", "c"])
    assert (tmp_path / "list.png").stat().st_size > 1000


def test_plot_correspondences_and_deformation(tmp_path, clouds):
    src, tgt = clouds
    pairs = np.stack([np.arange(50), np.arange(50)], -1)
    mask = np.arange(50) % 2 == 0
    vis.plot_correspondences(src, tgt, pairs, mask,
                             path=str(tmp_path / "corr.png"))
    vis.plot_deformation(src, tgt, path=str(tmp_path / "def.png"))
    assert (tmp_path / "corr.png").exists()
    assert (tmp_path / "def.png").exists()


def test_plot_ndp_history(tmp_path):
    h = np.full((9, 40), np.nan, np.float32)
    for lvl in range(9):
        n = 5 + lvl * 3
        h[lvl, :n] = np.linspace(1.0, 0.1 / (lvl + 1), n)
    vis.plot_ndp_history(h, path=str(tmp_path / "hist.png"))
    assert (tmp_path / "hist.png").stat().st_size > 1000


def test_save_grayscale_image(tmp_path):
    img = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
    vis.save_grayscale_image(str(tmp_path / "g.png"), img)
    assert (tmp_path / "g.png").exists()


def test_line_mesh_geometry():
    p0 = np.zeros((3, 3), np.float32)
    p1 = np.eye(3, dtype=np.float32)          # unit segments along x/y/z
    verts, faces, colors = vis.line_mesh(p0, p1, radius=0.01, sides=6)
    assert verts.shape == (3 * 12, 3)
    assert colors.shape == (verts.shape[0], 3)
    assert faces.min() >= 0 and faces.max() < verts.shape[0]
    # Every bottom-ring vertex sits at distance `radius` from its endpoint.
    ring0 = verts[:6]
    assert np.allclose(np.linalg.norm(ring0 - p0[0], axis=-1), 0.01,
                       atol=1e-5)
    # Rings are perpendicular to the segment axis.
    assert np.allclose(ring0 @ p1[0], 0.0, atol=1e-5)


def test_sphere_mesh_radius_and_merge(tmp_path):
    centers = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    verts, faces, colors = vis.sphere_mesh(centers, r=0.1, resolution=6)
    V = verts.shape[0] // 2
    d0 = np.linalg.norm(verts[:V] - centers[0], axis=-1)
    assert np.allclose(d0, 0.1, atol=1e-5)
    merged = vis.merge_meshes([(verts, faces, colors),
                               vis.line_mesh(centers[:1], centers[1:])])
    mv, mf, mc = merged
    assert mf.max() < mv.shape[0]
    p = vis.write_ply_mesh(str(tmp_path / "m.ply"), mv, mf, mc)
    txt = open(p).read()
    assert txt.startswith("ply")
    assert f"element vertex {mv.shape[0]}" in txt
    assert f"element face {mf.shape[0]}" in txt


def test_export_correspondence_mesh(tmp_path, clouds):
    src, tgt = clouds
    pairs = np.stack([np.arange(20), np.arange(20)], -1)
    mask = np.arange(20) < 10
    p = vis.export_correspondence_mesh(str(tmp_path / "c.ply"), src, tgt,
                                       pairs, mask)
    head = open(p).read(200)
    assert "element vertex 240" in head     # 20 segments * 2 rings * 6 sides
