"""CLI entry points, dataprep pickle export, DIP real-pair preprocessing."""
import numpy as np
import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.data import loaders, mri
from pointcloudregistration_tpu.pipelines import dataprep, dip
import pytest


@pytest.mark.slow
def test_dataprep_pickle_export(tmp_path):
    cfg = dataprep.DataPrepConfig(n_points=256, n_augment=4,
                                  min_correspondences=10)
    record = dataprep.generate_dataset(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "RANSACTraincropped.pickle")
    n = dataprep.export_ransac_pickle(record, path, accepted_only=False)
    assert n == 4
    back = loaders.load_ransac_pickle(path)
    assert back[0]["source"].shape == (256, 3)
    assert back[0]["transformation"].shape == (4, 4)
    # the exported pickle feeds the MRI dataset family directly
    ds = mri.MRIPairs(path, "train", npts=128)
    assert ds[0]["src"].shape == (128, 3)


def test_dip_preprocess_pair():
    cfg = dip.DIPConfig(n_points=256, n_anchors=16, patch_size=64, lrf_k=32)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    R, t = mri.random_se3(rng, 30.0, 0.2)
    tgt = src @ jnp.asarray(R.T) + jnp.asarray(t)
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    out = dip.preprocess_pair(jax.random.PRNGKey(1), src, tgt, T, cfg,
                              icp_dist=0.05)
    assert out["patches1"].shape == (16, 64, 3)
    assert out["patches2"].shape == (16, 64, 3)
    # exact rigid pair: every anchor correspondence holds
    assert bool(jnp.all(out["corr_ok"]))
    # corresponding patches are (close to) identical point sets in LRF frame:
    # compare patch centroids' norms (rotation-invariant summary)
    n1 = jnp.linalg.norm(out["patches1"], axis=-1)
    n2 = jnp.linalg.norm(out["patches2"], axis=-1)
    v = out["valid1"] & out["valid2"]
    err = jnp.abs(jnp.sort(n1, -1) - jnp.sort(n2, -1))
    assert float(jnp.mean(jnp.where(v, err, 0))) < 0.05


def test_dip_preprocess_dataset(tmp_path):
    cfg = dip.DIPConfig(n_points=128, n_anchors=8, patch_size=32, lrf_k=16)
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(2):
        src = rng.normal(size=(128, 3)).astype(np.float32)
        samples.append({"source": src, "target": src.copy(),
                        "transformation": np.eye(4, dtype=np.float32)})
    out_path = str(tmp_path / "patches.npz")
    stacked = dip.preprocess_dataset(jax.random.PRNGKey(0), samples, cfg,
                                     icp_dist=0.05, out_path=out_path)
    assert stacked["patches1"].shape == (2, 8, 32, 3)
    with np.load(out_path) as z:
        assert z["patches2"].shape == (2, 8, 32, 3)


@pytest.mark.slow
def test_cli_c2p_and_dataprep(tmp_path, capsys):
    from pointcloudregistration_tpu.__main__ import main
    main(["c2p", "--pairs", "2", "--points", "256"])
    out = capsys.readouterr().out
    assert "chamfer_nonrigid" in out
    pkl = str(tmp_path / "out.pickle")
    main(["dataprep", "--n-augment", "2", "--pickle", pkl])
    assert "samples" in capsys.readouterr().out
