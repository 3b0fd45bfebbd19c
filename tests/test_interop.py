"""Interop: the reference's pretrained DIP torch checkpoint loads into the
flax PointNetFeature and reproduces the torch forward (dip/network.py:50-119,
weights dip/chkpts/best_dip.pt)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

CKPT = "/root/reference/dip/chkpts/best_dip.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not present")


def test_dip_reference_checkpoint_roundtrip():
    from pointcloudregistration_tpu.utils.interop import (
        dip_variables_from_torch)
    from pointcloudregistration_tpu.models.dip import PointNetFeature

    variables = dip_variables_from_torch(CKPT)
    model = PointNetFeature(dim=64)
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(4, 256, 3)).astype(np.float32) * 0.3
    out, xtrans, trans, mx, amx = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(patches),
        train=False)
    # descriptors are unit-norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)

    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "refnet", "/root/reference/dip/network.py")
    refnet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refnet)
    net = refnet.PointNetFeature(dim=64, l2norm=True, tnet=True)
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    net.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    net.eval()
    with torch.no_grad():
        tout, _, ttrans, tmx, _ = net._forward(
            torch.from_numpy(patches).permute(0, 2, 1))
    # f32 accumulation-order differences only
    assert np.abs(np.asarray(out) - tout.numpy()).max() < 2e-3
    assert np.abs(np.asarray(trans) - ttrans.numpy()).max() < 2e-3


def test_dip_state_from_torch_describes():
    from pointcloudregistration_tpu.utils.interop import dip_state_from_torch
    from pointcloudregistration_tpu.pipelines import dip

    state = dip_state_from_torch(CKPT)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (400, 3))
    idx, desc, keep = dip.describe(state, jax.random.PRNGKey(1), pts,
                                   dip.DIPConfig(), n_sample=64)
    assert desc.shape == (64, 64)
    assert bool(jnp.all(jnp.isfinite(desc)))
