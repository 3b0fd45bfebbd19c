"""Golden tests: fused Pallas FPFH (ops/fpfh_pallas.py) vs a dense jnp
reference with identical radius semantics (Open3D compute_fpfh_feature
parity, DataPreparation/RANSAC.py:12-22). Runs in interpret mode on the
CPU backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudregistration_tpu.core.eig3 import smallest_eigvec3
from pointcloudregistration_tpu.ops.fpfh_pallas import fpfh_dense


def _ref_dense(p, rn, rf):
    """Dense jnp FPFH with the same radius semantics (uses atan2)."""
    d2 = jnp.sum((p[:, None] - p[None]) ** 2, -1)
    w = (d2 <= rn * rn).astype(jnp.float32)
    cnt = jnp.maximum(w.sum(1), 1.0)
    mean = (w @ p) / cnt[:, None]
    cen = p[None, :, :] - mean[:, None, :]
    cov = jnp.einsum("nj,nji,njk->nik", w, cen, cen) / cnt[:, None, None]
    nrm = smallest_eigvec3(cov)
    centroid = p.mean(0)
    flip = jnp.sum(nrm * (p - centroid), -1, keepdims=True) < 0
    nrm = jnp.where(flip, -nrm, nrm)
    wf = ((d2 <= rf * rf) & (d2 > 1e-9)).astype(jnp.float32)
    dirn = (p[None] - p[:, None]) * jax.lax.rsqrt(d2 + 1e-9)[..., None]
    u = jnp.broadcast_to(nrm[:, None, :], dirn.shape)
    v_un = jnp.cross(dirn, u)
    v = v_un * jax.lax.rsqrt(jnp.sum(v_un ** 2, -1, keepdims=True) + 1e-9)
    wv = jnp.cross(u, v)
    nj = jnp.broadcast_to(nrm[None, :, :], dirn.shape)
    alpha = jnp.sum(v * nj, -1)
    phi = jnp.sum(u * dirn, -1)
    theta = jnp.arctan2(jnp.sum(wv * nj, -1), jnp.sum(u * nj, -1))

    def hist(val, lo, hi):
        t = jnp.clip((val - lo) / (hi - lo), 0, 1 - 1e-6)
        b = jnp.floor(t * 11)
        return jnp.stack(
            [jnp.sum(jnp.where(b == k, wf, 0.0), 1) for k in range(11)], -1)

    h = jnp.concatenate([hist(alpha, -1, 1), hist(phi, -1, 1),
                         hist(theta, -jnp.pi, jnp.pi)], -1)
    cntf = jnp.maximum(wf.sum(1), 1.0)
    spfh = h / cntf[:, None]
    wd = jnp.where((d2 <= rf * rf) & (d2 > 1e-9),
                   jax.lax.rsqrt(d2 + 1e-9), 0.0)
    f = spfh + (wd @ spfh) / cntf[:, None]
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8), nrm


def _surface_cloud(key, n):
    g = jax.random.normal(key, (n, 3))
    p = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * 0.5 + 0.5
    return p + 0.002 * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))


def test_fpfh_dense_matches_jnp_reference():
    p = _surface_cloud(jax.random.PRNGKey(0), 500)
    f1, n1 = fpfh_dense(p, 0.12, 0.2)
    f2, n2 = _ref_dense(p, 0.12, 0.2)
    # normals identical up to eig sign resolution
    assert float(jnp.abs(jnp.sum(n1 * n2, -1)).min()) > 0.999
    # descriptors: mean deviation tiny; isolated bin-boundary flips allowed
    assert float(jnp.abs(f1 - f2).mean()) < 1e-3
    frac_close = float(jnp.mean(jnp.abs(f1 - f2) < 5e-3))
    assert frac_close > 0.995
    # unit descriptors
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f1), axis=-1),
                               1.0, atol=1e-4)


def test_fpfh_dense_mask_and_batch():
    # radii sized so every neighborhood is well-conditioned at 300 points
    # (tiny neighborhoods make the plane normal genuinely ill-defined and
    # any two correct implementations disagree there)
    p = _surface_cloud(jax.random.PRNGKey(3), 400)
    mask = jnp.arange(400) < 300
    f, nrm = fpfh_dense(p, 0.2, 0.3, mask=mask)
    fr, _ = _ref_dense(p[:300], 0.2, 0.3)
    assert float(jnp.abs(f[:300] - fr).mean()) < 1e-3
    assert float(jnp.abs(f[300:]).max()) == 0.0
    # masked call == dense call on the valid subset, bit-for-bit
    f_direct, _ = fpfh_dense(p[:300], 0.2, 0.3)
    assert float(jnp.abs(f[:300] - f_direct).max()) == 0.0
    pb = jnp.stack([p, p[::-1]])
    fb, nb = fpfh_dense(pb, 0.2, 0.3)
    assert fb.shape == (2, 400, 33) and nb.shape == (2, 400, 3)
    assert float(jnp.abs(fb[0] - fpfh_dense(p, 0.2, 0.3)[0]).max()) < 1e-5


def test_theta_cos_binning_matches_atan2():
    """The kernel's atan2-free theta binning == floor((atan2+pi)/D)."""
    key = jax.random.PRNGKey(7)
    s = jax.random.normal(key, (5000,))
    c = jax.random.normal(jax.random.fold_in(key, 1), (5000,))
    theta = jnp.arctan2(s, c)
    t = jnp.clip((theta + jnp.pi) / (2 * jnp.pi), 0, 1 - 1e-6)
    want = jnp.floor(t * 11)
    import math
    z = c * jax.lax.rsqrt(s * s + c * c + 1e-9)
    delta = 2.0 * math.pi / 11
    pos = sum((z <= math.cos((k + 0.5) * delta)).astype(jnp.float32)
              for k in range(5))
    neg = sum((z >= math.cos((k + 0.5) * delta)).astype(jnp.float32)
              for k in range(5))
    got = jnp.where(s >= 0, 5.0 + pos, neg)
    agree = float(jnp.mean(got == want))
    assert agree > 0.999     # boundary roundoff only
