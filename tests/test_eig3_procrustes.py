import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.core import eig3, procrustes, se3


def test_eigh3_random():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    w, V = eig3.eigh3(jnp.asarray(A))
    w_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, w_ref, atol=1e-4)
    # eigenvector property A v = w v
    Av = np.einsum("bij,bjk->bik", A, np.asarray(V))
    wV = np.asarray(V) * np.asarray(w)[:, None, :]
    np.testing.assert_allclose(Av, wV, atol=2e-3)
    # orthonormal
    VtV = np.einsum("bji,bjk->bik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.tile(np.eye(3), (64, 1, 1)), atol=1e-4)


def test_eigh3_degenerate():
    # repeated eigenvalues: identity and rank-1
    A = jnp.stack([jnp.eye(3),
                   jnp.zeros((3, 3)),
                   jnp.diag(jnp.array([2.0, 2.0, 5.0])),
                   jnp.outer(jnp.array([1.0, 1, 1]), jnp.array([1.0, 1, 1]))])
    w, V = eig3.eigh3(A)
    w_ref = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(w, w_ref, atol=2e-3)
    VtV = np.einsum("bji,bjk->bik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)


def test_svd3():
    rng = np.random.default_rng(1)
    H = rng.normal(size=(32, 3, 3)).astype(np.float32)
    U, S, V = procrustes.svd3(jnp.asarray(H))
    S_ref = np.linalg.svd(H, compute_uv=False)
    np.testing.assert_allclose(S, S_ref, atol=1e-4)
    recon = np.einsum("bik,bk,bjk->bij", np.asarray(U), np.asarray(S),
                      np.asarray(V))
    np.testing.assert_allclose(recon, H, atol=1e-3)


def test_kabsch_exact_recovery():
    key = jax.random.PRNGKey(0)
    R, t = se3.random_se3(key, (8,), max_angle_deg=80.0, max_trans=1.0)
    src = jax.random.normal(jax.random.PRNGKey(1), (8, 200, 3))
    tgt = se3.transform(src, R, t)
    R2, t2 = procrustes.kabsch(src, tgt)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-4)


def test_kabsch_weighted_ignores_outliers():
    key = jax.random.PRNGKey(2)
    R, t = se3.random_se3(key, (), max_angle_deg=60.0)
    src = jax.random.normal(jax.random.PRNGKey(3), (100, 3))
    tgt = se3.transform(src, R, t)
    # corrupt last 30 points; zero their weights
    tgt = tgt.at[70:].add(10.0)
    w = jnp.concatenate([jnp.ones(70), jnp.zeros(30)])
    R2, t2 = procrustes.kabsch(src, tgt, w)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-4)


def test_kabsch_det_plus_one_degenerate():
    # planar cloud (rank-2 covariance) must still give a proper rotation
    src = jax.random.normal(jax.random.PRNGKey(4), (50, 3)).at[:, 2].set(0.0)
    R, t = se3.random_se3(jax.random.PRNGKey(5), ())
    tgt = se3.transform(src, R, t)
    R2, t2 = procrustes.kabsch(src, tgt)
    assert abs(float(jnp.linalg.det(R2)) - 1.0) < 1e-4
    err = se3.transform(src, R2, t2) - tgt
    assert float(jnp.abs(err).max()) < 1e-3


def test_kabsch_from_covariance_matches():
    src = jax.random.normal(jax.random.PRNGKey(6), (4, 64, 3))
    R, t = se3.random_se3(jax.random.PRNGKey(7), (4,))
    tgt = se3.transform(src, R, t)
    H, sc, tc, _ = procrustes.cross_covariance(src, tgt)
    R2, t2 = procrustes.kabsch_from_covariance(H, sc, tc)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-4)


def test_soft_procrustes():
    src = jax.random.normal(jax.random.PRNGKey(8), (60, 3))
    R, t = se3.random_se3(jax.random.PRNGKey(9), ())
    tgt = se3.transform(src, R, t)
    perm = jax.random.permutation(jax.random.PRNGKey(10), 60)
    conf = jnp.zeros((60, 60)).at[jnp.arange(60), perm].set(1.0)
    # conf[i, perm[i]] = 1 ⇒ the m-th target row must satisfy shuf[perm[i]] = tgt[i]
    tgt_shuf = jnp.zeros_like(tgt).at[perm].set(tgt)
    R2, t2 = procrustes.soft_procrustes(conf, src, tgt_shuf)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-4)


def test_kabsch_grad_flows():
    def loss(src, tgt):
        R, t = procrustes.kabsch(src, tgt)
        return jnp.sum((se3.transform(src, R, t) - tgt) ** 2)
    src = jax.random.normal(jax.random.PRNGKey(11), (30, 3))
    tgt = src + 0.1 * jax.random.normal(jax.random.PRNGKey(12), (30, 3))
    g = jax.grad(loss)(src, tgt)
    assert np.isfinite(np.asarray(g)).all()


def test_svd3_orthonormal_V_near_degenerate():
    # repeated/near-equal singular values skew closed-form eigenvectors;
    # the Gram-Schmidt polish must keep V (and hence R = V U^T) orthonormal
    rng = np.random.default_rng(7)
    Hs = []
    for _ in range(50):
        # near-isotropic covariances (the degenerate regime): identity plus
        # small asymmetric noise
        Hs.append(np.eye(3) + 1e-4 * rng.normal(size=(3, 3)))
        # rank-ish-deficient: tiny third direction
        U0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        Hs.append(U0 @ np.diag([1.0, 1.0 - 1e-6, 1e-9]) @ U0.T)
    H = jnp.asarray(np.stack(Hs), jnp.float32)
    U, S, V = procrustes.svd3(H)
    for Q in (U, V):
        QtQ = jnp.einsum("...ki,...kj->...ij", Q, Q,
                         precision=jax.lax.Precision.HIGHEST)
        err = float(jnp.max(jnp.abs(QtQ - jnp.eye(3))))
        assert err < 5e-5, err
    # reconstruction still holds
    rec = jnp.einsum("...ik,...k,...kj->...ij", U, S,
                     jnp.swapaxes(V, -1, -2),
                     precision=jax.lax.Precision.HIGHEST)
    # reconstruction accuracy near repeated singular values is bounded by
    # the f32 closed-form 3x3 eig (~sqrt(eps) eigenvector error), not by
    # the polish; orthonormality above is the property rotations need
    assert float(jnp.max(jnp.abs(rec - H))) < 1e-2
