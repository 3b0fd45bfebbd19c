import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from pointcloudregistration_tpu.core import se3


def _rand_R(n=16, seed=0):
    return Rotation.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_quat_roundtrip():
    R = _rand_R()
    q = se3.rotmat_to_quat(jnp.asarray(R))
    R2 = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_matches_scipy():
    q = np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32)
    R = se3.quat_to_rotmat(jnp.asarray(q))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R_ref = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()  # scipy xyzw
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_euler_roundtrip():
    ang = np.random.default_rng(2).uniform(-1.2, 1.2, (16, 3)).astype(np.float32)
    R = se3.euler_to_rotmat(jnp.asarray(ang))
    R_ref = Rotation.from_euler("xyz", ang).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    ang2 = se3.rotmat_to_euler(R)
    np.testing.assert_allclose(se3.euler_to_rotmat(ang2), R, atol=1e-5)


def test_exp_log_so3():
    w = np.random.default_rng(3).normal(size=(16, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(se3.exp_so3(w2), R, atol=1e-5)
    # tiny-angle stability
    R_small = se3.exp_so3(jnp.asarray([[1e-9, 0, 0]], jnp.float32))
    np.testing.assert_allclose(R_small[0], np.eye(3), atol=1e-6)


def test_exp_se3():
    xi = np.random.default_rng(4).normal(size=(8, 6)).astype(np.float32)
    R, t = se3.exp_se3(jnp.asarray(xi))
    # validate against scipy rotation and numerical V-matrix
    for i in range(8):
        w, v = xi[i, :3], xi[i, 3:]
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R[i], R_ref, atol=1e-5)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / th
        V = np.eye(3) + (1 - np.cos(th)) / th * K + (th - np.sin(th)) / th * K @ K
        np.testing.assert_allclose(t[i], V @ v, atol=1e-5)


def test_sixd():
    x = np.random.default_rng(5).normal(size=(16, 6)).astype(np.float32)
    R = np.asarray(se3.sixd_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_transform_compose_invert():
    key = jax.random.PRNGKey(0)
    R, t = se3.random_se3(key, (4,))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 100, 3))
    out = se3.transform(pts, R, t)
    Ri, ti = se3.invert(R, t)
    back = se3.transform(out, Ri, ti)
    np.testing.assert_allclose(back, pts, atol=1e-5)
    Rc, tc = se3.compose(Ri, ti, R, t)
    np.testing.assert_allclose(Rc, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(tc, np.zeros((4, 3)), atol=1e-5)


def test_matrix4_roundtrip():
    key = jax.random.PRNGKey(2)
    R, t = se3.random_se3(key, (4,))
    T = se3.to_matrix4(R, t)
    R2, t2 = se3.from_matrix4(T)
    np.testing.assert_allclose(R2, R, atol=1e-7)
    np.testing.assert_allclose(t2, t, atol=1e-7)


def test_random_rotation_valid():
    R = se3.random_uniform_rotation(jax.random.PRNGKey(3), (32,))
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
