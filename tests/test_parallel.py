"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointcloudregistration_tpu.parallel import mesh as mesh_mod, ring
from pointcloudregistration_tpu.core import se3, procrustes
from pointcloudregistration_tpu.ops import knn as knn_ops


def test_mesh_construction():
    m = mesh_mod.make_mesh(n_pairs=2, n_blocks=4)
    assert m.shape == {"pairs": 2, "blocks": 4}
    m2 = mesh_mod.make_mesh()
    assert m2.shape["pairs"] == 8


def test_ring_nn_matches_dense():
    m = mesh_mod.make_mesh(n_pairs=1, n_blocks=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 512, 3)).astype(np.float32)
    y = rng.normal(size=(1, 1024, 3)).astype(np.float32)

    @partial(shard_map, mesh=m,
             in_specs=(P("pairs", "blocks", None), P("pairs", "blocks", None)),
             out_specs=(P("pairs", "blocks"), P("pairs", "blocks")))
    def f(xb, yb):
        return jax.vmap(lambda a, b: ring.ring_nn_search(a, b))(xb, yb)

    d, i = jax.jit(f)(jnp.asarray(x), jnp.asarray(y))
    d_ref, i_ref = knn_ops.nn_search(jnp.asarray(x[0]), jnp.asarray(y[0]))
    np.testing.assert_allclose(np.asarray(d)[0], np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i)[0], np.asarray(i_ref))


def test_ring_chamfer_matches_dense():
    m = mesh_mod.make_mesh(n_pairs=2, n_blocks=4)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 256, 3)).astype(np.float32)
    y = rng.normal(size=(2, 512, 3)).astype(np.float32)
    f = ring.make_sharded_chamfer(m, 256, 512)
    cd = f(jnp.asarray(x), jnp.asarray(y))
    cd_ref = knn_ops.chamfer(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(cd), np.asarray(cd_ref),
                               rtol=1e-4, atol=1e-6)


def test_psum_kabsch_matches_dense():
    m = mesh_mod.make_mesh(n_pairs=1, n_blocks=8)
    src = jax.random.normal(jax.random.PRNGKey(0), (1, 800, 3))
    R_gt, t_gt = se3.random_se3(jax.random.PRNGKey(1), (1,))
    tgt = se3.transform(src, R_gt, t_gt)

    @partial(shard_map, mesh=m,
             in_specs=(P("pairs", "blocks", None), P("pairs", "blocks", None)),
             out_specs=(P("pairs"), P("pairs")))
    def f(sb, tb):
        return jax.vmap(lambda a, b: ring.psum_kabsch(a, b))(sb, tb)

    R, t = jax.jit(f)(src, tgt)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_ring_nn_masked():
    m = mesh_mod.make_mesh(n_pairs=1, n_blocks=8)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 128, 3)).astype(np.float32)
    y = rng.normal(size=(1, 256, 3)).astype(np.float32)
    ymask = np.zeros((1, 256), bool)
    ymask[:, :100] = True

    @partial(shard_map, mesh=m,
             in_specs=(P("pairs", "blocks", None), P("pairs", "blocks", None),
                       P("pairs", "blocks")),
             out_specs=(P("pairs", "blocks"), P("pairs", "blocks")))
    def f(xb, yb, mb):
        return jax.vmap(lambda a, b, c: ring.ring_nn_search(a, b, c))(
            xb, yb, mb)

    d, i = jax.jit(f)(jnp.asarray(x), jnp.asarray(y), jnp.asarray(ymask))
    d_ref, i_ref = knn_ops.nn_search(jnp.asarray(x[0]), jnp.asarray(y[0]),
                                     ref_mask=jnp.asarray(ymask[0]))
    np.testing.assert_array_equal(np.asarray(i)[0], np.asarray(i_ref))
