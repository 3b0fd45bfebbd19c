"""Outlier-rejection variants (cycle consistency, view-graph GAT) and the
multiview dataset contract."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.data import multiview as mv
from pointcloudregistration_tpu.models import outlier_rejection as orj
import pytest


def test_multiview_contract_identity():
    # R * (Ps + flow) + t must land on the target view's scan (up to noise)
    cfg = mv.MultiviewConfig(n_views=3, n_points=256)
    scene = mv.make_scene(jax.random.PRNGKey(0), cfg)
    pcds = scene["pcds"]
    for e in range(scene["pcd_pairs"].shape[0]):
        i, j = int(scene["pcd_pairs"][e, 0]), int(scene["pcd_pairs"][e, 1])
        pose = scene["poses"][e]
        carried = se3.transform(pcds[i] + scene["pairwise_flows"][e],
                                pose[:3, :3], pose[:3, 3])
        err = float(jnp.max(jnp.linalg.norm(carried - pcds[j], axis=-1)))
        assert err < 6 * cfg.scan_noise * 2 + 1e-4, (i, j, err)
    assert float(jnp.min(scene["pairwise_overlap"])) > 0.9


def test_multiview_roundtrip_and_filtering(tmp_path):
    cfg = mv.MultiviewConfig(n_views=3, n_points=128)
    paths = mv.generate_multiview(jax.random.PRNGKey(1), str(tmp_path), 2,
                                  cfg)
    assert len(paths) == 2
    ds = mv.MultiviewScenes(str(tmp_path))
    assert len(ds) == 2
    s = ds[0]
    E = s["pcd_pairs"].shape[0]
    assert s["pcds"].shape == (3, 128, 3)
    assert s["pairwise_flows"].shape == (E, 128, 3)
    assert s["poses"].shape == (E, 4, 4)
    assert s["axis_node"] == 0
    # overlap filter: raise the threshold beyond 1 -> all edges drop
    ds_strict = mv.MultiviewScenes(str(tmp_path), overlap_threshold=1.1)
    assert ds_strict[0]["pcd_pairs"].shape[0] == 0


def test_view_graph_adjacency_semantics():
    # two pairs sharing cloud 1: pair0 = (0, 1), pair1 = (1, 2); one
    # correspondence each. Their cloud-1 endpoints coincide -> edge.
    vec6d = jnp.asarray([
        [[0.0, 0, 0, 5.0, 5, 5]],       # pair0: head in cloud0, tail cloud1
        [[5.0, 5, 5, 9.0, 9, 9]],       # pair1: head in cloud1, tail cloud2
    ])
    mask = jnp.ones((2, 1), bool)
    pcd_pairs = jnp.asarray([[0, 1], [1, 2]])
    adj, lengths = orj.view_graph_adjacency(vec6d, mask, pcd_pairs,
                                            edge_radius=0.5)
    assert bool(adj[0, 1]) and bool(adj[1, 0])      # shared cloud-1 point
    assert bool(adj[0, 0]) and bool(adj[1, 1])      # self-edges kept
    assert float(lengths[0, 1]) < 1e-6
    # move pair1's cloud-1 endpoint away -> edge disappears
    vec6d2 = vec6d.at[1, 0, :3].set(jnp.asarray([7.0, 7, 7]))
    adj2, _ = orj.view_graph_adjacency(vec6d2, mask, pcd_pairs, 0.5)
    assert not bool(adj2[0, 1])
    # masked correspondences never connect
    adj3, _ = orj.view_graph_adjacency(
        vec6d, jnp.asarray([[True], [False]]), pcd_pairs, 0.5)
    assert not bool(adj3[0, 1]) and not bool(adj3[1, 1])


def _toy_matches(key, P=3, L=24, outlier_frac=0.35):
    """Matches on a common rigid scene: inliers follow per-pair SE(3),
    outliers are random; labels = inlier bool."""
    ks, ko, kl, kp = jax.random.split(key, 4)
    src = jax.random.uniform(ks, (P, L, 3))
    Rt = [se3.random_se3(jax.random.fold_in(kp, i), (), 30.0, 0.3)
          for i in range(P)]
    tgt = jnp.stack([se3.transform(src[i], *Rt[i]) for i in range(P)])
    lbl = jax.random.uniform(kl, (P, L)) > outlier_frac
    junk = jax.random.uniform(ko, (P, L, 3))
    tgt = jnp.where(lbl[..., None], tgt, junk)
    pcd_pairs = jnp.asarray([[0, i + 1] for i in range(P)])
    return src, tgt, lbl, pcd_pairs


@pytest.mark.slow
def test_cycle_outlier_rejection_forward_all_modes():
    src, tgt, lbl, pairs = _toy_matches(jax.random.PRNGKey(3))
    mask = jnp.ones(src.shape[:2], bool)
    for mode in ("geo", "crs", "geocrs", "crsgeo"):
        model = orj.CycleOutlierRejection(feat_dim=32, n_layers=1,
                                          n_heads=2, alternate=mode)
        params = model.init(jax.random.PRNGKey(4), src, tgt, mask, pairs)
        conf = model.apply(params, src, tgt, mask, pairs)
        assert conf.shape == src.shape[:2]
        assert bool(jnp.all(jnp.isfinite(conf)))
        assert bool(jnp.all((conf >= 0) & (conf <= 1)))


def test_cycle_outlier_rejection_learns_inliers():
    src, tgt, lbl, pairs = _toy_matches(jax.random.PRNGKey(5))
    mask = jnp.ones(src.shape[:2], bool)
    model = orj.CycleOutlierRejection(feat_dim=32, n_layers=2, n_heads=2,
                                      alternate="geocrs")
    params = model.init(jax.random.PRNGKey(6), src, tgt, mask, pairs)
    opt = optax.adam(3e-3)
    state = opt.init(params)
    y = lbl.astype(jnp.float32)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            c = jnp.clip(model.apply(p, src, tgt, mask, pairs), 1e-6,
                         1 - 1e-6)
            return -jnp.mean(y * jnp.log(c) + (1 - y) * jnp.log(1 - c))
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    loss0 = None
    for i in range(60):
        params, state, loss = step(params, state)
        if loss0 is None:
            loss0 = float(loss)
    conf = model.apply(params, src, tgt, mask, pairs)
    inl = float(jnp.mean(jnp.where(lbl, conf, 0)) / jnp.mean(lbl))
    out = float(jnp.mean(jnp.where(~lbl, conf, 0)) / jnp.mean(~lbl))
    assert float(loss) < loss0 * 0.8, (loss0, float(loss))
    assert inl > out + 0.2, (inl, out)
