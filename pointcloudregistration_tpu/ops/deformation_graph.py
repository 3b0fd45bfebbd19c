"""Embedded-deformation graph: node sampling, edges, skinning, ED warp.

TPU-native replacement for the reference's Eigen/pybind11 extension
(c2p-net/deformationpyramid/cxx/graph_proc.cpp: sample_nodes by node
coverage, compute_edges_euclidean/geodesic, 4-NN skinning anchors) and the
ED warp (deformationpyramid/model/geometry.py:37-49 ED_warp). The graph is
built once per cloud (static node/edge caps), so host-side speed is
irrelevant; the warp and ARAP energy are hot and fully jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudregistration_tpu.core import se3
from pointcloudregistration_tpu.core.geometry import gather_points
from pointcloudregistration_tpu.ops import fps as fps_mod
from pointcloudregistration_tpu.ops import knn as knn_ops


@partial(jax.jit, static_argnames=("n_nodes", "n_edges", "n_anchors"))
def build_graph(points: jax.Array, n_nodes: int = 128, n_edges: int = 8,
                n_anchors: int = 4, coverage_radius: float = 0.1,
                mask: jax.Array | None = None):
    """Deformation graph over a cloud.

    Node-coverage sampling approximated by FPS (uniform coverage — the cxx
    `sample_nodes` greedy coverage picker has the same goal,
    graph_proc.cpp), kNN node-node edges, and n_anchors-NN skinning with
    Gaussian weights per point.
    """
    node_idx = fps_mod.fps(points, n_nodes, mask)        # (K,)
    nodes = points[node_idx]
    _, edges = knn_ops.knn(nodes, nodes, n_edges + 1)
    edges = edges[:, 1:]                                  # drop self
    d2, anchors = knn_ops.knn(points, nodes, n_anchors)
    w = jnp.exp(-d2 / (2.0 * coverage_radius ** 2))
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    return {"nodes": nodes, "node_idx": node_idx, "edges": edges,
            "anchors": anchors, "weights": w}


def ed_warp(points: jax.Array, graph, node_R: jax.Array,
            node_t: jax.Array) -> jax.Array:
    """Embedded-deformation skinning (geometry.py:37-49):
    p' = sum_k w_k [R_k (p - g_k) + g_k + t_k]."""
    g = gather_points(graph["nodes"], graph["anchors"])   # (N, A, 3)
    Rk = node_R[graph["anchors"]]                         # (N, A, 3, 3)
    tk = node_t[graph["anchors"]]                         # (N, A, 3)
    rel = points[:, None, :] - g
    moved = jnp.einsum("naij,naj->nai", Rk, rel,
                       precision=jax.lax.Precision.HIGHEST) + g + tk
    return jnp.sum(graph["weights"][..., None] * moved, axis=1)


def arap_cost(graph, node_R: jax.Array, node_t: jax.Array) -> jax.Array:
    """As-rigid-as-possible graph energy (deformationpyramid/model/
    loss.py:221-245): sum over edges |R_i (g_j - g_i) + g_i + t_i -
    (g_j + t_j)|^2."""
    g = graph["nodes"]
    gj = g[graph["edges"]]                                # (K, E, 3)
    rel = gj - g[:, None, :]
    pred = jnp.einsum("kij,kej->kei", node_R, rel,
                      precision=jax.lax.Precision.HIGHEST) \
        + (g + node_t)[:, None, :]
    actual = gj + node_t[graph["edges"]]
    return jnp.mean(jnp.sum((pred - actual) ** 2, -1))


@partial(jax.jit, static_argnames=("k", "relax_iters"))
def geodesic_distances(points: jax.Array, sources: jax.Array, k: int = 8,
                       relax_iters: int = 32,
                       mask: jax.Array | None = None) -> jax.Array:
    """Approximate geodesic distance field over the cloud's kNN graph.

    Parity with the cxx geodesic machinery (graph_proc.cpp
    compute_edges_geodesic / compute_pixel_anchors_geodesic): Bellman-Ford
    relaxation over the kNN graph, scanned for a fixed iteration budget.
    points (N, 3), sources (S,) seed indices -> (S, N) distances (inf-like
    1e9 for unreachable).
    """
    N = points.shape[0]
    d2, nbr = knn_ops.knn(points, points, k + 1, mask, mask)
    nbr = nbr[:, 1:]
    w = jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0))            # edge lengths

    def single(src):
        dist0 = jnp.full((N,), 1e9).at[src].set(0.0)

        def relax(dist, _):
            cand = dist[nbr] + w                          # (N, k)
            return jnp.minimum(dist, jnp.min(cand, -1)), None

        dist, _ = jax.lax.scan(relax, dist0, None, length=relax_iters)
        return dist

    return jax.vmap(single)(sources)


def build_graph_geodesic(points: jax.Array, n_nodes: int = 128,
                         n_edges: int = 8, n_anchors: int = 4,
                         coverage_radius: float = 0.1,
                         mask: jax.Array | None = None):
    """Deformation graph with geodesic node-node edges and geodesic skinning
    anchors — connects only along the surface, so separate branches of a
    vessel tree deform independently (the reason the reference computes
    geodesic edges at all)."""
    node_idx = fps_mod.fps(points, n_nodes, mask)
    nodes = points[node_idx]
    gd = geodesic_distances(points, node_idx, mask=mask)  # (K, N)
    node_gd = gd[:, node_idx]                             # (K, K)
    big = 1e9
    node_gd = jnp.where(jnp.eye(n_nodes, dtype=bool), big, node_gd)
    _, edges = jax.lax.top_k(-node_gd, n_edges)
    d_anchor = gd[:, :].T                                 # (N, K)
    _, anchors = jax.lax.top_k(-d_anchor, n_anchors)
    da = jnp.take_along_axis(d_anchor, anchors, -1)
    w = jnp.exp(-da ** 2 / (2.0 * coverage_radius ** 2))
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    return {"nodes": nodes, "node_idx": node_idx, "edges": edges,
            "anchors": anchors, "weights": w}


@partial(jax.jit, static_argnames=("iters", "n_nodes"))
def nicp_register(key: jax.Array, src: jax.Array, tgt: jax.Array,
                  iters: int = 100, n_nodes: int = 128,
                  lr: float = 0.01, w_arap: float = 10.0,
                  trunc: float = 1e9,
                  src_mask=None, tgt_mask=None):
    """N-ICP / ED baseline: optimize per-node SE(3) against truncated
    Chamfer + ARAP (the reference's 'ED' deformation model,
    registration.py dispatch + config/NICP.yaml)."""
    import optax
    graph = build_graph(src, n_nodes, mask=src_mask)
    params = {"w": jnp.zeros((n_nodes, 3)), "t": jnp.zeros((n_nodes, 3))}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        R = se3.exp_so3(p["w"])
        warped = ed_warp(src, graph, R, p["t"])
        data = knn_ops.truncated_chamfer(warped, tgt, trunc,
                                         x_mask=src_mask, y_mask=tgt_mask)
        return jnp.mean(data) + w_arap * arap_cost(graph, R, p["t"])

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                       length=iters)
    R = se3.exp_so3(params["w"])
    return ed_warp(src, graph, R, params["t"]), {"losses": losses,
                                                 "graph": graph}


@partial(jax.jit, static_argnames=("iters", "width", "depth"))
def nsfp_register(key: jax.Array, src: jax.Array, tgt: jax.Array,
                  iters: int = 300, width: int = 128, depth: int = 4,
                  lr: float = 1e-3, trunc: float = 1e9,
                  src_mask=None, tgt_mask=None):
    """Neural Scene Flow Prior baseline: a coordinate MLP regressing a
    per-point displacement field, optimized per pair (the reference's
    'NSFP' deformation model, registration.py dispatch)."""
    import optax
    keys = jax.random.split(key, depth + 1)
    dims = [3] + [width] * depth
    params = [{"w": jax.random.normal(keys[i], (dims[i], dims[i + 1]))
               * jnp.sqrt(2.0 / dims[i]),
               "b": jnp.zeros(dims[i + 1])} for i in range(depth)]
    params.append({"w": jax.random.normal(keys[-1], (width, 3)) * 1e-3,
                   "b": jnp.zeros(3)})

    def flow(p, x):
        h = x
        for layer in p[:-1]:
            h = jax.nn.relu(h @ layer["w"] + layer["b"])
        return h @ p[-1]["w"] + p[-1]["b"]

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        warped = src + flow(p, src)
        return jnp.mean(knn_ops.truncated_chamfer(
            warped, tgt, trunc, x_mask=src_mask, y_mask=tgt_mask))

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                       length=iters)
    return src + flow(params, src), {"losses": losses}
