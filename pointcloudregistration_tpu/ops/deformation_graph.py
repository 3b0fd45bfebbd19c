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


def nerfies_regularization_from_points(warp_fn, points: jax.Array,
                                       eps: float = 1e-6) -> jax.Array:
    """Elastic regularization of a warp field: mean squared log of the
    largest singular value of the per-point warp Jacobian (the reference's
    `nerfies_regularization`, deformationpyramid/model/loss.py:333-340,
    fed by `Nerfies_Deformation.batched_jacobian`, nets.py:213-215).

    sigma_max comes from a short power iteration on J^T J rather than the
    closed-form 3x3 eig: the eig's acos-based gradient is singular at
    repeated eigenvalues (J ~ c*I early in training), which NaNs the
    optimizer on TPU; the Rayleigh quotient is smooth there."""
    J = jax.vmap(jax.jacfwd(warp_fn))(points)            # (N, 3, 3)
    JtJ = jnp.einsum("nij,nik->njk", J, J)
    v = jnp.full((points.shape[0], 3), 1.0 / jnp.sqrt(3.0), points.dtype)
    for _ in range(8):
        v = jnp.einsum("nij,nj->ni", JtJ, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)
    s2 = jnp.einsum("ni,nij,nj->n", v, JtJ, v)           # sigma_max^2
    smax = jnp.sqrt(jnp.maximum(s2, eps * eps))
    return jnp.mean(jnp.log(smax) ** 2)


def nerfies_register(key: jax.Array, src: jax.Array, tgt: jax.Array,
                     iters: int = 300, width: int = 128, depth: int = 7,
                     m: int = 6, k0: int = -3, lr: float = 1e-3,
                     w_reg: float = 1e-3, trunc: float = 1e9,
                     src_mask=None, tgt_mask=None):
    """Nerfies-style deformation baseline: annealed sinusoidal positional
    encoding (sliding-window weights over m=6 frequency bands opened over
    the first 60% of iterations) -> MLP -> per-point SE(3) screw field;
    objective = truncated Chamfer + w_reg * elastic Jacobian penalty.

    (reference behavior: deformationpyramid/model/nets.py:187-253
    `Nerfies_Deformation`; registration.py:292-365 `optimize_Nerfies`:
    Adam lr, loss = cd + 0.001*reg, mean-centering both clouds.)
    """
    import optax

    n_anneal = 0.6 * iters
    dim_in = 6 * m + 3

    keys = jax.random.split(key, depth + 3)
    dims = [dim_in] + [width] * depth
    params = {"mlp": [
        {"w": jax.random.normal(keys[i], (dims[i], dims[i + 1]))
         * jnp.sqrt(2.0 / dims[i]),
         "b": jnp.zeros(dims[i + 1])} for i in range(depth)]}
    params["w_head"] = {"w": jax.random.normal(keys[-2], (width, 3)) * 1e-4,
                        "b": jnp.zeros(3)}
    params["v_head"] = {"w": jax.random.normal(keys[-1], (width, 3)) * 1e-4,
                        "b": jnp.zeros(3)}

    freqs = 2.0 ** (jnp.arange(m, dtype=src.dtype) + k0) * jnp.pi

    def posenc(x, it):
        # sliding-window anneal (nets.py:218-240): band j opens as the
        # normalized progress a = m*it/N passes j.
        a = m * it / n_anneal
        w_a = (1.0 - jnp.cos(
            jnp.clip(a - jnp.arange(m, dtype=x.dtype), 0.0, 1.0)
            * jnp.pi)) / 2.0
        ang = x[..., :, None] * freqs                    # (..., 3, m)
        enc = jnp.concatenate(
            [(jnp.sin(ang) * w_a).reshape(*x.shape[:-1], -1),
             (jnp.cos(ang) * w_a).reshape(*x.shape[:-1], -1)], axis=-1)
        return jnp.concatenate([x, enc], axis=-1)

    def warp(p, x, it):
        h = posenc(x, it)
        for layer in p["mlp"]:
            h = jax.nn.relu(h @ layer["w"] + layer["b"])
        w = h @ p["w_head"]["w"] + p["w_head"]["b"]
        v = h @ p["v_head"]["w"] + p["v_head"]["b"]
        R, t = se3.exp_se3(jnp.concatenate([w, v], axis=-1))
        return jnp.squeeze(R @ x[..., None], -1) + t

    # cancel global translation (registration.py:311-315)
    s_mean = (jnp.mean(src, 0) if src_mask is None else
              jnp.sum(jnp.where(src_mask[:, None], src, 0.0), 0)
              / jnp.maximum(jnp.sum(src_mask), 1))
    t_mean = (jnp.mean(tgt, 0) if tgt_mask is None else
              jnp.sum(jnp.where(tgt_mask[:, None], tgt, 0.0), 0)
              / jnp.maximum(jnp.sum(tgt_mask), 1))
    src_c, tgt_c = src - s_mean, tgt - t_mean

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, it):
        warped = warp(p, src_c, it)
        cd = jnp.mean(knn_ops.truncated_chamfer(
            warped, tgt_c, trunc, x_mask=src_mask, y_mask=tgt_mask))
        reg = nerfies_regularization_from_points(
            lambda x: warp(p, x, it), src_c)
        return cd + w_reg * reg

    def step(carry, it):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p, it)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), jnp.arange(iters, dtype=src.dtype))
    warped = warp(params, src_c, jnp.asarray(iters, src.dtype)) + t_mean
    return warped, {"losses": losses}
